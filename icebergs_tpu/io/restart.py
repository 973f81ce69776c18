"""Restart I/O compatible with the reference's NetCDF schemas.

Writes/reads the restart triplet of the reference
(``src/icebergs_fms2io.F90``):

* ``icebergs.res.nc``   — per-berg state, 1-D arrays over dim ``i``
  (icebergs_fms2io.F90:124-633; ids split into id_cnt/id_ij);
* ``bonds_iceberg.res.nc`` — bond endpoints + DEM bond state (321-...);
* ``calving.res.nc``    — stored_ice/stored_heat/running means (1484-1598).

Files are NETCDF3_CLASSIC via scipy (the same format the reference's
makeberg tooling writes), so reference-generated initial conditions load
directly and our restarts are readable by the reference tooling.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from scipy.io import netcdf_file

from ..config import IcebergsConfig, NCLASSES
from ..grid import Grid, pos_to_cell
from ..state import BergState, empty_state

# (netcdf name, state field, dtype char)
BERG_VARS = [
    ("lon", "lon", "d"), ("lat", "lat", "d"),
    ("uvel", "uvel", "d"), ("vvel", "vvel", "d"),
    ("mass", "mass", "d"),
    ("axn", "axn", "d"), ("ayn", "ayn", "d"),
    ("bxn", "bxn", "d"), ("byn", "byn", "d"),
    ("ine", "ine", "i"), ("jne", "jne", "i"),
    ("thickness", "thickness", "d"), ("width", "width", "d"),
    ("length", "length", "d"),
    ("start_lon", "start_lon", "d"), ("start_lat", "start_lat", "d"),
    ("start_year", "start_year", "i"),
    ("id_cnt", "id_cnt", "i"), ("id_ij", "id_ij", "i"),
    ("start_day", "start_day", "d"), ("start_mass", "start_mass", "d"),
    ("mass_scaling", "mass_scaling", "d"),
    ("mass_of_bits", "mass_of_bits", "d"),
    ("heat_density", "heat_density", "d"),
    ("static_berg", "static_berg", "d"),
]
FL_VARS = [("fl_k", "fl_k", "d"),
           ("mass_of_fl_bits", "mass_of_fl_bits", "d"),
           ("mass_of_fl_bergy_bits", "mass_of_fl_bergy_bits", "d"),
           # extension beyond the reference schema: per-parent child
           # counter keeps footloose child ids unique across restarts
           # (readers that don't know the name skip it)
           ("fl_spawn_count", "fl_spawn_count", "d")]
MTS_VARS = [("axn_fast", "axn_fast", "d"), ("ayn_fast", "ayn_fast", "d"),
            ("bxn_fast", "bxn_fast", "d"), ("byn_fast", "byn_fast", "d")]
DEM_VARS = [("ang_vel", "ang_vel", "d"), ("ang_accel", "ang_accel", "d"),
            ("rot", "rot", "d")]


def write_restart_bergs(path: str, st: BergState, cfg: IcebergsConfig):
    """Flatten live slots -> 1-D arrays -> icebergs.res.nc
    (write_restart_bergs, icebergs_fms2io.F90:124-633)."""
    alive = np.asarray(st.alive)
    own = alive & (np.asarray(st.halo_berg) < 0.5)
    idx = np.nonzero(own)[0]
    n = len(idx)

    varlist = list(BERG_VARS)
    if cfg.footloose:
        varlist += FL_VARS
    if cfg.mts:
        varlist += MTS_VARS
    if cfg.dem:
        varlist += DEM_VARS

    with netcdf_file(path, "w") as f:
        f.createDimension("i", n)
        for name, field, kind in varlist:
            v = f.createVariable(name, kind, ("i",))
            data = np.asarray(getattr(st, field))[idx]
            # reference restarts use 1-based cell indices
            if field in ("ine", "jne"):
                data = data + 1
            v[:] = data.astype(np.float64 if kind == "d" else np.int32)


def read_restart_bergs(path: str, capacity: int, grid: Grid,
                       cfg: IcebergsConfig, dtype=jnp.float32) -> BergState:
    """Read icebergs.res.nc into a fresh BergState; re-localize bergs on
    the grid like the reference's ignore_ij_restart/slow-find path
    (read_restart_bergs, icebergs_fms2io.F90:662-1188)."""
    data = {}
    with netcdf_file(path, "r", mmap=False) as f:
        n = f.dimensions.get("i")
        for name in f.variables:
            data[name] = np.asarray(f.variables[name][:])
        if n is None:
            n = len(next(iter(data.values())))

    n = len(data["lon"])
    if n > capacity:
        raise ValueError(f"restart holds {n} bergs > capacity {capacity}")
    st = empty_state(capacity, max_bonds=cfg.max_bonds, dtype=dtype)

    kw = {}
    known = {name: field for name, field, _ in
             BERG_VARS + FL_VARS + MTS_VARS + DEM_VARS}
    for name, arr in data.items():
        field = known.get(name)
        if field is None:
            continue
        tgt = np.asarray(getattr(st, field)).copy()
        if field in ("ine", "jne"):
            tgt[:n] = arr - 1      # back to 0-based
        else:
            tgt[:n] = arr
        kw[field] = jnp.asarray(tgt)
    kw["alive"] = jnp.asarray(np.arange(capacity) < n)
    st = st.replace(**kw)

    # order-invariance copies + localization
    st = st.replace(lon_old=st.lon, lat_old=st.lat,
                    uvel_old=st.uvel, vvel_old=st.vvel)
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, Lx)

    # the reference's localization failure is FATAL (find_cell +
    # slow-find, icebergs_fms2io.F90:900-1010); pos_to_cell clamps
    # instead, so warn loudly when restart positions fall outside the
    # grid (usually a grid/namelist mismatch, e.g. a Cartesian restart
    # read onto the default lat-lon grid)
    alive_h = np.arange(capacity) < n
    if n:
        lon_h = np.asarray(st.lon)[:n]
        lat_h = np.asarray(st.lat)[:n]
        g_lo_x = float(np.asarray(grid.lon0))
        g_hi_x = g_lo_x + grid.nx * float(np.asarray(grid.dlon))
        g_lo_y = float(np.asarray(grid.lat0))
        g_hi_y = g_lo_y + grid.ny * float(np.asarray(grid.dlat))
        out = (lat_h < g_lo_y) | (lat_h > g_hi_y)
        if not (cfg.grid_is_latlon and cfg.Lx > 0.):  # x periodic?
            out = out | (lon_h < g_lo_x) | (lon_h > g_hi_x)
        nbad = int(out.sum())
        if nbad:
            import sys
            k = int(np.argmax(out))
            print(f"KID-TPU WARNING: {nbad}/{n} restart bergs lie "
                  f"outside the grid (first at lon={lon_h[k]:.6g}, "
                  f"lat={lat_h[k]:.6g}; grid x [{g_lo_x:.6g}, "
                  f"{g_hi_x:.6g}] y [{g_lo_y:.6g}, {g_hi_y:.6g}]) — "
                  "clamped to the nearest cell; check grid_is_latlon / "
                  "ni / nj / gridres in the namelist",
                  file=sys.stderr)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


# --------------------------------------------------------------------------
# bonds restart
# --------------------------------------------------------------------------

def write_restart_bonds(path: str, st: BergState, cfg: IcebergsConfig):
    """bonds_iceberg.res.nc: one record per directed bond
    (write_restart_bonds path of icebergs_fms2io.F90:321-...).

    Partner identity comes from the id STAMPS (bond_id_cnt/bond_id_ij)
    when present, falling back to the connected slot: on a device tile a
    bond can cross the tile boundary, so its partner row is not local and
    only the stamps identify it (the reference likewise writes stored
    partner ids, not pointers)."""
    alive = np.asarray(st.alive) & (np.asarray(st.halo_berg) < 0.5)
    bond_idx = np.asarray(st.bond_idx)
    sid_cnt = np.asarray(st.bond_id_cnt)
    sid_ij = np.asarray(st.bond_id_ij)
    ine = np.asarray(st.ine) + 1
    jne = np.asarray(st.jne) + 1
    id_cnt = np.asarray(st.id_cnt)
    id_ij = np.asarray(st.id_ij)

    # (first_slot, bond_slot, other_id_cnt, other_id_ij, other_slot_or_-1)
    recs = []
    for a in np.nonzero(alive)[0]:
        for b in range(bond_idx.shape[1]):
            o = int(bond_idx[a, b])
            stamped = (sid_cnt[a, b] != 0) or (sid_ij[a, b] != 0)
            if o >= 0 and not stamped:
                recs.append((a, b, int(id_cnt[o]), int(id_ij[o]), o))
            elif stamped:
                recs.append((a, b, int(sid_cnt[a, b]), int(sid_ij[a, b]),
                             o))
    n = len(recs)

    def col(vals, kind=np.float64):
        return np.asarray(vals, kind)

    with netcdf_file(path, "w") as f:
        f.createDimension("i", n)

        def wvar(name, vals, kind="d"):
            v = f.createVariable(name, kind, ("i",))
            v[:] = col(vals, np.float64 if kind == "d" else np.int32)

        a_idx = [r[0] for r in recs]
        o_idx = [r[4] for r in recs]           # -1 when partner off-tile
        o_ine = [ine[o] if o >= 0 else 0 for o in o_idx]
        o_jne = [jne[o] if o >= 0 else 0 for o in o_idx]
        wvar("first_berg_ine", ine[a_idx], "i")
        wvar("first_berg_jne", jne[a_idx], "i")
        wvar("first_id_cnt", id_cnt[a_idx], "i")
        wvar("first_id_ij", id_ij[a_idx], "i")
        wvar("other_berg_ine", o_ine, "i")
        wvar("other_berg_jne", o_jne, "i")
        wvar("other_id_cnt", [r[2] for r in recs], "i")
        wvar("other_id_ij", [r[3] for r in recs], "i")
        if cfg.dem:
            for name, field in (("broken", "bond_broken"),
                                ("tangd1", "bond_tangd1"),
                                ("tangd2", "bond_tangd2"),
                                ("nstress", "bond_nstress"),
                                ("sstress", "bond_sstress"),
                                ("rel_rotation", "bond_rel_rotation")):
                arr = np.asarray(getattr(st, field))
                wvar(name, [arr[a, s] for (a, s, *_r) in recs],
                     "i" if name == "broken" else "d")


def read_restart_bonds(path: str, st: BergState,
                       cfg: IcebergsConfig) -> BergState:
    """Re-match bond endpoints to state slots by id
    (read_restart_bonds + connect_all_bonds,
    icebergs_fms2io.F90:1190-1482)."""
    with netcdf_file(path, "r", mmap=False) as f:
        data = {k: np.asarray(v[:]) for k, v in f.variables.items()}
    return _apply_bond_records(st, data, cfg)


def _apply_bond_records(st: BergState, data: dict,
                        cfg: IcebergsConfig) -> BergState:
    nb = len(data["first_id_cnt"])

    id_cnt = np.asarray(st.id_cnt)
    id_ij = np.asarray(st.id_ij)
    alive = np.asarray(st.alive)
    key = {}
    for s in np.nonzero(alive)[0]:
        key[(int(id_cnt[s]), int(id_ij[s]))] = s

    B = st.max_bonds
    bond_idx = np.asarray(st.bond_idx).copy()
    bond_fields = {n: np.asarray(getattr(st, f)).copy() for n, f in
                   (("broken", "bond_broken"), ("tangd1", "bond_tangd1"),
                    ("tangd2", "bond_tangd2"), ("nstress", "bond_nstress"),
                    ("sstress", "bond_sstress"),
                    ("rel_rotation", "bond_rel_rotation"))}
    nslots = np.zeros(st.capacity, int)
    for r in range(nb):
        a = key.get((int(data["first_id_cnt"][r]),
                     int(data["first_id_ij"][r])))
        o = key.get((int(data["other_id_cnt"][r]),
                     int(data["other_id_ij"][r])))
        if a is None or o is None:
            continue
        k = nslots[a]
        if k >= B:
            raise ValueError("too many bonds for max_bonds")
        bond_idx[a, k] = o
        for name in bond_fields:
            if name in data:
                bond_fields[name][a, k] = data[name][r]
        nslots[a] += 1

    st = st.replace(bond_idx=jnp.asarray(bond_idx),
                    bond_broken=jnp.asarray(bond_fields["broken"],
                                            jnp.int32),
                    bond_tangd1=jnp.asarray(bond_fields["tangd1"], st.dtype),
                    bond_tangd2=jnp.asarray(bond_fields["tangd2"], st.dtype),
                    bond_nstress=jnp.asarray(bond_fields["nstress"],
                                             st.dtype),
                    bond_sstress=jnp.asarray(bond_fields["sstress"],
                                             st.dtype),
                    bond_rel_rotation=jnp.asarray(
                        bond_fields["rel_rotation"], st.dtype),
                    n_bonds=jnp.asarray(nslots, st.dtype))
    from ..ops.forces import compute_conglom_ids_host
    return compute_conglom_ids_host(st)


# --------------------------------------------------------------------------
# calving restart
# --------------------------------------------------------------------------

def write_restart_calving(path: str, calv, grid: Grid):
    """calving.res.nc: stored_ice, stored_heat, running means
    (write path of icebergs_fms2io.F90:1484-1598)."""
    si = np.asarray(calv.stored_ice)[1:-1, 1:-1]       # interior, (nx,ny,k)
    sh = np.asarray(calv.stored_heat)[1:-1, 1:-1]
    rc = np.asarray(calv.rmean_calving)[1:-1, 1:-1]
    rh = np.asarray(calv.rmean_calving_hflx)[1:-1, 1:-1]
    idc = np.asarray(calv.id_counter)[1:-1, 1:-1]
    nx, ny = sh.shape
    with netcdf_file(path, "w") as f:
        f.createDimension("xaxis_1", nx)
        f.createDimension("yaxis_1", ny)
        f.createDimension("zaxis_1", NCLASSES)
        v = f.createVariable("stored_ice", "d",
                             ("zaxis_1", "yaxis_1", "xaxis_1"))
        v[:] = np.transpose(si, (2, 1, 0))
        for name, arr in (("stored_heat", sh), ("rmean_calving", rc),
                          ("rmean_calving_hflx", rh)):
            v = f.createVariable(name, "d", ("yaxis_1", "xaxis_1"))
            v[:] = arr.T
        v = f.createVariable("id_cnt_grid", "i", ("yaxis_1", "xaxis_1"))
        v[:] = idc.T.astype(np.int32)


def read_restart_calving(path: str, calv, grid: Grid):
    with netcdf_file(path, "r", mmap=False) as f:
        data = {k: np.asarray(v[:]) for k, v in f.variables.items()}
    nx, ny = grid.nx, grid.ny

    def pad2(a):
        return jnp.asarray(np.pad(a.T, 1), calv.stored_heat.dtype)

    kw = {}
    if "stored_ice" in data:
        si = np.transpose(data["stored_ice"], (2, 1, 0))   # (nx,ny,k)
        kw["stored_ice"] = jnp.asarray(
            np.pad(si, ((1, 1), (1, 1), (0, 0))), calv.stored_ice.dtype)
    for name, field in (("stored_heat", "stored_heat"),
                        ("rmean_calving", "rmean_calving"),
                        ("rmean_calving_hflx", "rmean_calving_hflx")):
        if name in data:
            kw[field] = pad2(data[name])
    if "id_cnt_grid" in data:
        kw["id_counter"] = jnp.asarray(np.pad(data["id_cnt_grid"].T, 1),
                                       jnp.int32)
    return calv.replace(**kw)


def read_ocean_depth(path: str, grid: Grid) -> Grid:
    """Load bathymetry from ``topog.nc`` into the grid
    (read_ocean_depth, icebergs_fms2io.F90:1600-1629): reads variable
    ``depth`` when present; missing file or variable leaves the grid's
    ocean_depth untouched, matching the reference's fall-through."""
    import os
    if not os.path.exists(path):
        print(f"KID-TPU, read_ocean_depth: {path} not present")
        return grid
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as f:
        if "depth" not in f.variables:
            print("KID-TPU, read_ocean_depth: depth WAS NOT FOUND "
                  "in the file.")
            return grid
        depth = np.asarray(f.variables["depth"][:])
    print(f"KID-TPU, read_ocean_depth: reading {path}")
    if depth.shape != (grid.nx, grid.ny) \
            and depth.shape == (grid.ny, grid.nx):   # (j, i) file order
        depth = depth.T
    if depth.shape != (grid.nx, grid.ny):
        raise ValueError(f"topog depth shape {depth.shape} does not match "
                         f"grid ({grid.nx}, {grid.ny})")
    od = np.pad(depth, 1)
    return grid.replace(ocean_depth=jnp.asarray(od, grid.ocean_depth.dtype))


# --------------------------------------------------------------------------
# distributed (io_layout) restarts: one file per device tile
# --------------------------------------------------------------------------

def write_restart_bergs_tiled(basepath: str, st_s, cfg: IcebergsConfig,
                              io_layout: int = 1):
    """Per-tile restart files ``<basepath>.NNNN`` from a sharded state.

    The analog of the reference's io_layout-decomposed restart writes
    (fms2_io domain-decomposed files; icebergs_fms2io.F90:124-633,
    mpp_define_io_domain at framework:921).  Each device writes only its
    OWNED bergs, so the union of files is the global state with no
    duplicates.  Leaves of ``st_s`` are stacked (ndev, capacity, ...)
    host-fetchable arrays.

    ``io_layout`` > 1 aggregates that many consecutive tiles per file
    (the io-tile-root gather of icebergs_fms2io.F90:91-122): file NNNN
    holds the concatenated bergs of tiles [NNNN*io_layout,
    (NNNN+1)*io_layout).  Only full groups addressable on this process
    are written (group boundaries must align with process boundaries,
    as FMS requires of io_layout).
    """
    import dataclasses
    cap = st_s.lon.shape[-1]

    def tile_views(arr):
        """{global tile id: host view} of THIS process's shards.

        Multi-host safe: only addressable shards are fetched (the
        per-process IO boundary of the reference's io_layout); on a
        single process that is every tile.  Falls back to a plain
        reshape for unsharded (host/numpy) inputs.
        """
        v_trail = 2 if (arr.ndim >= 2 and arr.shape[-2] == cap) else 1
        lead = arr.shape[:arr.ndim - v_trail]
        if hasattr(arr, "addressable_shards") and len(lead):
            out = {}
            strides = np.cumprod((lead + (1,))[::-1])[::-1][1:]
            for sh in arr.addressable_shards:
                idx = sh.index[:len(lead)]
                d = int(sum((sl.start or 0) * s
                            for sl, s in zip(idx, strides)))
                out[d] = np.asarray(sh.data).reshape(
                    (-1,) + arr.shape[arr.ndim - v_trail:])
            return out
        v = np.asarray(arr).reshape((-1,) + arr.shape[arr.ndim - v_trail:])
        return {d: v[d:d + 1] for d in range(v.shape[0])}

    per_field = {f.name: tile_views(getattr(st_s, f.name))
                 for f in dataclasses.fields(st_s)}
    tiles = sorted(per_field["lon"])
    if io_layout > 1:
        groups = {}
        for d in tiles:
            groups.setdefault(d // io_layout, []).append(d)
        groups = {g: ds for g, ds in groups.items()
                  if len(ds) == io_layout}
    else:
        groups = {d: [d] for d in tiles}
    paths = []
    for g in sorted(groups):
        members = groups[g]
        merged = {}
        for k, v in per_field.items():
            arrs = [np.asarray(v[d][0]) for d in members]
            merged[k] = jnp.asarray(np.concatenate(arrs, axis=0))
        stl = BergState(**merged)
        if io_layout > 1 and cfg.iceberg_bonds_on:
            # local bond slot indices shift by each member's capacity
            cap = np.asarray(per_field["lon"][members[0]][0]).shape[0]
            bidx = np.asarray(merged["bond_idx"]).copy()
            for mi in range(1, len(members)):
                rows = slice(mi * cap, (mi + 1) * cap)
                bidx[rows] = np.where(bidx[rows] >= 0,
                                      bidx[rows] + mi * cap, -1)
            stl = stl.replace(bond_idx=jnp.asarray(bidx))
        p = f"{basepath}.{g:04d}"
        write_restart_bergs(p, stl, cfg)
        paths.append(p)
        if cfg.iceberg_bonds_on:
            # per-tile bond files alongside the berg tiles, so bonded/DEM
            # state survives a tiled save/load round-trip (the
            # single-controller path writes bonds_iceberg.res.nc)
            write_restart_bonds(_bond_tile_path(basepath, g), stl, cfg)
    return paths


def _bond_tile_path(basepath: str, d: int) -> str:
    import os
    head, tail = os.path.split(basepath)
    return os.path.join(head, f"bonds_{tail}.{d:04d}")


def read_restart_bonds_tiled(basepath: str, st: BergState,
                             cfg: IcebergsConfig) -> BergState:
    """Re-match bonds from the per-tile ``bonds_<name>.NNNN`` files onto a
    (merged) global state — counterpart of :func:`read_restart_bergs_tiled`
    for bonded/DEM configurations."""
    import glob
    import os
    head, tail = os.path.split(basepath)
    files = sorted(glob.glob(os.path.join(
        head, f"bonds_{tail}") + ".[0-9][0-9][0-9][0-9]"))
    if not files:
        raise FileNotFoundError(
            f"no tiled bond restarts bonds_{tail}.NNNN next to {basepath}")
    datas = []
    for p in files:
        with netcdf_file(p, "r", mmap=False) as f:
            datas.append({k: np.asarray(v[:]) for k, v in
                          f.variables.items()})
    merged = {k: np.concatenate([d[k] for d in datas]) for k in datas[0]}
    return _apply_bond_records(st, merged, cfg)


def read_restart_bergs_tiled(basepath: str, capacity: int, grid: Grid,
                             cfg: IcebergsConfig,
                             dtype=jnp.float32) -> BergState:
    """Assemble a global BergState from ``<basepath>.NNNN`` tile files
    (the reference reassembles distributed restarts through fms2_io's
    domain reads)."""
    import glob
    files = sorted(glob.glob(basepath + ".[0-9][0-9][0-9][0-9]"))
    if not files:
        raise FileNotFoundError(f"no tiled restarts at {basepath}.NNNN")
    datas = []
    for p in files:
        with netcdf_file(p, "r", mmap=False) as f:
            datas.append({name: np.asarray(f.variables[name][:])
                          for name in f.variables})
    merged = {k: np.concatenate([d[k] for d in datas])
              for k in datas[0]}
    n = len(merged["lon"])
    if n > capacity:
        raise ValueError(f"tiled restarts hold {n} bergs > capacity")
    st = empty_state(capacity, max_bonds=cfg.max_bonds, dtype=dtype)
    kw = {}
    known = {name: field for name, field, _ in
             BERG_VARS + FL_VARS + MTS_VARS + DEM_VARS}
    for name, arr in merged.items():
        field = known.get(name)
        if field is None:
            continue
        tgt = np.asarray(getattr(st, field)).copy()
        if field in ("ine", "jne"):
            tgt[:n] = arr - 1
        else:
            tgt[:n] = arr
        kw[field] = jnp.asarray(tgt)
    kw["alive"] = jnp.asarray(np.arange(capacity) < n)
    st = st.replace(**kw)
    st = st.replace(lon_old=st.lon, lat_old=st.lat,
                    uvel_old=st.uvel, vvel_old=st.vvel)
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, Lx)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)
