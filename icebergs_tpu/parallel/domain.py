"""Spatial domain decomposition over a device mesh.

TPU-native replacement for the reference's FMS/MPI layer
(``mpp_define_domains`` + halo updates + particle sends,
``src/icebergs_framework.F90:913-934, 1800-2135, 2997-3249``):

* the global grid is split into per-device tiles along x (1-D mesh ring),
  each tile carrying ``halo`` extra columns of real neighbor data — the
  analog of the FMS data domain;
* particles live in fixed-capacity per-device slabs; ownership migration
  (``send_bergs_to_other_pes``) and halo replication
  (``update_halo_icebergs``) become masked ``ppermute`` exchanges of
  fixed-width slabs inside ``shard_map`` — no dynamic buffers;
* global budgets use ``psum``.

The whole coupled step runs as ONE jitted shard_map program; collectives
ride ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import IcebergsConfig
from ..grid import Grid, make_uniform_grid, pos_to_cell
from ..state import BergState, empty_state, allocate_slots
from ..forcing import Forcing

AXIS = "x"

# (x, y) vector components that rotate 180 deg across the tripolar fold.
# The reference keeps geographic coords so bergs cross the fold untouched
# (icebergs_framework.F90:2010-2076); our tiles are logical index space,
# so the fold is the explicit isometry lon->S_lon-lon, lat->S_lat-lat,
# (u,v)->(-u,-v) — the "180 degree rotation" of icebergs.F90:6112-6124.
_FOLD_VECTOR_PAIRS = (
    ("uvel", "vvel"), ("uvel_old", "vvel_old"), ("uvel_prev", "vvel_prev"),
    ("axn", "ayn"), ("bxn", "byn"),
    ("axn_fast", "ayn_fast"), ("bxn_fast", "byn_fast"),
    ("uo", "vo"), ("ui", "vi"), ("ua", "va"), ("ssh_x", "ssh_y"),
)


class ShardedWorld(NamedTuple):
    mesh: Mesh
    grids: Grid          # stacked local grids, leaves (ndev, ...)
    cfg: IcebergsConfig
    nxl: int             # interior cells per tile (x)
    halo: int
    # host (numpy/unsharded) copy of the stacked tile grids: the
    # init/IO-boundary helpers (shard_state & co.) must not fetch the
    # device copy, whose shards are NON-ADDRESSABLE on a multi-process
    # mesh (jax.distributed).  None -> fall back to the device copy
    # (single-process direct constructions in tests).
    grids_host: Grid = None


def _stack(pytrees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pytrees)


def _slice_tile_grid(gg: Grid, sx: int, sy: int, nxt: int, nyt: int, *,
                     periodic: bool, folded_north: bool = False,
                     own_hx: int = 0, own_hy: int = 0,
                     dtype=jnp.float32) -> Grid:
    """Tile grid covering global cells [sx, sx+nxt) x [sy, sy+nyt).

    Interior values are bitwise SLICES of the global arrays (tile grids
    recomputed from a shifted origin round differently at the ulp level,
    breaking parallel_reprod).  Halo cells beyond the global domain are
    land except folded-north msk/depth images; corner coordinates extend
    linearly (virtual coordinates, as the fold/periodic particle
    transforms expect).  Records i_off/j_off/nxg/nyg for globally-unique
    spawn ids and own_halo_* so spawning skips non-owned cells.
    """
    nx, ny = gg.nx, gg.ny
    gx = np.asarray(gg.lonc)[:, 0].astype(np.float64)
    gy = np.asarray(gg.latc)[0, :].astype(np.float64)
    dlon = float(np.asarray(gg.dlon))
    dlat = float(np.asarray(gg.dlat))
    ix = np.arange(sx, sx + nxt + 1)
    iy = np.arange(sy, sy + nyt + 1)
    cx = np.clip(ix, 0, nx)
    cy = np.clip(iy, 0, ny)
    xc = gx[cx] + (ix - cx) * dlon
    yc = gy[cy] + (iy - cy) * dlat
    lonc, latc = np.meshgrid(xc, yc, indexing="ij")

    pcx = np.arange(sx, sx + nxt + 2)        # global padded-center indices
    pcy = np.arange(sy, sy + nyt + 2)
    if periodic:
        gcx = np.where((pcx >= 1) & (pcx <= nx), pcx, (pcx - 1) % nx + 1)
    else:
        gcx = np.clip(pcx, 0, nx + 1)
    gcy = np.clip(pcy, 0, ny + 1)

    def centers(a, fold: bool):
        a = np.asarray(a)
        out = a[np.ix_(gcx, gcy)].copy()
        if folded_north and fold:
            # padded center p images (nx+1-p, 2ny+1-p') like shard_forcing
            for k in np.nonzero(pcy >= ny + 1)[0]:
                pyf = 2 * ny + 1 - pcy[k]
                if 1 <= pyf <= ny:
                    out[:, k] = a[np.clip(nx + 1 - gcx, 0, nx + 1), pyf]
        return jnp.asarray(out, dtype)

    return Grid(
        nx=nxt, ny=nyt,
        lonc=jnp.asarray(lonc, dtype), latc=jnp.asarray(latc, dtype),
        cosc=jnp.ones((nxt + 1, nyt + 1), dtype),
        sinc=jnp.zeros((nxt + 1, nyt + 1), dtype),
        msk=centers(gg.msk, True), area=centers(gg.area, True),
        dx=centers(gg.dx, True), dy=centers(gg.dy, True),
        ocean_depth=centers(gg.ocean_depth, True),
        lat_center=centers(gg.lat_center, False),
        lon0=jnp.asarray(xc[0], dtype), lat0=jnp.asarray(yc[0], dtype),
        dlon=gg.dlon, dlat=gg.dlat,
        i_off=jnp.asarray(sx, jnp.int32), j_off=jnp.asarray(sy, jnp.int32),
        nxg=nx, nyg=ny, own_halo_x=own_hx, own_halo_y=own_hy)


def make_sharded_world(cfg: IcebergsConfig, mesh: Mesh, *, nx, ny, lon0,
                       lat0, dlon, dlat, msk=None, ocean_depth=None,
                       maskmap=None, dtype=jnp.float32) -> ShardedWorld:
    """Split a uniform global grid into per-device tiles (+halo columns).

    ``maskmap`` (the mpp_define_domains argument,
    icebergs_framework.F90:915-917 / icebergs.F90:116): a boolean per
    layout column; False columns are ALL-LAND tiles that get NO device.
    The mesh then needs only ``sum(maskmap)`` devices; the remaining
    tiles keep their global offsets, and the x-ring connects them in
    ascending order — no particle or meaningful field can cross a
    masked (all-land) gap, so the exchange pattern is unchanged.
    """
    ndev = mesh.devices.size
    if msk is None:
        msk = np.ones((nx, ny))
    if maskmap is not None:
        maskmap = np.asarray(maskmap, bool).reshape(-1)
        ncols = maskmap.size
        assert nx % ncols == 0, "nx must divide the maskmap columns"
        nxl = nx // ncols
        cols = np.nonzero(maskmap)[0]
        assert len(cols) == ndev, \
            (f"maskmap keeps {len(cols)} columns but the mesh has "
             f"{ndev} devices")
        m = np.asarray(msk)
        for c in np.nonzero(~maskmap)[0]:
            assert not m[c * nxl:(c + 1) * nxl, :].any(), \
                f"maskmap drops column {c} which contains ocean"
    else:
        assert nx % ndev == 0, "nx must divide the device count"
        nxl = nx // ndev
        cols = np.arange(ndev)
    H = max(cfg.halo, 2)
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))
    periodic = cfg.grid_is_latlon and cfg.Lx > 0.

    gg = make_uniform_grid(nx, ny, lon0, lat0, dlon, dlat,
                           grid_is_latlon=cfg.grid_is_latlon,
                           Rearth=cfg.Rearth, msk=msk,
                           ocean_depth=ocean_depth, dtype=dtype)
    grids = []
    for c in cols:
        grids.append(_slice_tile_grid(
            gg, int(c) * nxl - H, 0, nxl + 2 * H, ny, periodic=periodic,
            own_hx=H, own_hy=0, dtype=dtype))
    grids_host = _stack(grids)
    grids = jax.device_put(grids_host, jax.NamedSharding(mesh, P(AXIS)))
    return ShardedWorld(mesh=mesh, grids=grids, cfg=cfg, nxl=nxl, halo=H,
                        grids_host=grids_host)


def shard_forcing(world: ShardedWorld, frc_global: Forcing) -> Forcing:
    """Slice a global Forcing into stacked per-tile forcing (+halo)."""
    ndev = world.mesh.devices.size
    nxl, H = world.nxl, world.halo
    nx = nxl * ndev
    periodic = world.cfg.grid_is_latlon and world.cfg.Lx > 0.

    def corner_slice(a, d):
        a = np.asarray(a)
        idx = np.arange(d * nxl - H, (d + 1) * nxl + H + 1)
        idx = idx % nx if periodic else np.clip(idx, 0, nx)
        return a[idx]

    def center_slice(a, d):
        a = np.asarray(a)   # halo-padded global (nx+2, ny+2)
        idx = np.arange(d * nxl - H, (d + 1) * nxl + 2 + H)
        if periodic:
            # interior wraps; keep simple clip for the pad ring
            idx = np.clip(idx, 0, nx + 1)
        else:
            idx = np.clip(idx, 0, nx + 1)
        return a[idx]

    ndim_corner = frc_global.uo.shape
    tiles = []
    for d in range(ndev):
        tiles.append(Forcing(
            uo=corner_slice(frc_global.uo, d), vo=corner_slice(frc_global.vo, d),
            ui=corner_slice(frc_global.ui, d), vi=corner_slice(frc_global.vi, d),
            ua=corner_slice(frc_global.ua, d), va=corner_slice(frc_global.va, d),
            ssh=center_slice(frc_global.ssh, d), sst=center_slice(frc_global.sst, d),
            sss=center_slice(frc_global.sss, d), cn=center_slice(frc_global.cn, d),
            hi=center_slice(frc_global.hi, d)))
    stacked = _stack([jax.tree.map(jnp.asarray, t) for t in tiles])
    return jax.device_put(stacked, jax.NamedSharding(world.mesh, P(AXIS)))


def shard_state(world: ShardedWorld, st_global: BergState,
                local_capacity: int) -> BergState:
    """Distribute bergs to owning tiles as stacked per-device slabs.

    Host-side (init/IO boundary): the analog of the restart-read
    distribution in icebergs_fms2io.F90:662-1188.
    """
    ndev = world.mesh.devices.size
    nxl, H = world.nxl, world.halo
    ghost = world.grids_host if world.grids_host is not None \
        else world.grids
    lon0 = float(np.asarray(ghost.lon0)[0]) + H * float(
        np.asarray(ghost.dlon)[0])
    dlon = float(np.asarray(ghost.dlon)[0])

    # preserve bonds across redistribution: stamp partner ids now; slots
    # are re-matched by id after the first halo exchange
    if world.cfg.iceberg_bonds_on:
        from ..ops.forces import stamp_bond_ids
        st_global = stamp_bond_ids(st_global)

    lon = np.asarray(st_global.lon)
    alive = np.asarray(st_global.alive)
    owner = np.floor((lon - lon0) / (dlon * nxl)).astype(int)
    owner = np.clip(owner, 0, ndev - 1)

    slabs = []
    for d in range(ndev):
        mine = alive & (owner == d)
        idx = np.nonzero(mine)[0]
        n = len(idx)
        if n > local_capacity:
            raise ValueError(f"device {d}: {n} bergs > local capacity")
        sl = empty_state(local_capacity, max_bonds=st_global.max_bonds,
                         dtype=st_global.dtype)
        take = {}
        import dataclasses
        for f in dataclasses.fields(st_global):
            src = np.asarray(getattr(st_global, f.name))
            dst = np.asarray(getattr(sl, f.name)).copy()
            dst[:n] = src[idx]
            take[f.name] = jnp.asarray(dst)
        # remap bond indices from global slots to local slots
        gl2loc = np.full((st_global.capacity,), -1, np.int32)
        gl2loc[idx] = np.arange(n)
        bidx = np.asarray(st_global.bond_idx)[idx]
        bidx = np.where(bidx >= 0, gl2loc[np.clip(bidx, 0, None)], -1)
        dstb = np.full((local_capacity, st_global.max_bonds), -1, np.int32)
        dstb[:n] = bidx
        take["bond_idx"] = jnp.asarray(dstb)
        take["alive"] = jnp.asarray(
            np.arange(local_capacity) < n)
        sl = BergState(**take)
        # localize cell indices to this tile's grid (the reference re-runs
        # find_cell on unpack, icebergs_framework.F90:3456)
        g = jax.tree.map(lambda x: x[d], ghost)
        slabs.append(relocalize(sl, g, world.cfg))
    stacked = _stack(slabs)
    return jax.device_put(stacked,
                          jax.NamedSharding(world.mesh, P(AXIS)))


def relocalize(st: BergState, grid: Grid, cfg: IcebergsConfig) -> BergState:
    """Recompute local (ine, jne, xi, yj) from global positions."""
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, Lx)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


# --------------------------------------------------------------------------
# particle exchange inside shard_map
# --------------------------------------------------------------------------

def _pack_to(st: BergState, send_mask, width: int):
    """Pack marked bergs into a fixed-width slab pytree (masked gather)."""
    cap = st.capacity
    rank = jnp.cumsum(send_mask.astype(jnp.int32)) - 1
    slot = jnp.where(send_mask & (rank < width), rank, width)
    # gather indices: for each buffer slot, which berg (or cap = none)
    src_of = jnp.full((width,), cap, jnp.int32).at[
        jnp.clip(slot, 0, width)].set(
        jnp.arange(cap, dtype=jnp.int32), mode='drop')

    def pack(leaf):
        pad_shape = (1,) + leaf.shape[1:]
        padded = jnp.concatenate(
            [leaf, jnp.zeros(pad_shape, leaf.dtype)], axis=0)
        return padded[src_of]

    buf = jax.tree.map(pack, st)
    valid = src_of < cap
    overflow = jnp.sum((send_mask & (rank >= width)).astype(jnp.int32))
    return buf, valid, overflow


def _unpack_from(st: BergState, buf: BergState, valid, *, halo_flag=None):
    """Insert received bergs into free slots."""
    granted, slots = allocate_slots(st.alive, valid)
    cap = st.capacity

    def put(field, values):
        tgt = jnp.where(granted, slots, cap)
        return field.at[tgt].set(values, mode='drop')

    import dataclasses
    kw = {}
    for f in dataclasses.fields(st):
        if f.name == "alive":
            continue
        kw[f.name] = put(getattr(st, f.name), getattr(buf, f.name))
    tgt = jnp.where(granted, slots, cap)
    newly = jnp.zeros((cap,), bool).at[tgt].set(True, mode='drop')
    if halo_flag is not None:
        kw["halo_berg"] = jnp.where(newly, halo_flag, kw["halo_berg"])
    # received bergs lose cross-device bond pointers; re-match by id later
    kw["bond_idx"] = jnp.where(newly[:, None], -1, kw["bond_idx"])
    st = st.replace(alive=st.alive | newly, **kw)
    overflow = jnp.sum((valid & ~granted).astype(jnp.int32))
    return st, overflow


def fold_state(buf: BergState, *, nxl: int, nyl: int, H: int,
               lon_sum: float, lat_sum: float) -> BergState:
    """Apply the tripolar-fold isometry to a packed berg slab.

    180-degree rotation in logical space (mirror x about the grid midline,
    reflect y about the fold edge): positions map through
    (lon, lat) -> (lon_sum - lon, lat_sum - lat), every (x, y) vector pair
    negates, local indices mirror (ine within the mirrored tile, jne about
    the fold line), intra-cell coords flip.  ``rot`` turns by pi (a
    multiple of the hexagon's 60-degree symmetry).  ``start_*`` provenance
    stays untouched, as in the reference (geographic, fold-invariant).
    """
    kw = {}
    for ux, vy in _FOLD_VECTOR_PAIRS:
        kw[ux] = -getattr(buf, ux)
        kw[vy] = -getattr(buf, vy)
    kw["lon"] = lon_sum - buf.lon
    kw["lat"] = lat_sum - buf.lat
    kw["lon_old"] = lon_sum - buf.lon_old
    kw["lat_old"] = lat_sum - buf.lat_old
    kw["xi"] = 1.0 - buf.xi
    kw["yj"] = 1.0 - buf.yj
    kw["ine"] = (2 * H + nxl - 1) - buf.ine
    kw["jne"] = 2 * (H + nyl) - 1 - buf.jne
    kw["rot"] = buf.rot + np.float32(np.pi)
    return buf.replace(**kw)


def _exchange_fold_north(st: BergState, nxl: int, nyl: int, H: int,
                         width: int, *, lon_sum: float, lat_sum: float,
                         y_axis: str | None):
    """Migration + halo replication across the tripolar folded-north edge.

    The reference's ``folded_north_on_pe`` branches
    (icebergs_framework.F90:933, 2010-2076, 2908-2961, 3138-3191): the
    north neighbor of top-row tile ``dx`` is the x-mirrored top-row tile
    ``ndx-1-dx``.  Here that is one ``ppermute`` with the mirror
    permutation along the x mesh axis, with :func:`fold_state` applied to
    the slab in flight.  ndx == 1 degenerates to a self-send (a tile
    folding onto itself), matching FMS behavior for a 1-wide layout.
    """
    ndx = jax.lax.axis_size(AXIS)
    mirror = [(d, ndx - 1 - d) for d in range(ndx)]
    if y_axis is not None:
        is_top = jax.lax.axis_index(y_axis) == jax.lax.axis_size(y_axis) - 1
    else:
        is_top = jnp.array(True)

    def pperm(tree):
        return jax.tree.map(lambda x: jax.lax.ppermute(x, AXIS, mirror),
                            tree)

    def fold(buf):
        return fold_state(buf, nxl=nxl, nyl=nyl, H=H, lon_sum=lon_sum,
                          lat_sum=lat_sum)

    # migration: owned bergs beyond the fold line re-enter mirrored,
    # heading south (send_bergs_to_other_pes fold branch)
    go = st.alive & (st.halo_berg < 0.5) & (st.jne >= H + nyl) & is_top
    buf, valid, ov1 = _pack_to(st, go, width)
    st = st.replace(alive=st.alive & ~go)
    buf = pperm(buf)
    valid = jax.lax.ppermute(valid, AXIS, mirror) & is_top
    st, ov2 = _unpack_from(st, fold(buf), valid)

    # halo replication: the strip within H of the fold (including x-halo
    # copies already received, so fold corners arrive in this one pass)
    strip = st.alive & (st.jne >= nyl) & (st.jne < H + nyl) & is_top
    buf, valid, ov3 = _pack_to(st, strip, width)
    buf = pperm(buf)
    valid = jax.lax.ppermute(valid, AXIS, mirror) & is_top
    st, ov4 = _unpack_from(st, fold(buf), valid, halo_flag=1.0)
    return st, ov1 + ov2 + ov3 + ov4


def _exchange_axis(st: BergState, axis: str, idx_field: str, nl: int,
                   H: int, width: int, *, halo_too: bool = True,
                   fold_top: bool = False):
    """Migration + halo replication along one mesh axis.

    One direction pass of ``send_bergs_to_other_pes`` +
    ``update_halo_icebergs``.  Running this for x then y moves diagonal
    travellers and corner halos in two hops — the same two-pass corner
    handling as the reference (icebergs_framework.F90:1840-2135).
    """
    ndev = jax.lax.axis_size(axis)
    right = [(d, (d + 1) % ndev) for d in range(ndev)]
    left = [(d, (d - 1) % ndev) for d in range(ndev)]

    def ppermute(tree, perm):
        return jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), tree)

    def idx(s):
        return getattr(s, idx_field)

    def with_idx(buf, shift):
        return buf.replace(**{idx_field: idx(buf) + shift})

    overflow = jnp.zeros((), jnp.int32)

    # migration: interior cells are [H, H+nl); only owned bergs migrate
    owned = st.alive & (st.halo_berg < 0.5)
    go_lo = owned & (idx(st) < H)
    go_hi = owned & (idx(st) >= H + nl)
    if fold_top:
        # folded-north grid: the top edge is handled by the fold pass and
        # the bottom edge is closed (no y wrap-around)
        not_top = jax.lax.axis_index(axis) != ndev - 1
        not_bot = jax.lax.axis_index(axis) != 0
        go_hi = go_hi & not_top
        go_lo = go_lo & not_bot
    for mask, perm, shift in ((go_hi, right, -nl), (go_lo, left, nl)):
        buf, valid, ov1 = _pack_to(st, mask, width)
        st = st.replace(alive=st.alive & ~mask)
        buf = ppermute(buf, perm)
        valid = jax.lax.ppermute(valid, axis, perm)
        st, ov2 = _unpack_from(st, with_idx(buf, shift), valid)
        overflow = overflow + ov1 + ov2

    if halo_too:
        # halo replication of edge strips (both owned and already-received
        # halo copies, so corners propagate on the second axis pass)
        edge_hi = st.alive & (idx(st) >= nl)
        edge_lo = st.alive & (idx(st) < 2 * H)
        if fold_top:
            edge_hi = edge_hi & not_top
            edge_lo = edge_lo & not_bot
        for mask, perm, shift in ((edge_hi, right, -nl), (edge_lo, left, nl)):
            buf, valid, ov1 = _pack_to(st, mask, width)
            buf = ppermute(buf, perm)
            valid = jax.lax.ppermute(valid, axis, perm)
            st, ov2 = _unpack_from(st, with_idx(buf, shift), valid,
                                   halo_flag=1.0)
            overflow = overflow + ov1 + ov2
    return st, overflow


def exchange_particles(st: BergState, grid: Grid, cfg: IcebergsConfig,
                       nxl: int, H: int, width: int, *,
                       nyl: int | None = None, y_axis: str | None = None,
                       fold_north: tuple | None = None,
                       conglom_id_cap: int = 64):
    """Ownership migration + halo replication via ppermute.

    The SoA analog of ``send_bergs_to_other_pes`` + ``update_halo_icebergs``.
    1-D (x ring) by default; pass nyl/y_axis for a 2-D mesh (x pass then y
    pass; corners covered by the second pass).  With bonds on, whole
    conglomerates are additionally replicated to every device
    (transfer_mts_bergs' invariant, icebergs_framework.F90:2298-2313) and
    bond pointers re-matched by id.

    ``fold_north=(lon_sum, lat_sum)`` enables the tripolar folded-north
    edge: a third exchange pass mirrors top-edge traffic across the fold
    (see :func:`_exchange_fold_north`).  Bonds spanning the fold line are
    not yet supported (conglomerate replication copies coordinates
    untransformed).
    """
    from ..ops import forces as _forces

    if cfg.iceberg_bonds_on:
        st = _forces.stamp_bond_ids(st)

    # drop stale halo copies (update_halo_icebergs first phase)
    st = st.replace(alive=st.alive & (st.halo_berg < 0.5))

    st, ov_x = _exchange_axis(st, AXIS, "ine", nxl, H, width)
    overflow = ov_x
    if y_axis is not None:
        st, ov_y = _exchange_axis(st, y_axis, "jne", nyl, H, width,
                                  fold_top=fold_north is not None)
        overflow = overflow + ov_y
    if fold_north is not None:
        assert y_axis is not None, "fold_north requires the 2-D world " \
            "(use a (ndx, 1) mesh for a 1-D layout with a fold)"
        lon_sum, lat_sum = fold_north
        st, ov_f = _exchange_fold_north(st, nxl, nyl, H, width,
                                        lon_sum=lon_sum, lat_sum=lat_sum,
                                        y_axis=y_axis)
        overflow = overflow + ov_f

    if cfg.iceberg_bonds_on:
        st, ov_b = replicate_bonded_bergs(
            st, width, nxl, H, nyl=nyl, y_axis=y_axis, grid=grid,
            conglom_id_cap=conglom_id_cap, fold_north=fold_north)
        overflow = overflow + ov_b
        st = _forces.connect_bonds_by_id(st)
        st = _forces.count_bonds(st)
        # re-localize halo copies on MY extended tile; far-away
        # conglomerate members clamp to the nearest halo cell, coords
        # unchanged (same convention as evolve_icebergs_mts,
        # icebergs.F90:6608-6611)
        Lx = cfg.Lx if cfg.grid_is_latlon else -1.
        from ..grid import pos_to_cell
        i2, j2, xi2, yj2 = pos_to_cell(grid, st.lon, st.lat, Lx)
        halo = st.alive & (st.halo_berg >= 0.5)
        st = st.replace(ine=jnp.where(halo, i2, st.ine),
                        jne=jnp.where(halo, j2, st.jne),
                        xi=jnp.where(halo, xi2, st.xi),
                        yj=jnp.where(halo, yj2, st.yj))
    return st, overflow


def _wanted_conglom_ids(st, cap: int):
    """Fixed-width list of distinct conglomerate ids with a member on
    this device (owned or strip-halo copy).  0 = unlabeled; returns
    (ids[cap] with 0 padding, n_dropped)."""
    present = st.alive & (st.conglom_id > 0) & jnp.any(
        (st.bond_id_cnt != 0) | (st.bond_id_ij != 0), axis=1)
    ids = jnp.where(present, st.conglom_id, 0)
    s = jnp.sort(ids)                       # zeros first
    first = (s > 0) & (s != jnp.concatenate([jnp.zeros((1,), s.dtype),
                                             s[:-1]]))
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    out = jnp.zeros((cap,), s.dtype).at[
        jnp.where(first & (rank < cap), rank, cap)].set(s, mode='drop')
    dropped = jnp.sum((first & (rank >= cap)).astype(jnp.int32))
    return out, dropped


def replicate_bonded_bergs(st: BergState, width: int, nxl: int, H: int, *,
                           nyl: int | None = None,
                           y_axis: str | None = None,
                           grid: Grid | None = None,
                           conglom_id_cap: int = 64,
                           fold_north: tuple | None = None):
    """Replicate conglomerate members to the devices that overlap them.

    TPU-native realization of ``transfer_mts_bergs``' invariant — "each PE
    holds a complete copy of any conglomerate it overlaps"
    (icebergs_framework.F90:2136-2313).  Each device publishes the id set
    of conglomerates with a member on its extended tile (owned bergs plus
    strip-halo copies, i.e. members within H cells of the boundary); only
    members of conglomerates wanted by ANOTHER device enter the
    all-gather, and each receiver keeps only rows of conglomerates it
    wants — devices far from any shared conglomerate contribute and
    retain nothing, unlike the round-1 full replication.  Unlabeled
    members (conglom_id == 0) fall back to full replication.  Copies land
    with halo_berg=1 so they are dropped next exchange.

    ``fold_north=(lon_sum, lat_sum)`` adds the tripolar fold image
    (icebergs_framework.F90:2908-2961): a received member whose fold
    image lies closer to this tile is mirrored (positions reflected,
    velocities rotated 180 degrees) so cross-fold bonds measure correct
    distances in the local virtual frame.
    """
    owned = st.alive & (st.halo_berg < 0.5)
    # bondedness from the id stamps: partner slots may not be connected yet
    has_stamp = jnp.any((st.bond_id_cnt != 0) | (st.bond_id_ij != 0), axis=1)
    bonded = owned & has_stamp

    # wanted sets BEFORE deleting strip copies (they witness overlap)
    my_wanted, ov_ids = _wanted_conglom_ids(st, conglom_id_cap)

    # don't duplicate bergs already replicated by the strip-halo phase:
    # mark strip halo copies of bonded bergs dead first
    halo_bonded = st.alive & (st.halo_berg >= 0.5) & has_stamp
    st = st.replace(alive=st.alive & ~halo_bonded)

    axes = [AXIS] + ([y_axis] if y_axis is not None else [])
    all_wanted = my_wanted
    for ax in axes:
        all_wanted = jax.lax.all_gather(all_wanted, ax, axis=0,
                                        tiled=False)
    all_wanted = all_wanted.reshape(-1)          # (ndev*cap,)

    # my linear device position in the gathered axes (each all_gather
    # prepends its axis, so after gathering x then y the leading axes
    # are (y, x))
    if y_axis is not None:
        ndx = jax.lax.axis_size(AXIS)
        my_lin = jax.lax.axis_index(y_axis) * ndx + jax.lax.axis_index(AXIS)
    else:
        my_lin = jax.lax.axis_index(AXIS)

    # ship owned members that some OTHER device wants (or unlabeled):
    # zero out my own slice of the gathered id sets, else every owned
    # bonded berg ships (its conglomerate id is in my own wanted set)
    # and the send-side filter is a no-op
    cap = my_wanted.shape[0]
    slice_owner = jnp.arange(all_wanted.shape[0]) // cap
    wanted_by_other = jnp.where(slice_owner == my_lin, 0, all_wanted)
    ship = bonded & ((st.conglom_id <= 0) | jnp.any(
        st.conglom_id[:, None] == wanted_by_other[None, :], axis=1))
    buf, valid, ov1 = _pack_to(st, ship, width)

    bufs = buf
    valids = valid
    for ax in axes:
        bufs = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=False), bufs)
        valids = jax.lax.all_gather(valids, ax, axis=0, tiled=False)
    # flatten gathered device axes: (D..., width) -> (D*width,)
    def flat(x):
        return x.reshape((-1,) + x.shape[len(axes) + 1:])
    bufs = jax.tree.map(flat, bufs)
    valids = valids.reshape(-1)

    # skip my own contribution
    src = jnp.arange(valids.shape[0]) // width
    valids = valids & (src != my_lin)

    # receive filter: rows of conglomerates I want (or unlabeled)
    keep = (bufs.conglom_id <= 0) | jnp.any(
        bufs.conglom_id[:, None] == my_wanted[None, :], axis=1)
    valids = valids & keep

    if fold_north is not None and grid is not None:
        # pick the representation (native or fold image) nearer my tile
        # center in BOTH coordinates (a cross-fold partner's latitude is
        # near the fold on either representation; longitude discriminates)
        lon_sum, lat_sum = fold_north
        cx = grid.lon0 + 0.5 * grid.dlon * grid.nx
        cy = grid.lat0 + 0.5 * grid.dlat * grid.ny
        lon_f = lon_sum - bufs.lon
        lat_f = lat_sum - bufs.lat
        d2_n = (bufs.lon - cx) ** 2 + (bufs.lat - cy) ** 2
        d2_f = (lon_f - cx) ** 2 + (lat_f - cy) ** 2
        use_f = d2_f < d2_n
        bufs = bufs.replace(
            lon=jnp.where(use_f, lon_sum - bufs.lon, bufs.lon),
            lat=jnp.where(use_f, lat_f, bufs.lat),
            lon_old=jnp.where(use_f, lon_sum - bufs.lon_old, bufs.lon_old),
            lat_old=jnp.where(use_f, lat_sum - bufs.lat_old, bufs.lat_old),
            uvel=jnp.where(use_f, -bufs.uvel, bufs.uvel),
            vvel=jnp.where(use_f, -bufs.vvel, bufs.vvel),
            uvel_old=jnp.where(use_f, -bufs.uvel_old, bufs.uvel_old),
            vvel_old=jnp.where(use_f, -bufs.vvel_old, bufs.vvel_old),
            uvel_prev=jnp.where(use_f, -bufs.uvel_prev, bufs.uvel_prev),
            vvel_prev=jnp.where(use_f, -bufs.vvel_prev, bufs.vvel_prev),
            axn=jnp.where(use_f, -bufs.axn, bufs.axn),
            ayn=jnp.where(use_f, -bufs.ayn, bufs.ayn),
            bxn=jnp.where(use_f, -bufs.bxn, bufs.bxn),
            byn=jnp.where(use_f, -bufs.byn, bufs.byn))

    overflow = ov1 + ov_ids
    st, ov2 = _unpack_from(st, bufs, valids, halo_flag=1.0)
    return st, overflow + ov2


# --------------------------------------------------------------------------
# 2-D mesh decomposition (x, y)
# --------------------------------------------------------------------------

AXIS_Y = "y"


class ShardedWorld2D(NamedTuple):
    mesh: Mesh
    grids: Grid          # leaves (ndx, ndy, ...)
    cfg: IcebergsConfig
    nxl: int
    nyl: int
    halo: int
    # tripolar folded-north edge (FOLD_NORTH_EDGE,
    # icebergs_framework.F90:649,933): positions map through
    # lon -> fold_lon_sum - lon, lat -> fold_lat_sum - lat
    folded_north: bool = False
    fold_lon_sum: float = 0.0
    fold_lat_sum: float = 0.0


def make_sharded_world_2d(cfg: IcebergsConfig, mesh: Mesh, *, nx, ny,
                          lon0, lat0, dlon, dlat, msk=None,
                          ocean_depth=None, folded_north=False,
                          dtype=jnp.float32) -> ShardedWorld2D:
    """2-D tile decomposition: the full analog of mpp_define_domains'
    (layout_x, layout_y) (icebergs_framework.F90:915-925).

    ``folded_north=True`` makes the top edge a tripolar fold: global cell
    (i, ny+k) is the image of (nx-1-i, ny-1-k), so top-row tiles carry
    folded real data in their north halo and particle exchange runs the
    fold pass (icebergs_framework.F90:933, FOLD_NORTH_EDGE)."""
    ndx, ndy = mesh.devices.shape
    assert nx % ndx == 0 and ny % ndy == 0
    nxl, nyl = nx // ndx, ny // ndy
    H = max(cfg.halo, 2)

    if msk is None:
        msk = np.ones((nx, ny))
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))
    periodic = cfg.grid_is_latlon and cfg.Lx > 0.

    gg = make_uniform_grid(nx, ny, lon0, lat0, dlon, dlat,
                           grid_is_latlon=cfg.grid_is_latlon,
                           Rearth=cfg.Rearth, msk=msk,
                           ocean_depth=ocean_depth, dtype=dtype)
    rows = []
    for dx in range(ndx):
        col = []
        for dy in range(ndy):
            col.append(_slice_tile_grid(
                gg, dx * nxl - H, dy * nyl - H, nxl + 2 * H, nyl + 2 * H,
                periodic=periodic, folded_north=folded_north,
                own_hx=H, own_hy=H, dtype=dtype))
        rows.append(_stack(col))
    grids = _stack(rows)
    grids = jax.device_put(grids, jax.NamedSharding(mesh, P(AXIS, AXIS_Y)))
    return ShardedWorld2D(
        mesh=mesh, grids=grids, cfg=cfg, nxl=nxl, nyl=nyl, halo=H,
        folded_north=folded_north,
        fold_lon_sum=2. * lon0 + nx * dlon,
        fold_lat_sum=2. * (lat0 + ny * dlat))


def shard_state_2d(world: ShardedWorld2D, st_global: BergState,
                   local_capacity: int) -> BergState:
    """Distribute bergs to owning 2-D tiles (host-side)."""
    # preserve bonds across redistribution: stamp partner ids now; slots
    # are re-matched by id after the first halo exchange
    if world.cfg.iceberg_bonds_on:
        from ..ops.forces import stamp_bond_ids
        st_global = stamp_bond_ids(st_global)
    ndx, ndy = world.mesh.devices.shape
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    g00 = jax.tree.map(lambda x: x[0, 0], world.grids)
    lon0 = float(np.asarray(g00.lon0)) + H * float(np.asarray(g00.dlon))
    lat0 = float(np.asarray(g00.lat0)) + H * float(np.asarray(g00.dlat))
    dlon = float(np.asarray(g00.dlon))
    dlat = float(np.asarray(g00.dlat))

    lon = np.asarray(st_global.lon)
    lat = np.asarray(st_global.lat)
    alive = np.asarray(st_global.alive)
    ox = np.clip(np.floor((lon - lon0) / (dlon * nxl)).astype(int), 0,
                 ndx - 1)
    oy = np.clip(np.floor((lat - lat0) / (dlat * nyl)).astype(int), 0,
                 ndy - 1)

    import dataclasses
    rows = []
    for dx in range(ndx):
        col = []
        for dy in range(ndy):
            mine = alive & (ox == dx) & (oy == dy)
            idx = np.nonzero(mine)[0]
            n = len(idx)
            if n > local_capacity:
                raise ValueError("local capacity exceeded")
            sl = empty_state(local_capacity, max_bonds=st_global.max_bonds,
                             dtype=st_global.dtype)
            take = {}
            for f in dataclasses.fields(st_global):
                src = np.asarray(getattr(st_global, f.name))
                dst = np.asarray(getattr(sl, f.name)).copy()
                dst[:n] = src[idx]
                take[f.name] = jnp.asarray(dst)
            take["alive"] = jnp.asarray(np.arange(local_capacity) < n)
            take["bond_idx"] = jnp.asarray(
                np.full((local_capacity, st_global.max_bonds), -1, np.int32))
            sl = BergState(**take)
            # localize cell indices to this tile's grid (the reference
            # re-runs find_cell on unpack, icebergs_framework.F90:3456)
            g = jax.tree.map(lambda x: x[dx, dy], world.grids)
            col.append(relocalize(sl, g, world.cfg))
        rows.append(_stack(col))
    stacked = _stack(rows)
    return jax.device_put(stacked, jax.NamedSharding(world.mesh,
                                                     P(AXIS, AXIS_Y)))


def make_sharded_step_2d(world: ShardedWorld2D, *, with_thermo=True,
                         exchange_width: int = 64, **step_kw):
    """Jitted 2-D sharded coupling step (x pass then y pass exchanges).

    ``step_kw`` is forwarded to :func:`icebergs_tpu.model.make_step`
    (e.g. ``neighbor_mode="sorted"`` for layout-invariant pair sums)."""
    cfg = world.cfg
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    mesh = world.mesh

    def local_fn(grids, st, frc):
        grid = jax.tree.map(lambda x: x[0, 0], grids)
        st = jax.tree.map(lambda x: x[0, 0], st)
        frc = jax.tree.map(lambda x: x[0, 0], frc)

        from ..model import make_step as _ms
        step = _ms(grid, cfg, with_thermo=with_thermo, jit=False, **step_kw)
        st, diags = step(st, frc)

        fold = ((world.fold_lon_sum, world.fold_lat_sum)
                if world.folded_north else None)
        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width, nyl=nyl,
                                          y_axis=AXIS_Y, fold_north=fold)

        owned = st.alive & (st.halo_berg < 0.5)
        nb = jnp.sum(owned.astype(jnp.int32))
        m = jnp.sum(jnp.where(owned, st.mass * st.mass_scaling, 0.))
        nbergs = jax.lax.psum(jax.lax.psum(nb, AXIS), AXIS_Y)
        total_mass = jax.lax.psum(jax.lax.psum(m, AXIS), AXIS_Y)
        return (jax.tree.map(lambda x: x[None, None], st), nbergs,
                total_mass, overflow[None, None])

    @functools.partial(jax.jit)
    def sharded_step(st, frc):
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(AXIS, AXIS_Y), P(AXIS, AXIS_Y), P(AXIS, AXIS_Y)),
            out_specs=(P(AXIS, AXIS_Y), P(), P(), P(AXIS, AXIS_Y)),
            # pallas_call lacks vma metadata; type-check only when the
            # local step is Pallas-free (see _check_vma)
            check_vma=_check_vma(world.cfg,
                                 step_kw.get("neighbor_mode")),
        )
        return fn(world.grids, st, frc)

    return sharded_step


def shard_forcing_2d(world: ShardedWorld2D, frc_global: Forcing) -> Forcing:
    """Slice a global Forcing into (ndx, ndy) tiles (+halo).

    On a folded-north world the top halo rows carry the fold image of the
    forcing, with the velocity fields negated (the 180-degree rotation of
    sum_up_spread_fields' parity handling, icebergs.F90:6112-6124, applied
    to vectors instead of 9-slot weights)."""
    ndx, ndy = world.mesh.devices.shape
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    nx, ny = nxl * ndx, nyl * ndy
    folded = world.folded_north

    def corner_slice(a, dx, dy, vec=False):
        a = np.asarray(a)
        ix = np.arange(dx * nxl - H, (dx + 1) * nxl + H + 1)
        iy = np.arange(dy * nyl - H, (dy + 1) * nyl + H + 1)
        ixc = np.clip(ix, 0, nx)
        out = a[np.ix_(ixc, np.clip(iy, 0, ny))].copy()
        if folded:
            # corner (i, ny+k) is the image of (nx-i, ny-k)
            for k in np.nonzero(iy > ny)[0]:
                iyf = 2 * ny - iy[k]
                if 0 <= iyf <= ny:
                    out[:, k] = a[nx - ixc, iyf]
                    if vec:
                        out[:, k] = -out[:, k]
        return out

    def center_slice(a, dx, dy):
        a = np.asarray(a)   # halo-padded global (nx+2, ny+2)
        px = np.clip(np.arange(dx * nxl - H, (dx + 1) * nxl + 2 + H), 0,
                     nx + 1)
        py_raw = np.arange(dy * nyl - H, (dy + 1) * nyl + 2 + H)
        out = a[np.ix_(px, np.clip(py_raw, 0, ny + 1))].copy()
        if folded:
            # padded center p=c+1: cell (i, ny+k) images (nx-1-i, ny-1-k)
            for k in np.nonzero(py_raw >= ny + 1)[0]:
                pyf = 2 * ny + 1 - py_raw[k]
                if 1 <= pyf <= ny:
                    out[:, k] = a[np.clip(nx + 1 - px, 0, nx + 1), pyf]
        return out

    rows = []
    for dx in range(ndx):
        col = []
        for dy in range(ndy):
            col.append(Forcing(
                uo=jnp.asarray(corner_slice(frc_global.uo, dx, dy, True)),
                vo=jnp.asarray(corner_slice(frc_global.vo, dx, dy, True)),
                ui=jnp.asarray(corner_slice(frc_global.ui, dx, dy, True)),
                vi=jnp.asarray(corner_slice(frc_global.vi, dx, dy, True)),
                ua=jnp.asarray(corner_slice(frc_global.ua, dx, dy, True)),
                va=jnp.asarray(corner_slice(frc_global.va, dx, dy, True)),
                ssh=jnp.asarray(center_slice(frc_global.ssh, dx, dy)),
                sst=jnp.asarray(center_slice(frc_global.sst, dx, dy)),
                sss=jnp.asarray(center_slice(frc_global.sss, dx, dy)),
                cn=jnp.asarray(center_slice(frc_global.cn, dx, dy)),
                hi=jnp.asarray(center_slice(frc_global.hi, dx, dy))))
        rows.append(_stack(col))
    stacked = _stack(rows)
    return jax.device_put(stacked, jax.NamedSharding(world.mesh,
                                                     P(AXIS, AXIS_Y)))


def shard_calving_field(world, field) -> jnp.ndarray:
    """Slice a global (nx+2, ny+2) calving/hflx field into per-tile slabs
    with the NON-OWNED halo ring zeroed, so each global cell's bucket
    accumulates on exactly one device (the reference accumulates only on
    the compute domain, icebergs.F90:5389-5402).  Accepts 1-D or 2-D
    worlds."""
    a = np.asarray(field)
    if isinstance(world, ShardedWorld2D):
        ndx, ndy = world.mesh.devices.shape
        nxl, nyl, H = world.nxl, world.nyl, world.halo
        rows = []
        for dx in range(ndx):
            col = []
            for dy in range(ndy):
                ix = np.clip(np.arange(dx * nxl - H,
                                       (dx + 1) * nxl + 2 + H), 0,
                             nxl * ndx + 1)
                iy = np.clip(np.arange(dy * nyl - H,
                                       (dy + 1) * nyl + 2 + H), 0,
                             nyl * ndy + 1)
                t = a[np.ix_(ix, iy)].copy()
                t[:1 + H, :] = 0.0
                t[1 + H + nxl:, :] = 0.0
                t[:, :1 + H] = 0.0
                t[:, 1 + H + nyl:] = 0.0
                col.append(jnp.asarray(t))
            rows.append(jnp.stack(col))
        return jax.device_put(jnp.stack(rows),
                              jax.NamedSharding(world.mesh,
                                                P(AXIS, AXIS_Y)))
    ndev = world.mesh.devices.size
    nxl, H = world.nxl, world.halo
    tiles = []
    for d in range(ndev):
        idx = np.clip(np.arange(d * nxl - H, (d + 1) * nxl + 2 + H), 0,
                      nxl * ndev + 1)
        t = a[idx].copy()
        t[:1 + H] = 0.0
        t[1 + H + nxl:] = 0.0
        tiles.append(jnp.asarray(t))
    return jax.device_put(jnp.stack(tiles),
                          jax.NamedSharding(world.mesh, P(AXIS)))


def init_sharded_model_state(world, st_s, *, seed: int = 0,
                             year: int = 0, yearday: float = 0.):
    """Stacked per-tile ModelState (calving buckets on tile grids, the
    SAME PRNG key on every tile — per-berg randomness is id-derived, so
    identical keys keep stochastic spawning layout-invariant).  Accepts
    1-D or 2-D worlds."""
    from ..api import ModelState
    from ..calving import init_calving_state
    is2d = isinstance(world, ShardedWorld2D)
    if is2d:
        lead = tuple(world.mesh.devices.shape)
        g0 = jax.tree.map(lambda x: x[0, 0], world.grids)
        sh = jax.NamedSharding(world.mesh, P(AXIS, AXIS_Y))
    else:
        lead = (world.mesh.devices.size,)
        g0 = jax.tree.map(lambda x: x[0], world.grids)
        sh = jax.NamedSharding(world.mesh, P(AXIS))
    calv0 = init_calving_state(g0, dtype=st_s.lon.dtype)

    def rep(x):
        return jnp.broadcast_to(
            x[(None,) * len(lead)], lead + x.shape)

    ms = ModelState(
        bergs=st_s,
        calving=jax.tree.map(rep, calv0),
        key=rep(jax.random.PRNGKey(seed)),
        current_year=rep(jnp.asarray(year, jnp.int32)),
        current_yearday=rep(jnp.asarray(yearday, jnp.float32)),
        spread_mass_old=rep(jnp.zeros((g0.nx + 2, g0.ny + 2),
                                      st_s.lon.dtype)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), ms)


def make_sharded_run(world, *, neighbor_mode: str = "buckets",
                     max_per_cell: int = 16, exchange_width: int = 64,
                     fused_interpret: bool = False, fused_kw: dict = None):
    """Jitted multi-device FULL coupling step: the entire icebergs_run
    sequence (calving spawn + footloose + thermo + spread,
    icebergs.F90:5389-5679) per tile, then particle exchange.  Accepts a
    1-D ``ShardedWorld`` or a 2-D ``ShardedWorld2D`` (x-then-y exchange
    passes, collectives over both mesh axes).

    Spawning inside the sharded step relies on tile grids carrying
    i_off/nxg (global ids) and own_halo_x (no spawning in the halo ring);
    footloose placement randomness is id-derived so any layout spawns the
    same children.  Returns ``run(mstate, frc, calving, calving_hflx) ->
    (mstate, outputs, nbergs, overflow)`` with outputs' gridded fields
    stacked per tile and scalar budgets psum'd.
    """
    cfg = world.cfg
    nxl, H = world.nxl, world.halo
    mesh = world.mesh
    is2d = isinstance(world, ShardedWorld2D)
    axes = (AXIS, AXIS_Y) if is2d else AXIS
    unit = (lambda x: x[0, 0]) if is2d else (lambda x: x[0])
    wrap = (lambda x: x[None, None]) if is2d else (lambda x: x[None])
    spec = P(AXIS, AXIS_Y) if is2d else P(AXIS)
    ex_kw = {}
    if is2d:
        fold = ((world.fold_lon_sum, world.fold_lat_sum)
                if world.folded_north else None)
        ex_kw = dict(nyl=world.nyl, y_axis=AXIS_Y, fold_north=fold)

    def local_fn(grids, mstate, frc, calving, calving_hflx):
        grid = jax.tree.map(unit, grids)
        mstate = jax.tree.map(unit, mstate)
        frc = jax.tree.map(unit, frc)
        calving = unit(calving)
        calving_hflx = unit(calving_hflx)

        from ..api import run_coupling_sequence
        from ..ops.forces import neighbor_radius
        state2, outputs = run_coupling_sequence(
            cfg, grid, mstate, frc, calving, calving_hflx,
            nbr_radius=neighbor_radius(grid, cfg),
            max_per_cell=max_per_cell, neighbor_mode=neighbor_mode,
            fused_interpret=fused_interpret, fused_kw=fused_kw)

        st, overflow = exchange_particles(state2.bergs, grid, cfg, nxl, H,
                                          exchange_width, **ex_kw)
        state2 = state2.replace(bergs=st)

        owned = st.alive & (st.halo_berg < 0.5)
        nbergs = jax.lax.psum(jnp.sum(owned.astype(jnp.int32)), axes)
        budgets = jax.tree.map(lambda x: jax.lax.psum(x, axes),
                               outputs.budgets)
        # interval-budget scalars: per-tile sums -> global sums
        _SUM_SCALARS = (
            "spawn_overflow", "fl_spawn_overflow", "tickets",
            "nbergs_calved", "nbergs_calved_fl", "nbergs_melted",
            "nbergs_deleted_fl", "net_calving_used", "heat_used",
            "calving_to_bergs", "heat_to_bergs", "net_melt_heat",
            "net_melt_kg", "berg_melt_kg", "bergy_src_kg",
            "bergy_melt_kg", "fl_bits_melt_kg", "flb_bergy_melt_kg",
            "flb_internal_eros_kg", "fl_to_berg_kg", "flb_to_bergy_kg")
        psums = {f: jax.lax.psum(getattr(outputs, f), axes)
                 for f in _SUM_SCALARS if getattr(outputs, f) is not None}
        outputs = outputs._replace(
            budgets=budgets,
            nbergs=nbergs,
            contact_overflow=jax.lax.pmax(outputs.contact_overflow, axes),
            contact_fallback=jax.lax.pmax(outputs.contact_fallback, axes),
            **psums)
        out_stacked = jax.tree.map(
            lambda x: wrap(x) if getattr(x, "ndim", 0) >= 2 else x,
            outputs)
        return (jax.tree.map(wrap, state2), out_stacked,
                nbergs, wrap(overflow))

    @functools.partial(jax.jit)
    def run(mstate, frc, calving, calving_hflx):
        from ..api import RunOutputs
        gridded = spec
        rep = P()
        fl = rep if cfg.footloose else None
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(spec, spec, spec, spec, spec),
            out_specs=(spec, RunOutputs(
                calving=gridded, calving_hflx=gridded,
                floating_melt=gridded, berg_melt=gridded,
                spread_mass=gridded, spread_area=gridded,
                spread_uvel=gridded, spread_vvel=gridded,
                ustar_iceberg=gridded, mass_on_ocean=gridded,
                nbergs=rep, budgets=rep, contact_overflow=rep,
                contact_fallback=rep, spawn_overflow=rep,
                fl_spawn_overflow=rep,
                tickets=rep, nbergs_calved=rep, nbergs_calved_fl=fl,
                nbergs_melted=rep, nbergs_deleted_fl=fl,
                net_calving_used=rep, heat_used=rep,
                calving_to_bergs=rep, heat_to_bergs=rep,
                net_melt_heat=rep, net_melt_kg=rep, berg_melt_kg=rep,
                bergy_src_kg=rep, bergy_melt_kg=rep,
                fl_bits_melt_kg=rep, flb_bergy_melt_kg=rep,
                flb_internal_eros_kg=rep,
                fl_bits_src=(gridded if cfg.footloose else None),
                fl_to_berg_kg=fl, flb_to_bergy_kg=fl),
                rep, spec),
            # pallas_call lacks vma metadata; type-check only when the
            # local step is Pallas-free (see _check_vma)
            check_vma=_check_vma(cfg, neighbor_mode),
        )
        return fn(world.grids, mstate, frc, calving, calving_hflx)

    return run



def _check_vma(cfg, neighbor_mode):
    """shard_map type-checking is only possible when the local step
    contains no pallas_call (Pallas outputs lack vma metadata): off for
    the fused contact modes and for any cfg whose fast-lane fields put
    a Pallas kernel in the step (pack transport, pallas slot sums, the
    interp kernel)."""
    if neighbor_mode is None and cfg.interactive_icebergs_on:
        neighbor_mode = cfg.resolved_contact_mode()
    if neighbor_mode in ("fused", "fused3"):
        return False
    return not (cfg.pack_kernel or cfg.slot_sum_method == "pallas"
                or cfg.interp_mode == "kernel")


_GHOST_DYN_FIELDS = ("lon", "lat", "lon_old", "lat_old", "uvel", "vvel",
                     "uvel_old", "vvel_old", "axn_fast", "ayn_fast",
                     "bxn_fast", "byn_fast", "ang_vel", "ang_accel", "rot")


def ring_transport(rows2, name, n, hops):
    """K-hop bidirectional ring stack: (W, C) local rows -> the
    (2*min(hops, n-1)+1, W, C)-stacked rows of this device and its
    <=hops-distant ring neighbors, concatenated along axis 0 in a
    fixed source order.  Per-device traffic is O(hops * W * C),
    independent of the mesh size ``n`` — the property the scaling probe
    (tests/test_ring_scaling.py) pins against the O(n) all_gather."""
    outs = [rows2]
    k = min(hops, n - 1)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    a = b = rows2
    for _ in range(k):
        a = jax.lax.ppermute(a, name, fwd)
        outs.append(a)
    for _ in range(k):
        b = jax.lax.ppermute(b, name, bwd)
        outs.append(b)
    return jnp.concatenate(outs, axis=0)


def make_sharded_mts_step(world, *,
                          exchange_width: int = 64,
                          ghost_width: int = 128,
                          ghost_slots: int = 256,
                          pair_cap: int | None = None,
                          contact_cap: int | None = None,
                          ghost_sync: str = "ring",
                          ghost_hops: int = 2):
    """Sharded MTS/DEM step with PER-SUBSTEP ghost-state refresh.

    The replicate-then-local-compute pattern (transfer_mts_bergs) keeps
    the ``N_substeps x bonds`` inner loop communication-free but caps the
    aggregate at one device.  This step instead refreshes the dynamic
    state of conglomerate replicas INSIDE the substep scan — the
    ring-pipelined design slot of SURVEY §2.6 for aggregates larger than
    a device: membership (who ships, which replica slots receive) is
    frozen per outer step, so each substep moves only the packed
    dynamic rows plus masked row updates.

    ``ghost_sync="ring"`` (default) transports those rows by
    ``ghost_hops``-hop neighbor ppermutes along the mesh ring(s) — the
    SURVEY §2.6 boundary-slab design: per-substep traffic is
    O(hops x ghost_width), independent of the device count, and a
    conglomerate may span up to ``2*ghost_hops + 1`` tiles (replicas
    whose owner sits further away are counted in ``overflow``, never
    silently stale).  On a 2-D mesh the x-ring stack feeds the y-ring,
    so diagonal neighbors ride the corner pass-through exactly like the
    particle exchange.  ``ghost_sync="allgather"`` restores the
    O(n_devices) full-membership gather (any span; the A/B reference —
    the two are bitwise identical wherever the hop budget covers the
    span, since the ring delivers the same source rows).

    Owned elements then integrate against partner state that is one
    substep old at most — matching the single-device semantics where
    forces read the partners' start-of-substep state.

    Accepts a 1-D ``ShardedWorld`` or a 2-D ``ShardedWorld2D`` (the
    reference runs MTS on arbitrary 2-D mpp layouts); on the 2-D mesh
    the ghost collectives and budget psums ride both axes and the
    particle exchange runs its x-then-y passes.

    Returns ``step(st, frc) -> (st, nbergs, total_mass, overflow)``.
    """
    cfg = world.cfg
    nxl, H = world.nxl, world.halo
    mesh = world.mesh
    is2d = isinstance(world, ShardedWorld2D)
    axes = (AXIS, AXIS_Y) if is2d else AXIS
    unit = (lambda x: x[0, 0]) if is2d else (lambda x: x[0])
    wrap = (lambda x: x[None, None]) if is2d else (lambda x: x[None])
    spec = P(AXIS, AXIS_Y) if is2d else P(AXIS)
    ex_kw = {}
    if is2d:
        fold = ((world.fold_lon_sum, world.fold_lat_sum)
                if world.folded_north else None)
        ex_kw = dict(nyl=world.nyl, y_axis=AXIS_Y, fold_north=fold)
    # neighbor radius needs host values; world.grids is concrete here
    from ..ops.forces import neighbor_radius as _nr
    nbr_radius = _nr(jax.tree.map(unit, world.grids), cfg)

    def local_fn(grids, st, frc):
        grid = jax.tree.map(unit, grids)
        st = jax.tree.map(unit, st)
        frc = jax.tree.map(unit, frc)
        N = st.capacity

        # replicas must exist BEFORE the physics: exchange first
        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width, **ex_kw)

        # ---- frozen ghost-sync setup ---------------------------------
        has_stamp = jnp.any((st.bond_id_cnt != 0) | (st.bond_id_ij != 0),
                            axis=1)
        ship = st.alive & (st.halo_berg < 0.5) & has_stamp
        rank = jnp.cumsum(ship.astype(jnp.int32)) - 1
        granted = ship & (rank < ghost_width)
        ship_sel = jnp.zeros((ghost_width,), jnp.int32).at[
            jnp.where(granted, rank, ghost_width)].set(
            jnp.arange(N, dtype=jnp.int32), mode='drop')
        ship_valid = jnp.arange(ghost_width) < jnp.sum(
            granted.astype(jnp.int32))
        ov_ship = jnp.sum((ship & ~granted).astype(jnp.int32))

        # --- shipped-row transport: K-hop ring ppermutes (default) or
        # the all-device gather.  The ring delivers the identical source
        # rows for any conglomerate spanning <= 2*ghost_hops+1 tiles, so
        # results are bitwise equal to the all_gather there; traffic is
        # O(hops x ghost_width) per substep instead of O(n_devices).
        ndev_x = mesh.shape[AXIS]
        ndev_y = mesh.shape[AXIS_Y] if is2d else 1

        def _ring(rows2, name, n):
            return ring_transport(rows2, name, n, ghost_hops)

        def transport(rows):
            """(W, C) shipped rows -> (S, C) source-stacked rows in a
            fixed, layout-independent order."""
            if ghost_sync == "allgather":
                return jax.lax.all_gather(
                    rows, axes, axis=0, tiled=False).reshape(
                    -1, rows.shape[-1])
            out = _ring(rows, AXIS, ndev_x)
            if is2d:
                # the x-stack rides the y-ring: diagonal neighbors
                # arrive via the corner pass-through
                out = _ring(out, AXIS_Y, ndev_y)
            return out

        sid_cnt = jnp.where(ship_valid, st.id_cnt[ship_sel], 0)
        sid_ij = jnp.where(ship_valid, st.id_ij[ship_sel], 0)
        idpack = jnp.stack([sid_cnt, sid_ij,
                            ship_valid.astype(jnp.int32)], axis=-1)
        allp = transport(idpack)
        all_cnt, all_ij = allp[:, 0], allp[:, 1]
        all_valid = allp[:, 2] > 0

        rep = st.alive & (st.halo_berg >= 0.5) & has_stamp
        rrank = jnp.cumsum(rep.astype(jnp.int32)) - 1
        rgrant = rep & (rrank < ghost_slots)
        rep_sel = jnp.zeros((ghost_slots,), jnp.int32).at[
            jnp.where(rgrant, rrank, ghost_slots)].set(
            jnp.arange(N, dtype=jnp.int32), mode='drop')
        rep_valid = jnp.arange(ghost_slots) < jnp.sum(
            rgrant.astype(jnp.int32))
        ov_rep = jnp.sum((rep & ~rgrant).astype(jnp.int32))
        overflow = overflow + ov_ship + ov_rep

        rcnt = st.id_cnt[rep_sel]
        rij = st.id_ij[rep_sel]
        eq = (rcnt[:, None] == all_cnt[None, :]) \
            & (rij[:, None] == all_ij[None, :]) & all_valid[None, :]
        src = jnp.argmax(eq, axis=1).astype(jnp.int32)
        found = jnp.any(eq, axis=1) & rep_valid
        tgt_slots = jnp.where(found, rep_sel, N)     # N -> dropped
        # a replica whose owner's rows never arrived (owner beyond the
        # ring's hop budget, or ship-cap overflow) would integrate
        # against STALE partner state — counted, never silent
        overflow = overflow + jnp.sum(
            (rep_valid & ~found).astype(jnp.int32))

        F = len(_GHOST_DYN_FIELDS)

        def sync(s):
            M = jnp.stack([getattr(s, f) for f in _GHOST_DYN_FIELDS],
                          axis=-1)
            rows = M[ship_sel]                       # (ghost_width, F)
            all_rows = transport(rows)               # (S, F)
            upd = all_rows[src]                      # (ghost_slots, F)
            kw = {}
            for fi, f in enumerate(_GHOST_DYN_FIELDS):
                kw[f] = getattr(s, f).at[tgt_slots].set(
                    upd[:, fi], mode='drop')
            return s.replace(**kw)

        from ..model import interp_to_bergs
        from ..mts import evolve_icebergs_mts
        st = interp_to_bergs(st, grid, frc, cfg)
        st, _d = evolve_icebergs_mts(st, grid, frc, cfg,
                                     pair_cap=pair_cap,
                                     contact_cap=contact_cap,
                                     substep_sync=sync,
                                     ncells_radius=nbr_radius)

        owned = st.alive & (st.halo_berg < 0.5)
        nbergs = jax.lax.psum(jnp.sum(owned.astype(jnp.int32)), axes)
        total_mass = jax.lax.psum(
            jnp.sum(jnp.where(owned, st.mass * st.mass_scaling, 0.)), axes)
        return (jax.tree.map(wrap, st), nbergs, total_mass,
                wrap(overflow))

    @functools.partial(jax.jit)
    def step(st, frc):
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, P(), P(), spec))
        return fn(world.grids, st, frc)

    return step


def make_forcing_halo_update(world: ShardedWorld):
    """On-device halo refresh for time-varying forcing tiles.

    The reference calls ``mpp_update_domains`` on every forcing field
    each coupling step (icebergs.F90:5240-5351).  A coupled host model
    writes each tile's INTERIOR forcing; this jitted update fills the
    H-wide halo columns from the neighbors with two ppermutes per
    direction — no host round-trip (round-1 re-sliced globally on host).

    Corner (B-grid) leaves have x-extent nxl+2H+1, centers nxl+2H+2;
    both exchange the columns adjacent to the interior.  Non-periodic
    edge tiles keep their existing boundary values.
    """
    cfg = world.cfg
    nxl, H = world.nxl, world.halo
    mesh = world.mesh
    ndev = mesh.devices.size
    periodic = cfg.grid_is_latlon and cfg.Lx > 0.

    def local_fn(frc):
        frc = jax.tree.map(lambda x: x[0], frc)
        me = jax.lax.axis_index(AXIS)
        right = [(d, (d + 1) % ndev) for d in range(ndev)]
        left = [(d, (d - 1) % ndev) for d in range(ndev)]

        def exch(a, corner: bool):
            # index map: local k <-> global (d*nxl - H + k); corner
            # leaves share boundary corners between tiles so the halo
            # strips are H wide, center leaves carry an extra pad column
            # (H+1 wide).  Right neighbor's west halo = my
            # [nxl, nxl+w); left neighbor's east halo = my [i0, i0+w).
            if corner:
                w, i0, e0 = H, H + 1, H + nxl + 1
            else:
                w, i0, e0 = H + 1, H + 1, H + nxl + 1
            east_strip = jax.lax.slice_in_dim(a, nxl, nxl + w, axis=0)
            west_strip = jax.lax.slice_in_dim(a, i0, i0 + w, axis=0)
            from_west = jax.lax.ppermute(east_strip, AXIS, right)
            from_east = jax.lax.ppermute(west_strip, AXIS, left)

            def put(buf, strip, start, ok):
                upd = jax.lax.dynamic_update_slice_in_dim(buf, strip,
                                                          start, axis=0)
                return jnp.where(ok, upd, buf)
            a = put(a, from_west, 0, (me > 0) | periodic)
            a = put(a, from_east, e0, (me < ndev - 1) | periodic)
            return a

        out = Forcing(
            uo=exch(frc.uo, True), vo=exch(frc.vo, True),
            ui=exch(frc.ui, True), vi=exch(frc.vi, True),
            ua=exch(frc.ua, True), va=exch(frc.va, True),
            ssh=exch(frc.ssh, False), sst=exch(frc.sst, False),
            sss=exch(frc.sss, False), cn=exch(frc.cn, False),
            hi=exch(frc.hi, False))
        return jax.tree.map(lambda x: x[None], out)

    @functools.partial(jax.jit)
    def update(frc):
        fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(P(AXIS),),
                           out_specs=P(AXIS))
        return fn(frc)

    return update


def make_halo_fill(world: ShardedWorld, exchange_width: int = 64):
    """Jitted halo prefill: one particle exchange with no physics.

    ``shard_state`` distributes only owned bergs; the coupling step runs
    physics *before* its exchange, so without this the first step's pair
    forces miss cross-tile partners.  The reference fills halos during
    initialization (update_halo_icebergs called from icebergs_init,
    icebergs_framework.F90:1847-1905).
    """
    cfg = world.cfg
    nxl, H = world.nxl, world.halo
    mesh = world.mesh

    def local_fn(grids, st):
        grid = jax.tree.map(lambda x: x[0], grids)
        st = jax.tree.map(lambda x: x[0], st)
        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width)
        return jax.tree.map(lambda x: x[None], st), overflow[None]

    @functools.partial(jax.jit)
    def halo_fill(st):
        fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                           out_specs=(P(AXIS), P(AXIS)))
        return fn(world.grids, st)

    return halo_fill


def make_halo_fill_2d(world: ShardedWorld2D, exchange_width: int = 64):
    """2-D mesh twin of :func:`make_halo_fill` (x pass then y pass)."""
    cfg = world.cfg
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    mesh = world.mesh

    def local_fn(grids, st):
        grid = jax.tree.map(lambda x: x[0, 0], grids)
        st = jax.tree.map(lambda x: x[0, 0], st)
        fold = ((world.fold_lon_sum, world.fold_lat_sum)
                if world.folded_north else None)
        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width, nyl=nyl,
                                          y_axis=AXIS_Y, fold_north=fold)
        return (jax.tree.map(lambda x: x[None, None], st),
                overflow[None, None])

    @functools.partial(jax.jit)
    def halo_fill(st):
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(AXIS, AXIS_Y), P(AXIS, AXIS_Y)),
            out_specs=(P(AXIS, AXIS_Y), P(AXIS, AXIS_Y)))
        return fn(world.grids, st)

    return halo_fill


def make_sharded_step(world: ShardedWorld, *, with_thermo=True,
                      exchange_width: int = 64, **step_kw):
    """Build the jitted multi-device coupling step.

    Runs the full single-tile physics per device under shard_map, with
    particle migration/halo exchange and psum'd budget diagnostics.
    ``step_kw`` is forwarded to :func:`icebergs_tpu.model.make_step`
    (e.g. ``neighbor_mode="sorted"`` for layout-invariant pair sums).
    """
    cfg = world.cfg
    nxl, H = world.nxl, world.halo
    mesh = world.mesh

    def local_fn(grids, st, frc):
        grid = jax.tree.map(lambda x: x[0], grids)
        st = jax.tree.map(lambda x: x[0], st)
        frc = jax.tree.map(lambda x: x[0], frc)

        # physics on the local tile (single-device step)
        from ..model import make_step as _ms
        step = _ms(grid, cfg, with_thermo=with_thermo, jit=False, **step_kw)
        st, diags = step(st, frc)

        # particle migration + halo refresh
        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width)

        owned = st.alive & (st.halo_berg < 0.5)
        nbergs = jax.lax.psum(jnp.sum(owned.astype(jnp.int32)), AXIS)
        total_mass = jax.lax.psum(
            jnp.sum(jnp.where(owned, st.mass * st.mass_scaling, 0.)), AXIS)

        out = (jax.tree.map(lambda x: x[None], st), nbergs, total_mass,
               overflow[None])
        return out

    @functools.partial(jax.jit)
    def sharded_step(grids, st, frc):
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(), P(), P(AXIS)),
            # pallas_call (the fused contact search) does not annotate
            # varying-mesh-axes metadata yet; skip the vma type check
            # only when the local step is Pallas-free (see _check_vma)
            check_vma=_check_vma(world.cfg,
                                 step_kw.get("neighbor_mode")),
        )
        return fn(grids, st, frc)

    # grids enter as a jit ARGUMENT: closing over a multi-process global
    # array inside jit is rejected by jax.distributed
    return functools.partial(sharded_step, world.grids)
