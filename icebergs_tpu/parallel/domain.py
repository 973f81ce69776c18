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


class ShardedWorld(NamedTuple):
    mesh: Mesh
    grids: Grid          # stacked local grids, leaves (ndev, ...)
    cfg: IcebergsConfig
    nxl: int             # interior cells per tile (x)
    halo: int


def _stack(pytrees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pytrees)


def make_sharded_world(cfg: IcebergsConfig, mesh: Mesh, *, nx, ny, lon0,
                       lat0, dlon, dlat, msk=None, ocean_depth=None,
                       dtype=jnp.float32) -> ShardedWorld:
    """Split a uniform global grid into per-device tiles (+halo columns)."""
    ndev = mesh.devices.size
    assert nx % ndev == 0, "nx must divide the device count"
    nxl = nx // ndev
    H = max(cfg.halo, 2)

    if msk is None:
        msk = np.ones((nx, ny))
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))
    periodic = cfg.grid_is_latlon and cfg.Lx > 0.

    def slice_x(a, s, e):
        idx = np.arange(s, e)
        if periodic:
            return np.take(a, idx % nx, axis=0)
        idx = np.clip(idx, 0, nx - 1)
        out = np.take(a, idx, axis=0)
        # outside the global domain -> land
        bad = (np.arange(s, e) < 0) | (np.arange(s, e) >= nx)
        out[bad] = 0.0
        return out

    grids = []
    for d in range(ndev):
        s = d * nxl - H
        e = (d + 1) * nxl + H
        g = make_uniform_grid(
            nxl + 2 * H, ny, lon0 + s * dlon, lat0, dlon, dlat,
            grid_is_latlon=cfg.grid_is_latlon, Rearth=cfg.Rearth,
            msk=slice_x(msk, s, e), ocean_depth=slice_x(ocean_depth, s, e),
            dtype=dtype)
        grids.append(g)
    grids = _stack(grids)
    grids = jax.device_put(grids, jax.NamedSharding(mesh, P(AXIS)))
    return ShardedWorld(mesh=mesh, grids=grids, cfg=cfg, nxl=nxl, halo=H)


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
    lon0 = float(np.asarray(world.grids.lon0)[0]) + H * float(
        np.asarray(world.grids.dlon)[0])
    dlon = float(np.asarray(world.grids.dlon)[0])

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
        # local cell indices
        slabs.append(BergState(**take))
    stacked = _stack(slabs)
    stacked = jax.device_put(stacked,
                             jax.NamedSharding(world.mesh, P(AXIS)))
    # recompute local cells
    return stacked


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


def _exchange_axis(st: BergState, axis: str, idx_field: str, nl: int,
                   H: int, width: int, *, halo_too: bool = True):
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
                       nyl: int | None = None, y_axis: str | None = None):
    """Ownership migration + halo replication via ppermute.

    The SoA analog of ``send_bergs_to_other_pes`` + ``update_halo_icebergs``.
    1-D (x ring) by default; pass nyl/y_axis for a 2-D mesh (x pass then y
    pass; corners covered by the second pass).  With bonds on, whole
    conglomerates are additionally replicated to every device
    (transfer_mts_bergs' invariant, icebergs_framework.F90:2298-2313) and
    bond pointers re-matched by id.
    """
    from ..ops import forces as _forces

    if cfg.iceberg_bonds_on:
        st = _forces.stamp_bond_ids(st)

    # drop stale halo copies (update_halo_icebergs first phase)
    st = st.replace(alive=st.alive & (st.halo_berg < 0.5))

    st, ov_x = _exchange_axis(st, AXIS, "ine", nxl, H, width)
    overflow = ov_x
    if y_axis is not None:
        st, ov_y = _exchange_axis(st, y_axis, "jne", nyl, H, width)
        overflow = overflow + ov_y

    if cfg.iceberg_bonds_on:
        st, ov_b = replicate_bonded_bergs(st, width, nxl, H,
                                          nyl=nyl, y_axis=y_axis)
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


def replicate_bonded_bergs(st: BergState, width: int, nxl: int, H: int, *,
                           nyl: int | None = None,
                           y_axis: str | None = None):
    """Replicate every owned bonded berg to every device (halo copies).

    TPU-native realization of ``transfer_mts_bergs``' invariant — "each PE
    holds a complete copy of any conglomerate it overlaps" — simplified to
    full replication (conglomerates are small relative to device memory;
    the reference's direction-bitmask bookkeeping becomes one all_gather).
    Copies land with halo_berg=1 so they are dropped next exchange.
    """
    owned = st.alive & (st.halo_berg < 0.5)
    # bondedness from the id stamps: partner slots may not be connected yet
    has_stamp = jnp.any((st.bond_id_cnt != 0) | (st.bond_id_ij != 0), axis=1)
    bonded = owned & has_stamp
    # don't duplicate bergs already replicated by the strip-halo phase:
    # mark strip halo copies of bonded bergs dead first
    halo_bonded = st.alive & (st.halo_berg >= 0.5) & has_stamp
    st = st.replace(alive=st.alive & ~halo_bonded)

    buf, valid, ov1 = _pack_to(st, bonded, width)

    axes = [AXIS] + ([y_axis] if y_axis is not None else [])
    bufs = buf
    valids = valid
    my = None
    for ax in axes:
        bufs = jax.tree.map(
            lambda x: jax.lax.all_gather(x, ax, axis=0, tiled=False), bufs)
        valids = jax.lax.all_gather(valids, ax, axis=0, tiled=False)
    # flatten gathered device axes: (D..., width) -> (D*width,)
    def flat(x):
        return x.reshape((-1,) + x.shape[len(axes) + 1:])
    bufs = jax.tree.map(flat, bufs)
    valids = valids.reshape(-1)

    # skip my own contribution (my linear position in the gathered axis)
    if y_axis is not None:
        ndy = jax.lax.axis_size(y_axis)
        my_lin = jax.lax.axis_index(AXIS) * ndy + jax.lax.axis_index(y_axis)
    else:
        my_lin = jax.lax.axis_index(AXIS)
    src = jnp.arange(valids.shape[0]) // width
    valids = valids & (src != my_lin)

    overflow = ov1
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


def make_sharded_world_2d(cfg: IcebergsConfig, mesh: Mesh, *, nx, ny,
                          lon0, lat0, dlon, dlat, msk=None,
                          ocean_depth=None,
                          dtype=jnp.float32) -> ShardedWorld2D:
    """2-D tile decomposition: the full analog of mpp_define_domains'
    (layout_x, layout_y) (icebergs_framework.F90:915-925)."""
    ndx, ndy = mesh.devices.shape
    assert nx % ndx == 0 and ny % ndy == 0
    nxl, nyl = nx // ndx, ny // ndy
    H = max(cfg.halo, 2)

    if msk is None:
        msk = np.ones((nx, ny))
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))
    periodic = cfg.grid_is_latlon and cfg.Lx > 0.

    def slice_xy(a, sx, ex, sy, ey):
        ix = np.arange(sx, ex)
        iy = np.arange(sy, ey)
        if periodic:
            ix = ix % nx
        else:
            ix = np.clip(ix, 0, nx - 1)
        iy_c = np.clip(iy, 0, ny - 1)
        out = a[np.ix_(ix, iy_c)].astype(float).copy()
        badx = (np.arange(sx, ex) < 0) | (np.arange(sx, ex) >= nx)
        bady = (iy < 0) | (iy >= ny)
        if not periodic:
            out[badx, :] = 0.0
        out[:, bady] = 0.0
        return out

    rows = []
    for dx in range(ndx):
        col = []
        for dy in range(ndy):
            sx, ex = dx * nxl - H, (dx + 1) * nxl + H
            sy, ey = dy * nyl - H, (dy + 1) * nyl + H
            g = make_uniform_grid(
                nxl + 2 * H, nyl + 2 * H, lon0 + sx * dlon,
                lat0 + sy * dlat, dlon, dlat,
                grid_is_latlon=cfg.grid_is_latlon, Rearth=cfg.Rearth,
                msk=slice_xy(msk, sx, ex, sy, ey),
                ocean_depth=slice_xy(ocean_depth, sx, ex, sy, ey),
                dtype=dtype)
            col.append(g)
        rows.append(_stack(col))
    grids = _stack(rows)
    grids = jax.device_put(grids, jax.NamedSharding(mesh, P(AXIS, AXIS_Y)))
    return ShardedWorld2D(mesh=mesh, grids=grids, cfg=cfg, nxl=nxl,
                          nyl=nyl, halo=H)


def shard_state_2d(world: ShardedWorld2D, st_global: BergState,
                   local_capacity: int) -> BergState:
    """Distribute bergs to owning 2-D tiles (host-side)."""
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
            col.append(BergState(**take))
        rows.append(_stack(col))
    stacked = _stack(rows)
    return jax.device_put(stacked, jax.NamedSharding(world.mesh,
                                                     P(AXIS, AXIS_Y)))


def make_sharded_step_2d(world: ShardedWorld2D, *, with_thermo=True,
                         exchange_width: int = 64):
    """Jitted 2-D sharded coupling step (x pass then y pass exchanges)."""
    cfg = world.cfg
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    mesh = world.mesh

    def local_fn(grids, st, frc):
        grid = jax.tree.map(lambda x: x[0, 0], grids)
        st = jax.tree.map(lambda x: x[0, 0], st)
        frc = jax.tree.map(lambda x: x[0, 0], frc)

        from ..model import make_step as _ms
        step = _ms(grid, cfg, with_thermo=with_thermo, jit=False)
        st, diags = step(st, frc)

        st, overflow = exchange_particles(st, grid, cfg, nxl, H,
                                          exchange_width, nyl=nyl,
                                          y_axis=AXIS_Y)

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
        )
        return fn(world.grids, st, frc)

    return sharded_step


def shard_forcing_2d(world: ShardedWorld2D, frc_global: Forcing) -> Forcing:
    """Slice a global Forcing into (ndx, ndy) tiles (+halo)."""
    ndx, ndy = world.mesh.devices.shape
    nxl, nyl, H = world.nxl, world.nyl, world.halo
    nx, ny = nxl * ndx, nyl * ndy

    def corner_slice(a, dx, dy):
        a = np.asarray(a)
        ix = np.clip(np.arange(dx * nxl - H, (dx + 1) * nxl + H + 1), 0, nx)
        iy = np.clip(np.arange(dy * nyl - H, (dy + 1) * nyl + H + 1), 0, ny)
        return a[np.ix_(ix, iy)]

    def center_slice(a, dx, dy):
        a = np.asarray(a)
        ix = np.clip(np.arange(dx * nxl - H, (dx + 1) * nxl + 2 + H), 0,
                     nx + 1)
        iy = np.clip(np.arange(dy * nyl - H, (dy + 1) * nyl + 2 + H), 0,
                     ny + 1)
        return a[np.ix_(ix, iy)]

    rows = []
    for dx in range(ndx):
        col = []
        for dy in range(ndy):
            col.append(Forcing(
                uo=jnp.asarray(corner_slice(frc_global.uo, dx, dy)),
                vo=jnp.asarray(corner_slice(frc_global.vo, dx, dy)),
                ui=jnp.asarray(corner_slice(frc_global.ui, dx, dy)),
                vi=jnp.asarray(corner_slice(frc_global.vi, dx, dy)),
                ua=jnp.asarray(corner_slice(frc_global.ua, dx, dy)),
                va=jnp.asarray(corner_slice(frc_global.va, dx, dy)),
                ssh=jnp.asarray(center_slice(frc_global.ssh, dx, dy)),
                sst=jnp.asarray(center_slice(frc_global.sst, dx, dy)),
                sss=jnp.asarray(center_slice(frc_global.sss, dx, dy)),
                cn=jnp.asarray(center_slice(frc_global.cn, dx, dy)),
                hi=jnp.asarray(center_slice(frc_global.hi, dx, dy))))
        rows.append(_stack(col))
    stacked = _stack(rows)
    return jax.device_put(stacked, jax.NamedSharding(world.mesh,
                                                     P(AXIS, AXIS_Y)))


def make_sharded_step(world: ShardedWorld, *, with_thermo=True,
                      exchange_width: int = 64):
    """Build the jitted multi-device coupling step.

    Runs the full single-tile physics per device under shard_map, with
    particle migration/halo exchange and psum'd budget diagnostics.
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
        step = _ms(grid, cfg, with_thermo=with_thermo, jit=False)
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
    def sharded_step(st, frc):
        fn = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(), P(), P(AXIS)),
        )
        return fn(world.grids, st, frc)

    return sharded_step
