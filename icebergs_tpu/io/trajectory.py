"""Lagrangian trajectory recording and NetCDF output.

TPU-native equivalent of the xyt linked lists + trajectory writer
(``record_posn``/``move_trajectory``, icebergs_framework.F90:5328-5709;
``write_trajectory``, icebergs_fms2io.F90:1631-2104).

On-device: a preallocated ring buffer of snapshots filled by a masked
scatter each sampling step (no host sync).  On flush, the buffer drains to
an append-mode ``iceberg_trajectories.nc`` with the reference's variable
schema (short / footloose / full).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy.io import netcdf_file

from ..config import IcebergsConfig
from ..state import pack_id

SHORT_VARS = ("lon", "lat", "year", "day", "id_cnt", "id_ij")
FL_EXTRA = ("uvel", "vvel", "mass", "mass_scaling", "mass_of_bits",
            "mass_of_fl_bits", "mass_of_fl_bergy_bits", "fl_k",
            "thickness", "width", "length", "n_bonds")
FULL_EXTRA = ("uvel", "vvel", "uo", "vo", "ui", "vi", "ua", "va",
              "ssh_x", "ssh_y", "sst", "sss", "cn", "hi",
              "mass", "thickness", "width", "length", "mass_scaling",
              "mass_of_bits", "heat_density")


class TrajBuffer(NamedTuple):
    data: dict          # name -> (nsamples, capacity) arrays
    valid: jnp.ndarray  # (nsamples, capacity) bool
    cursor: jnp.ndarray  # scalar int: next sample row


def traj_fields(cfg: IcebergsConfig):
    if cfg.save_short_traj:
        extra = ()
    elif cfg.save_fl_traj:
        extra = FL_EXTRA
    else:
        extra = FULL_EXTRA
    return ("lon", "lat", "day") + tuple(e for e in extra)


def init_traj_buffer(capacity: int, nsamples: int, cfg: IcebergsConfig,
                     dtype=jnp.float32) -> TrajBuffer:
    names = traj_fields(cfg) + ("id_cnt", "id_ij", "year")
    data = {}
    for n in names:
        kind = jnp.int32 if n in ("id_cnt", "id_ij", "year") else dtype
        data[n] = jnp.zeros((nsamples, capacity), kind)
    return TrajBuffer(data=data, valid=jnp.zeros((nsamples, capacity), bool),
                      cursor=jnp.zeros((), jnp.int32))


def grow_traj_buffer(buf: TrajBuffer, new_width: int) -> TrajBuffer:
    """Pad the per-slot (trailing) axis to ``new_width``.

    The driver's increase_ibuffer analog: when the slot pool grows
    mid-run (state.grow_capacity), the ring buffers grow with it.
    Recorded samples keep their rows; new slots append at the end (for
    the bond buffer, slot-major record packing means appended records
    are exactly the new slots' bonds)."""
    old = buf.valid.shape[-1]
    if new_width <= old:
        return buf
    pad = ((0, 0), (0, new_width - old))
    return TrajBuffer(
        data={n: jnp.pad(a, pad) for n, a in buf.data.items()},
        valid=jnp.pad(buf.valid, pad), cursor=buf.cursor)


def record_posn(buf: TrajBuffer, st, cfg: IcebergsConfig, day, year,
                sample_mask=None) -> TrajBuffer:
    """Append one snapshot row for eligible bergs (record_posn).

    Eligibility mirrors icebergs_framework.F90:5370-5388: save when
    ``current_year > save_all_traj_year`` OR the class filter
    (save_nonfl_traj_by_class + hemisphere start-mass thresholds) OR
    ``berg_area >= traj_area_thres`` OR the berg has any bond OR it is a
    footloose child above traj_area_thres_fl.  Areas use the reference's
    mass/(rho_bergs*thickness) definition; thresholds are km^2 in the
    namelist, m^2 here (framework:5362-5364).
    """
    thick_safe = jnp.maximum(st.thickness, 1e-30)
    berg_area = st.mass / (cfg.rho_bergs * thick_safe)       # m^2
    alive_ok = st.alive & (st.halo_berg < 0.5)
    is_child = st.fl_k < 0.

    ok = berg_area >= cfg.traj_area_thres * 1e6
    ok = ok | (is_child & (berg_area > cfg.traj_area_thres_fl * 1e6))
    if cfg.save_nonfl_traj_by_class:
        thres = jnp.where(st.lat < 0.,
                          cfg.save_traj_by_class_start_mass_thres_s,
                          cfg.save_traj_by_class_start_mass_thres_n)
        ok = ok | (~is_child
                   & (berg_area > cfg.traj_area_thres_sntbc * 1e6)
                   & (st.start_mass >= thres))
    ok = ok | (jnp.asarray(year, st.lon.dtype) > cfg.save_all_traj_year)
    if cfg.iceberg_bonds_on:
        ok = ok | jnp.any(st.bond_idx >= 0, axis=1)
    ok = ok & alive_ok
    if sample_mask is not None:
        ok = ok & sample_mask

    row = buf.cursor % buf.valid.shape[0]
    data = dict(buf.data)
    src = dict(lon=st.lon, lat=st.lat,
               day=jnp.full_like(st.lon, day),
               id_cnt=st.id_cnt, id_ij=st.id_ij,
               year=jnp.full_like(st.id_cnt, year))
    for name in buf.data:
        if name in src:
            v = src[name]
        else:
            v = getattr(st, name)
        data[name] = buf.data[name].at[row].set(
            jnp.where(ok, v, 0).astype(buf.data[name].dtype))
    valid = buf.valid.at[row].set(ok)
    return TrajBuffer(data=data, valid=valid, cursor=buf.cursor + 1)


def init_bond_traj_buffer(capacity: int, max_bonds: int, nsamples: int,
                          dtype=jnp.float32) -> TrajBuffer:
    """Bond trajectory buffer (bond_xyt lists + save_bond_traj,
    icebergs_framework.F90:389-407; writer icebergs_fms2io.F90:2105-2332).
    One record per directed bond per sample."""
    width = capacity * max_bonds
    names = ("lon", "lat", "day", "first_id_cnt", "first_id_ij",
             "other_id_cnt", "other_id_ij", "nstress", "sstress", "broken")
    data = {}
    ints = ("first_id_cnt", "first_id_ij", "other_id_cnt", "other_id_ij",
            "broken")
    for n in names:
        kind = jnp.int32 if n in ints else dtype
        data[n] = jnp.zeros((nsamples, width), kind)
    return TrajBuffer(data=data, valid=jnp.zeros((nsamples, width), bool),
                      cursor=jnp.zeros((), jnp.int32))


def record_bonds(buf: TrajBuffer, st, cfg: IcebergsConfig, day) -> TrajBuffer:
    """Append one bond snapshot row."""
    N, B = st.bond_idx.shape
    other = jnp.maximum(st.bond_idx, 0)
    ok = (st.bond_idx >= 0) & st.alive[:, None] & (st.halo_berg < 0.5)[:, None]
    ok = ok.reshape(-1)

    row = buf.cursor % buf.valid.shape[0]

    def rep(a):
        return jnp.repeat(a[:, None], B, axis=1).reshape(-1)

    src = dict(
        lon=rep(st.lon), lat=rep(st.lat),
        day=jnp.full((N * B,), day, buf.data["day"].dtype),
        first_id_cnt=rep(st.id_cnt), first_id_ij=rep(st.id_ij),
        other_id_cnt=st.id_cnt[other].reshape(-1),
        other_id_ij=st.id_ij[other].reshape(-1),
        nstress=st.bond_nstress.reshape(-1),
        sstress=st.bond_sstress.reshape(-1),
        broken=st.bond_broken.reshape(-1))
    data = {k: buf.data[k].at[row].set(
        jnp.where(ok, v, 0).astype(buf.data[k].dtype))
        for k, v in src.items()}
    valid = buf.valid.at[row].set(ok)
    return TrajBuffer(data=data, valid=valid, cursor=buf.cursor + 1)


def write_trajectories(path: str, buf: TrajBuffer, cfg: IcebergsConfig):
    """Drain the buffer to an append-style trajectory NetCDF
    (write_trajectory, icebergs_fms2io.F90:1631-2104).  Returns the number
    of samples written and a cleared buffer."""
    valid = np.asarray(buf.valid)
    rows, cols = np.nonzero(valid)
    n = len(rows)

    old = {}
    if os.path.exists(path):
        with netcdf_file(path, "r", mmap=False) as f:
            for k, v in f.variables.items():
                old[k] = np.asarray(v[:])

    with netcdf_file(path, "w") as f:
        total = n + (len(next(iter(old.values()))) if old else 0)
        f.createDimension("i", total)
        for name, arr in buf.data.items():
            kind = "i" if arr.dtype == jnp.int32 else "d"
            v = f.createVariable(name, kind, ("i",))
            new = np.asarray(arr)[rows, cols]
            if name in old:
                new = np.concatenate([old[name], new])
            v[:] = new.astype(np.float64 if kind == "d" else np.int32)

    cleared = TrajBuffer(
        data={k: jnp.zeros_like(v) for k, v in buf.data.items()},
        valid=jnp.zeros_like(buf.valid),
        cursor=jnp.zeros((), jnp.int32))
    return n, cleared


# ---------------------------------------------------------------------------
# distributed (sharded) trajectory recording: per-device ring buffers +
# per-tile output files, the analog of the reference's io_layout tile
# writes iceberg_trajectories.nc.NNNN (icebergs_fms2io.F90:1663-1738)
# ---------------------------------------------------------------------------

def init_traj_buffer_tiled(dev_shape, capacity, nsamples, cfg):
    """A TrajBuffer with leading device axes (one ring per tile)."""
    import jax
    buf = init_traj_buffer(capacity, nsamples=nsamples, cfg=cfg)
    return jax.tree.map(
        lambda x: jnp.tile(x, tuple(dev_shape) + (1,) * x.ndim), buf)


def record_posn_tiled(buf, st, cfg: IcebergsConfig, day, year):
    """record_posn over the leading device axes of a sharded state.

    ``record_posn`` already drops halo copies (halo_berg >= 0.5), so each
    berg is recorded exactly once, by its owner tile.  day/year are traced
    so repeated samples reuse one compilation.
    """
    import jax
    nd = st.alive.ndim - 1

    def rec(b, s, d, y):
        return record_posn(b, s, cfg, day=d, year=y)

    f = rec
    for _ in range(nd):
        f = jax.vmap(f, in_axes=(0, 0, None, None))
    return jax.jit(f)(buf, st, jnp.asarray(day, jnp.float32),
                      jnp.asarray(year, jnp.int32))


def write_trajectories_tiled(path: str, buf, cfg: IcebergsConfig):
    """Drain a tiled buffer to per-tile files ``path.NNNN`` (the
    reference's io_layout suffix convention).  Returns total samples."""
    import itertools
    import jax
    nd = buf.valid.ndim - 2
    dev_shape = buf.valid.shape[:nd]
    total = 0
    cleared = []
    for k, idx in enumerate(itertools.product(*map(range, dev_shape))):
        tile = jax.tree.map(lambda x, i=idx: x[i], buf)
        n, tile = write_trajectories(f"{path}.{k:04d}", tile, cfg)
        total += n
        cleared.append(tile)
    # restack cleared tiles
    out = jax.tree.map(lambda *xs: jnp.stack(xs).reshape(
        dev_shape + xs[0].shape), *cleared)
    return total, out
