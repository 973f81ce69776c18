"""Calving pipeline: coastal accumulation buckets and berg spawning.

TPU-native port of ``accumulate_calving`` (``src/icebergs.F90:6153-6224``),
``calve_icebergs`` (6225-6402) and ``get_running_mean_calving``
(5996-6045).  The reference's per-cell ``do while`` spawn loop becomes a
bounded request expansion: each (cell, class) bucket may spawn up to
``max_spawn_per_bucket`` bergs per step, and requests are packed into free
state slots with a prefix-sum allocator — all fixed shapes under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import IcebergsConfig, NCLASSES
from .grid import Grid
from .model import interp_to_bergs
from .tree import pytree_dataclass


@pytree_dataclass
class CalvingState:
    """Gridded calving bookkeeping (halo-padded center fields)."""
    stored_ice: jnp.ndarray      # (nx+2, ny+2, nclasses) kg
    stored_heat: jnp.ndarray     # (nx+2, ny+2) J
    id_counter: jnp.ndarray      # (nx+2, ny+2) int32 per-cell id counter
    rmean_calving: jnp.ndarray   # (nx+2, ny+2) running-mean calving kg/s
    rmean_calving_hflx: jnp.ndarray
    rmean_init: jnp.ndarray      # scalar bool (running means initialized)


def init_calving_state(grid: Grid, dtype=jnp.float32) -> CalvingState:
    shape = (grid.nx + 2, grid.ny + 2)
    return CalvingState(
        stored_ice=jnp.zeros(shape + (NCLASSES,), dtype),
        stored_heat=jnp.zeros(shape, dtype),
        id_counter=jnp.zeros(shape, jnp.int32),
        rmean_calving=jnp.zeros(shape, dtype),
        rmean_calving_hflx=jnp.zeros(shape, dtype),
        rmean_init=jnp.zeros((), bool))


def _class_tables(cfg: IcebergsConfig):
    """(S, N) hemisphere class tables incl. derived width/length
    (L = sqrt(A*LoW), W = sqrt(A/LoW) with A = M/(rho*T))."""
    def derive(mass, thick):
        mass = np.asarray(mass)
        thick = np.asarray(thick)
        A = mass / (cfg.rho_bergs * thick)
        L = np.sqrt(A * cfg.LoW_ratio)
        W = np.sqrt(A / cfg.LoW_ratio)
        return L, W

    s = dict(mass=np.asarray(cfg.initial_mass),
             dist=np.asarray(cfg.distribution),
             scal=np.asarray(cfg.mass_scaling),
             thick=np.asarray(cfg.initial_thickness))
    if cfg.separate_distrib_for_n_hemisphere:
        n = dict(mass=np.asarray(cfg.initial_mass_n),
                 dist=np.asarray(cfg.distribution_n),
                 scal=np.asarray(cfg.mass_scaling_n),
                 thick=np.asarray(cfg.initial_thickness_n))
    else:
        n = s
    s["L"], s["W"] = derive(s["mass"], s["thick"])
    n["L"], n["W"] = derive(n["mass"], n["thick"])
    return s, n


def get_running_mean_calving(calv: CalvingState, calving, calving_hflx,
                             cfg: IcebergsConfig):
    """Exponential smoothing of the calving field over tau_calving years
    (get_running_mean_calving, icebergs.F90:5996-6045)."""
    if cfg.tau_calving <= 0.:
        return calv, calving, calving_hflx
    tau = cfg.tau_calving * 86400. * 365.
    alpha = jnp.minimum(1.0, cfg.dt / jnp.maximum(tau, cfg.dt))
    rm_c = jnp.where(calv.rmean_init, (1. - alpha) * calv.rmean_calving
                     + alpha * calving, calving)
    rm_h = jnp.where(calv.rmean_init, (1. - alpha) * calv.rmean_calving_hflx
                     + alpha * calving_hflx, calving_hflx)
    calv = calv.replace(rmean_calving=rm_c, rmean_calving_hflx=rm_h,
                        rmean_init=jnp.ones((), bool))
    return calv, rm_c, rm_h


def accumulate_calving(calv: CalvingState, grid: Grid, calving, calving_hflx,
                       cfg: IcebergsConfig):
    """Split the calving flux into per-class buckets
    (accumulate_calving, icebergs.F90:6193-6222).

    ``calving`` is kg/s per cell (halo-padded), ``calving_hflx`` W/m2.
    Returns (calv, residual_calving, residual_hflx, used_kg, used_heat_J).
    """
    s, n = _class_tables(cfg)
    south = grid.lat_center < 0.
    dist = jnp.where(south[:, :, None],
                     jnp.asarray(s["dist"], calving.dtype),
                     jnp.asarray(n["dist"], calving.dtype))
    stored = calv.stored_ice + cfg.dt * calving[:, :, None] * dist
    rem_s = 1. - float(np.sum(s["dist"]))
    rem_n = 1. - float(np.sum(n["dist"]))
    remaining = jnp.where(south, rem_s, rem_n)

    used_kg = jnp.sum(calving * (1. - remaining)) * cfg.dt
    heat_in = cfg.dt * calving_hflx * grid.area * (1. - remaining)
    used_heat = jnp.sum(heat_in)
    calv = calv.replace(stored_ice=stored,
                        stored_heat=calv.stored_heat + heat_in)
    return (calv, calving * remaining, calving_hflx * remaining,
            used_kg, used_heat)


def calve_icebergs(st, calv: CalvingState, grid: Grid, frc,
                   cfg: IcebergsConfig, current_year=0, current_yearday=0.,
                   max_spawn_per_bucket: int = 2):
    """Spawn bergs from buckets that exceed initial_mass*mass_scaling
    (calve_icebergs, icebergs.F90:6225-6402).

    Returns (state, calv, diag dict)."""
    nx, ny = grid.nx, grid.ny
    s, n = _class_tables(cfg)
    south = grid.lat_center < 0.                    # (nx+2, ny+2)
    dtype = st.dtype

    def tab(key):
        return (jnp.where(south[:, :, None], jnp.asarray(s[key], dtype),
                          jnp.asarray(n[key], dtype)))

    im = tab("mass")        # (nx+2, ny+2, K)
    ms = tab("scal")
    th = tab("thick")
    Lt = tab("L")
    Wt = tab("W")

    stored = calv.stored_ice
    heat = calv.stored_heat
    # spawn counts per bucket, capped
    cap = im * ms
    n_want = jnp.floor(stored / jnp.maximum(cap, 1e-30)).astype(jnp.int32)
    n_want = jnp.clip(n_want, 0, max_spawn_per_bucket)
    # only interior ocean cells spawn; on a halo-extended tile the
    # non-owned ring is excluded so each global cell spawns on exactly
    # one device
    hx, hy = grid.own_halo_x, grid.own_halo_y
    interior = jnp.zeros_like(south)
    interior = interior.at[1 + hx:nx + 1 - hx, 1 + hy:ny + 1 - hy].set(True)
    n_want = jnp.where((interior & (grid.msk > 0.))[:, :, None], n_want, 0)

    # heat density per class, sequential over classes (H shrinks as classes
    # spawn; within a class h = H/I_k is invariant, see calve_icebergs heat
    # accounting)
    hdens = []
    H = heat
    for k in range(NCLASSES):
        Ik = jnp.maximum(stored[:, :, k], 1e-30)
        hk = jnp.where(stored[:, :, k] > 0., H / Ik, 0.)
        spawn_mass_k = n_want[:, :, k].astype(dtype) * cap[:, :, k]
        H = H - spawn_mass_k * hk
        hdens.append(hk)
    hdens = jnp.stack(hdens, axis=-1)

    # flatten spawn requests: (cells*K*cap_m,) in (k, j, i, m) order like the
    # reference's loop nest
    M = max_spawn_per_bucket
    ii = jnp.arange(nx)
    jj = jnp.arange(ny)
    I, J = jnp.meshgrid(ii, jj, indexing="ij")

    reqs = []
    for k in range(NCLASSES):
        for m in range(M):
            want = n_want[1:-1, 1:-1, k] > m      # (nx, ny)
            reqs.append(dict(k=k, m=m, want=want.reshape(-1)))

    want_all = jnp.stack([r["want"] for r in reqs])        # (K*M, nx*ny)
    flat_want = want_all.reshape(-1)
    # allocate free slots by prefix sum over requests
    order = jnp.cumsum(flat_want.astype(jnp.int32)) - 1     # request rank
    dead_slots = jnp.cumsum((~st.alive).astype(jnp.int32)) - 1
    # slot for request r = index of the (rank_r)-th dead slot
    slot_ids = jnp.arange(st.capacity, dtype=jnp.int32)
    slot_of_rank = jnp.zeros((st.capacity,), jnp.int32).at[
        jnp.where(~st.alive, dead_slots, st.capacity)].set(
        slot_ids, mode='drop')
    nfree = jnp.sum((~st.alive).astype(jnp.int32))
    granted = flat_want & (order < nfree)
    slots = jnp.where(granted,
                      slot_of_rank[jnp.clip(order, 0, st.capacity - 1)], -1)

    # per-request properties
    cell_i = jnp.tile(I.reshape(-1), NCLASSES * M)
    cell_j = jnp.tile(J.reshape(-1), NCLASSES * M)
    k_of = jnp.repeat(jnp.arange(NCLASSES), M * nx * ny)
    m_of = jnp.tile(jnp.repeat(jnp.arange(M), nx * ny), NCLASSES)

    Ic, Jc = cell_i + 1, cell_j + 1
    imr = im[Ic, Jc, k_of]
    msr = ms[Ic, Jc, k_of]
    thr = th[Ic, Jc, k_of]
    Lr = Lt[Ic, Jc, k_of]
    Wr = Wt[Ic, Jc, k_of]
    hdr = hdens[Ic, Jc, k_of]

    # cell-center birth position (mean of 4 corners)
    lon_b = 0.25 * (grid.lonc[cell_i, cell_j] + grid.lonc[cell_i + 1, cell_j]
                    + grid.lonc[cell_i, cell_j + 1]
                    + grid.lonc[cell_i + 1, cell_j + 1])
    lat_b = 0.25 * (grid.latc[cell_i, cell_j] + grid.latc[cell_i + 1, cell_j]
                    + grid.latc[cell_i, cell_j + 1]
                    + grid.latc[cell_i + 1, cell_j + 1])
    ddt = -cfg.dt * (2. / 17.) * m_of.astype(dtype)   # start-day stagger

    # id generation: (per-cell counter, GLOBAL i + iNg*j) packed as two
    # ints (generate_id, icebergs_framework.F90:4165-4243); on a tile the
    # global cell makes ids unique and layout-invariant across devices
    cnt0 = calv.id_counter[Ic, Jc]
    id_cnt = cnt0 + 1 + m_of * NCLASSES + k_of   # unique-ish per request
    nxg = grid.nxg if grid.nxg else nx
    gi = cell_i + (grid.i_off if grid.i_off is not None else 0)
    gj = cell_j + (grid.j_off if grid.j_off is not None else 0)
    id_ij = (gi + 1) + nxg * gj

    def place(field, values):
        # non-granted requests scatter out of bounds and are dropped
        tgt = jnp.where(granted, slots, st.capacity)
        return field.at[tgt].set(values.astype(field.dtype), mode='drop')

    # NOTE: multiple requests never map to the same slot (allocator),
    # except the masked dump writes; handled by `place`.
    zero = jnp.zeros_like(lon_b)
    updates = dict(
        lon=lon_b, lat=lat_b, lon_old=lon_b, lat_old=lat_b,
        start_lon=lon_b, start_lat=lat_b,
        uvel=zero, vvel=zero, uvel_old=zero, vvel_old=zero,
        uvel_prev=zero, vvel_prev=zero,
        axn=zero, ayn=zero, bxn=zero, byn=zero,
        axn_fast=zero, ayn_fast=zero, bxn_fast=zero, byn_fast=zero,
        ang_vel=zero, ang_accel=zero, rot=zero, n_bonds=zero,
        mass=imr, start_mass=imr, thickness=thr, width=Wr, length=Lr,
        mass_scaling=msr, mass_of_bits=zero, mass_of_fl_bits=zero,
        mass_of_fl_bergy_bits=zero, fl_k=zero, halo_berg=zero,
        static_berg=zero, heat_density=hdr,
        start_day=jnp.zeros_like(lon_b) + current_yearday + ddt / 86400.,
        sst=zero, sss=zero, cn=zero, hi=zero, od=zero,
        uo=zero, vo=zero, ui=zero, vi=zero, ua=zero, va=zero,
        ssh_x=zero, ssh_y=zero,
    )
    int_updates = dict(
        ine=cell_i.astype(jnp.int32), jne=cell_j.astype(jnp.int32),
        start_year=(jnp.zeros_like(cell_i) + current_year).astype(jnp.int32),
        id_cnt=id_cnt.astype(jnp.int32), id_ij=id_ij.astype(jnp.int32),
        conglom_id=jnp.zeros_like(cell_i, jnp.int32),
    )
    kw = {}
    for name, val in updates.items():
        kw[name] = place(getattr(st, name), val)
    for name, val in int_updates.items():
        kw[name] = place(getattr(st, name), val)
    kw["xi"] = place(st.xi, jnp.full_like(lon_b, 0.5))
    kw["yj"] = place(st.yj, jnp.full_like(lon_b, 0.5))
    # clear bond table rows of reborn slots
    tgt = jnp.where(granted, slots, st.capacity)
    reborn = jnp.zeros((st.capacity,), bool).at[tgt].set(True, mode='drop')
    kw["bond_idx"] = jnp.where(reborn[:, None], -1, st.bond_idx)
    kw["bond_broken"] = jnp.where(reborn[:, None], 0, st.bond_broken)
    alive = st.alive | reborn
    st = st.replace(alive=alive, **kw)

    # bucket bookkeeping
    spawned = n_want.astype(dtype)
    # clamp to what was actually granted (overflow accounting)
    total_want = jnp.sum(flat_want.astype(jnp.int32))
    total_granted = jnp.sum(granted.astype(jnp.int32))
    overflow = total_want - total_granted
    grant_grid = jnp.zeros((nx + 2, ny + 2, NCLASSES), dtype)
    grant_grid = grant_grid.at[Ic, Jc, k_of].add(
        jnp.where(granted, 1., 0.))
    calved_mass = grant_grid * cap
    calved_heat = jnp.sum(calved_mass * hdens, axis=-1)
    calv = calv.replace(
        stored_ice=calv.stored_ice - calved_mass,
        stored_heat=calv.stored_heat - calved_heat,
        id_counter=calv.id_counter.at[Ic, Jc].add(
            jnp.where(granted, 1, 0)))

    # interpolate environment onto newborns (old_interp_flds_order=False)
    if not cfg.old_interp_flds_order:
        st = interp_to_bergs(st, grid, frc, cfg)

    diag = dict(nbergs_calved=total_granted, spawn_overflow=overflow,
                calving_to_bergs=jnp.sum(calved_mass),
                heat_to_bergs=jnp.sum(calved_heat),
                real_calving=calved_mass / cfg.dt)
    return st, calv, diag
