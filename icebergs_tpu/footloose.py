"""Footloose calving (Huth et al 2022a JAMES): parents shed child bergs
when the accumulated underwater "foot" breaks off.

TPU-native port of ``footloose_calving`` (``src/icebergs.F90:2501-2763``),
``calve_fl_icebergs`` (6404-6574), ``delete_fully_fl_calved_edge_elements``
(2737-2763) and ``adjust_fl_berg_interactivity`` (2765-2843).

Each eligible parent spawns at most ONE child per step representing ``k``
bergs via mass_scaling (exactly the reference's behavior), so the request
vector has fixed shape and packs into free slots with the prefix-sum
allocator.  fl_k encodes the footloose state machine: >=0 accumulated foot
area, -1 newborn child (no interactions), -2 interactive child, -3 marked
for deletion.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import constants as C
from .config import IcebergsConfig
from .grid import Grid, convert_from_meters_to_grid, pos_to_cell
from .ops.thermo import rolling, fl_bits_dimensions
from .state import allocate_slots


class FootlooseDiags(NamedTuple):
    nbergs_calved_fl: jnp.ndarray
    fl_bits_src: jnp.ndarray       # (nx+2, ny+2) kg/m2/s
    spawn_overflow: jnp.ndarray
    # cross-category promotion flows (kg this step, scaled): fl_bits
    # promoted into a tracked berg, and the proportional fl-bergy-bits
    # transferred to the new berg's bergy-bits pool — the budget tables
    # (diag.report_full_budget) need both to close per category
    fl_to_berg_kg: jnp.ndarray = None
    flb_to_bergy_kg: jnp.ndarray = None


def _constants(cfg: IcebergsConfig):
    e1 = math.exp(0.25 * math.pi)
    drho = C.RHO_SEAWATER - cfg.rho_bergs
    sigmay = cfg.fl_strength * 1000.
    lfootparam = e1 * C.RHO_SEAWATER * sigmay / (
        6. * cfg.rho_bergs * C.GRAVITY * drho)
    l_c = math.pi / (2. * math.sqrt(2.))
    lw_c = 1. / (C.GRAVITY * C.RHO_SEAWATER)
    B_c = cfg.fl_youngs / (12. * (1. - 0.3 ** 2))
    return lfootparam, l_c, lw_c, B_c


def footloose_calving(st, grid: Grid, cfg: IcebergsConfig, key,
                      current_year=0, current_yearday=0.):
    """Part 1 of the footloose mechanism: compute k, shrink parents, and
    spawn children (or bin mass into fl_bits)."""
    if not cfg.footloose:
        z = jnp.zeros((grid.nx + 2, grid.ny + 2), st.dtype)
        return st, FootlooseDiags(jnp.zeros((), jnp.int32), z,
                                  jnp.zeros((), jnp.int32))

    lfootparam, l_c, lw_c, B_c = _constants(cfg)
    dtype = st.dtype

    T, W, L = st.thickness, st.width, st.length
    eligible = st.alive & (st.static_berg != 1.) & (st.fl_k >= 0.)
    if cfg.iceberg_bonds_on:
        # bonded footloose not supported by the reference either
        # (icebergs.F90:2566 FATAL); restrict to unbonded bergs
        eligible = eligible & (st.n_bonds == 0.)

    l_w = (lw_c * B_c * T ** 3) ** 0.25     # buoyancy length
    l_b = l_c * l_w                          # child berg width
    l_b3 = 3. * l_b

    # max k: parent must stay bigger than its (Lmin, Wmin) residue
    lb3s = jnp.maximum(l_b3, 1e-30)
    cL = jnp.ceil((L - l_b3) / lb3s)
    Lmin = L - cL * l_b3
    cW = jnp.ceil((W - l_b3) / lb3s)
    Wmin = W - cW * l_b3
    max_k = jnp.maximum(jnp.floor((L * W - Lmin * Wmin)
                                  / jnp.maximum(l_b3 * l_b, 1e-30)), 0.)

    foot_l = lfootparam * T / jnp.maximum(l_w, 1e-30)
    foot_area = jnp.maximum(foot_l * l_b3, 1e-30)
    k = jnp.floor(st.fl_k / foot_area)
    k = jnp.minimum(k, max_k)
    k = jnp.where(eligible & (max_k > 0.), k, 0.)
    fl_k = jnp.where(k > 0., st.fl_k - k * foot_area, st.fl_k)

    # parent shrink (scale by perimeter when cW>0; else length only)
    LpW = L + W
    disc = jnp.maximum(LpW ** 2 - 4. * (l_b3 * l_b * k), 0.)
    ds_perim = 0.5 * (LpW - jnp.sqrt(disc))
    Ln_p = L - ds_perim
    Wn_p = W - ds_perim
    fix = Wn_p < Wmin
    Ln_p = jnp.where(fix, Ln_p * (1. - (Wmin - Wn_p)
                                  / jnp.maximum(Wmin, 1e-30)), Ln_p)
    Wn_p = jnp.where(fix, Wmin, Wn_p)
    ds_len = k * 3. * l_b ** 2 / jnp.maximum(W, 1e-30)
    Ln = jnp.where(cW > 0., Ln_p, L - ds_len)
    Wn = jnp.where(cW > 0., Wn_p, W)
    dA = L * W - Ln * Wn

    calved = k > 0.
    dead = calved & ((Ln <= 0.) | (Wn <= 0.))
    fl_k = jnp.where(dead, -3., fl_k)

    # update parents (with rolling)
    Tr, Wr, Lr = rolling(cfg, T, Wn, Ln)
    if not cfg.allow_bergs_to_roll:
        Tr, Wr, Lr = T, Wn, Ln
    upd = calved & ~dead
    st = st.replace(
        thickness=jnp.where(upd, Tr, st.thickness),
        width=jnp.where(upd, Wr, st.width),
        length=jnp.where(upd, Lr, st.length),
        mass=jnp.where(upd, Lr * Wr * Tr * cfg.rho_bergs, st.mass),
        fl_k=jnp.where(st.alive, fl_k, st.fl_k))

    shape = (grid.nx + 2, grid.ny + 2)
    fl_bits_src = jnp.zeros(shape, dtype)
    IJ = (st.ine + 1, st.jne + 1)
    area = jnp.maximum(grid.area[IJ], 1e-30)

    nspawned = jnp.zeros((), jnp.int32)
    overflow = jnp.zeros((), jnp.int32)
    if cfg.fl_style == 'new_bergs':
        # one child per calving parent, representing k bergs
        key, sub = jax.random.split(key)
        st, ns, ov, _, _, _ = _spawn_children(
            st, grid, cfg, sub, calved, k, l_b,
            current_year, current_yearday, berg_from_bits=False)
        nspawned = nspawned + ns
        overflow = overflow + ov
    else:
        dM = cfg.rho_bergs * T * dA
        st = st.replace(mass_of_fl_bits=jnp.where(
            upd, st.mass_of_fl_bits + dM, st.mass_of_fl_bits))
        fl_bits_src = fl_bits_src.at[IJ].add(
            jnp.where(upd, dM / (cfg.dt * area) * st.mass_scaling, 0.))

    # promote fl_bits mass to a tracked berg when above threshold
    thres = cfg.new_berg_from_fl_bits_mass_thres
    promote = st.alive & (st.mass_of_fl_bits * st.mass_scaling > thres)
    kp = jnp.floor(st.mass_of_fl_bits * st.mass_scaling / thres)
    key, sub = jax.random.split(key)
    st, ns, ov, to_berg_kg, to_bergy_kg, gp = _spawn_children(
        st, grid, cfg, sub, promote, kp, l_b, current_year,
        current_yearday, berg_from_bits=True)
    nspawned = nspawned + ns
    overflow = overflow + ov
    # only GRANTED promotions remove mass from the fl pool (a denied
    # spawn leaves the parent's fl_bits untouched; subtracting for all
    # promote rows under-reported fl_bits_src whenever slots ran out)
    fl_bits_src = fl_bits_src.at[IJ].add(
        jnp.where(gp, -kp * thres / (cfg.dt * area), 0.))

    return st, FootlooseDiags(nbergs_calved_fl=nspawned,
                              fl_bits_src=fl_bits_src,
                              spawn_overflow=overflow,
                              fl_to_berg_kg=to_berg_kg,
                              flb_to_bergy_kg=to_bergy_kg)


def _id_uniform(key, st, dtype):
    """Per-berg uniform in [0,1) derived by folding the berg id into the
    step key: independent of slot position and device layout
    (parallel_reprod for the stochastic footloose placement)."""
    def one(cnt, ij):
        return jax.random.uniform(
            jax.random.fold_in(jax.random.fold_in(key, cnt), ij), (),
            jnp.float32)
    return jax.vmap(one)(st.id_cnt, st.id_ij).astype(dtype)


def _spawn_children(st, grid: Grid, cfg: IcebergsConfig, key, want, k, l_b,
                    current_year, current_yearday, *, berg_from_bits):
    """Create child bergs in free slots (calve_fl_icebergs)."""
    dtype = st.dtype
    capacity = st.capacity
    # halo replicas never spawn: the owner device spawns the child
    # (duplicate suppression, like the reference's PE-ownership check)
    want = want & (st.halo_berg < 0.5)
    granted, slots = allocate_slots(st.alive, want)
    pidx = jnp.arange(capacity)

    # random displacement along one of the parent's sides, id-derived
    rn = _id_uniform(key, st, dtype)
    if not cfg.displace_fl_bergs:
        disp_x = jnp.zeros_like(rn)
        disp_y = jnp.zeros_like(rn)
    else:
        Lp, Wp = st.length, st.width
        side = jnp.floor(rn * 4.).astype(jnp.int32)
        t = rn * 4. - side.astype(dtype)
        disp_x = jnp.where(side == 0, Lp * (t - 0.5),
                  jnp.where(side == 1, 0.5 * Lp,
                   jnp.where(side == 2, Lp * (t - 0.5), -0.5 * Lp)))
        disp_y = jnp.where(side == 0, 0.5 * Wp,
                  jnp.where(side == 1, Wp * (t - 0.5),
                   jnp.where(side == 2, -0.5 * Wp, 0.5 * Wp * (t - 0.5))))
        dxdl, dydl = convert_from_meters_to_grid(st.lat, cfg.grid_is_latlon,
                                                 cfg.Rearth)
        disp_x = disp_x * dxdl
        disp_y = disp_y * dydl

    lon_c = st.lon + disp_x
    lat_c = st.lat + disp_y
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    ci, cj, cxi, cyj = pos_to_cell(grid, lon_c, lat_c, Lx)
    # if the displaced position lands in a dead (area=0) cell, fall back to
    # the parent position (calve_fl_icebergs correction logic)
    bad = grid.area[ci + 1, cj + 1] <= 0.
    lon_c = jnp.where(bad, st.lon, lon_c)
    lat_c = jnp.where(bad, st.lat, lat_c)
    ci = jnp.where(bad, st.ine, ci)
    cj = jnp.where(bad, st.jne, cj)
    cxi = jnp.where(bad, st.xi, cxi)
    cyj = jnp.where(bad, st.yj, cyj)
    disp_x = jnp.where(bad, 0., disp_x)
    disp_y = jnp.where(bad, 0., disp_y)

    if berg_from_bits:
        Lfl, Wfl, Tfl = fl_bits_dimensions(cfg, st.thickness)
        c_len, c_wid, c_thk = Lfl, Wfl, Tfl
        c_mass = Tfl * Lfl * Wfl * cfg.rho_bergs
        c_scal = k * cfg.new_berg_from_fl_bits_mass_thres \
            / jnp.maximum(c_mass, 1e-30)
        pct = (c_mass * c_scal) / jnp.maximum(
            st.mass_of_fl_bits * st.mass_scaling, 1e-30)
        c_bits = (pct * st.mass_of_fl_bergy_bits * st.mass_scaling) \
            / jnp.maximum(c_scal, 1e-30)
        gp = granted_to_parent(granted, want)
        to_berg_kg = jnp.sum(jnp.where(
            gp, k * cfg.new_berg_from_fl_bits_mass_thres, 0.))
        to_bergy_kg = jnp.sum(jnp.where(
            gp, pct * st.mass_of_fl_bergy_bits * st.mass_scaling, 0.))
        # parent bookkeeping
        st = st.replace(
            mass_of_fl_bergy_bits=jnp.where(
                granted_to_parent(granted, want),
                (1. - pct) * st.mass_of_fl_bergy_bits,
                st.mass_of_fl_bergy_bits),
            mass_of_fl_bits=jnp.where(
                granted_to_parent(granted, want),
                st.mass_of_fl_bits - k * cfg.new_berg_from_fl_bits_mass_thres
                / jnp.maximum(st.mass_scaling, 1e-30),
                st.mass_of_fl_bits))
    else:
        c_len = l_b * 3.
        c_wid = l_b
        c_thk = st.thickness
        c_mass = c_wid * c_len * c_thk * cfg.rho_bergs
        c_scal = st.mass_scaling * k
        c_bits = jnp.zeros_like(c_mass)

    zero = jnp.zeros_like(lon_c)

    def place(field, values):
        tgt = jnp.where(granted, slots, capacity)
        return field.at[tgt].set(values.astype(field.dtype), mode='drop')

    updates = dict(
        lon=lon_c, lat=lat_c, start_lon=lon_c, start_lat=lat_c,
        lon_old=st.lon_old + disp_x, lat_old=st.lat_old + disp_y,
        xi=cxi, yj=cyj,
        length=c_len, width=c_wid, thickness=c_thk, mass=c_mass,
        mass_scaling=c_scal, mass_of_bits=c_bits,
        mass_of_fl_bits=zero, mass_of_fl_bergy_bits=zero,
        fl_k=zero - 1.0, halo_berg=zero,
        start_day=jnp.zeros_like(lon_c) + current_yearday,
        start_mass=st.start_mass,
        uvel=st.uvel, vvel=st.vvel, axn=st.axn, ayn=st.ayn,
        bxn=st.bxn, byn=st.byn, uvel_prev=st.uvel_prev,
        vvel_prev=st.vvel_prev, uvel_old=st.uvel_old, vvel_old=st.vvel_old,
        heat_density=st.heat_density, static_berg=st.static_berg,
        uo=st.uo, vo=st.vo, ui=st.ui, vi=st.vi, ua=st.ua, va=st.va,
        ssh_x=st.ssh_x, ssh_y=st.ssh_y, sst=st.sst, sss=st.sss,
        cn=st.cn, hi=st.hi, od=st.od,
        axn_fast=st.axn_fast, ayn_fast=st.ayn_fast,
        bxn_fast=st.bxn_fast, byn_fast=st.byn_fast,
        ang_vel=zero, ang_accel=zero, rot=zero, n_bonds=zero,
        fl_spawn_count=zero,
    )
    # unique, layout-invariant child ids: the parent's id offset by its
    # running child count (the reference regenerates ids via generate_id;
    # the offset scheme keeps the parent traceable from the child id)
    child_no = 1. + st.fl_spawn_count
    int_updates = dict(
        ine=ci, jne=cj,
        start_year=(jnp.zeros_like(ci) + current_year).astype(jnp.int32),
        id_cnt=st.id_cnt + (100000. * child_no).astype(jnp.int32),
        id_ij=st.id_ij,
        conglom_id=st.conglom_id,
    )
    kw = {}
    for name, val in updates.items():
        kw[name] = place(getattr(st, name), val)
    for name, val in int_updates.items():
        kw[name] = place(getattr(st, name), val)
    tgt = jnp.where(granted, slots, capacity)
    reborn = jnp.zeros((capacity,), bool).at[tgt].set(True, mode='drop')
    kw["bond_idx"] = jnp.where(reborn[:, None], -1, st.bond_idx)
    kw["bond_broken"] = jnp.where(reborn[:, None], 0, st.bond_broken)
    # bump the parents' child counters (after child rows were placed)
    kw["fl_spawn_count"] = kw["fl_spawn_count"] + jnp.where(
        granted_to_parent(granted, want) & ~reborn, 1., 0.)
    st = st.replace(alive=st.alive | reborn, **kw)
    nspawned = jnp.sum(granted.astype(jnp.int32))
    overflow = jnp.sum((want & ~granted).astype(jnp.int32))
    if not berg_from_bits:
        to_berg_kg = to_bergy_kg = jnp.zeros((), st.lon.dtype)
    return (st, nspawned, overflow, to_berg_kg, to_bergy_kg,
            granted_to_parent(granted, want))


def granted_to_parent(granted, want):
    """Parents whose spawn request was granted (same indexing)."""
    return granted & want


def delete_fully_fl_calved(st):
    """Remove bergs marked fl_k == -3 (edge elements fully calved)."""
    kill = st.alive & (st.fl_k == -3.)
    return st.replace(alive=st.alive & ~kill), jnp.sum(kill.astype(jnp.int32))


def adjust_fl_berg_interactivity(st, nbr, cfg: IcebergsConfig):
    """Promote fl_k==-1 children to fl_k=-2 once out of contact range of
    every other berg (adjust_fl_berg_interactivity, icebergs.F90:2765)."""
    other = nbr.cand_idx
    if cfg.hexagonal_icebergs:
        rdenom = 1. / (2. * math.sqrt(3.))
    elif cfg.iceberg_bonds_on:
        rdenom = 0.25
    else:
        rdenom = 1. / C.PI
    R1 = jnp.sqrt(st.length * st.width * rdenom)[:, None]
    R2 = jnp.sqrt(st.length[other] * st.width[other] * rdenom)
    crit = jnp.maximum(R1 + R2, cfg.contact_distance) ** 2

    from .grid import convert_from_grid_to_meters
    lat_ref = 0.5 * (st.lat[:, None] + st.lat[other])
    dx_dlon, dy_dlat = convert_from_grid_to_meters(
        lat_ref, cfg.grid_is_latlon, cfg.Rearth)
    rx = (st.lon[other] - st.lon[:, None]) * dx_dlon
    ry = (st.lat[other] - st.lat[:, None]) * dy_dlat
    r2 = rx ** 2 + ry ** 2
    contact = jnp.any(nbr.cand_valid & (r2 < crit), axis=1)
    promote = st.alive & (st.fl_k == -1.) & ~contact
    return st.replace(fl_k=jnp.where(promote, -2., st.fl_k))
