"""VMEM-resident MTS Part-3 substep loop (Pallas, TPU).

The A68/iKID production flag set (``dem`` + explicit inner substeps +
``use_broken_bonds_for_substep_contact``) makes every fast substep CLOSED
under conglomerates: bond forces (icebergs.F90:957-1242) and broken-bond
contact (806-956) both address partners through ``bond_idx``, which never
crosses a conglomerate, and drift/kick/grounding/rotation are per-element.
So if the slab layout never lets a conglomerate straddle a ``block_n``
boundary (:func:`pack_conglomerates_blocked`), the ENTIRE ``n_sub_steps``
loop runs per block with zero inter-block traffic — one Pallas kernel
holds the block state in VMEM across all substeps, and HBM sees exactly
one read + one write of the state per outer step instead of
``n_sub_steps`` full passes plus per-substep partner gathers (the
measured 101 ms/substep at 1M elements that dominates the outer step).

Partner access inside a block uses NO gathers: makeberg-style
conglomerates are lattices, so ``bond_idx - i`` takes only a few distinct
values (±1, ±row_width, ...).  :func:`analyze_bond_deltas` extracts them
host-side; the kernel materializes one cyclically shifted copy of each
kinematic field per distinct delta (``pltpu.roll`` — a pure VPU
permutation) and per-slot masks select the right one.  Invalid/pad slots
match no delta and read zeros, which the validity masks then discard
(the XLA path reads row 0 for those slots; both are masked out).

Restrictions (the caller must fall back to the lax.scan path otherwise):
  * cfg.dem and (cfg.explicit_inner_mts or cfg.dem) explicit substeps;
  * cfg.use_broken_bonds_for_substep_contact (substep contact = bond
    table only; no neighbor pair lists);
  * bond topology block-closed for the chosen ``block_n`` with at most
    ``MAX_DELTAS`` distinct index deltas (checked host-side);
  * no per-substep ring sync (conglomerates sharded across devices);
  * no tangent-plane polar drift (lat > 89 on a lat-lon grid).

Reference behavior reproduced: the substep sequence of
``icebergs_run``'s fast loop (icebergs.F90:6790-6974 explicit branch),
``calculate_force_dem`` (957-1242) incl. in-kernel per-substep stress
fracture (1140-1199), ``calculate_unbonded_same_conglom_dem_force``
(806-956) restricted to broken-bond pairs (1789-1792), short-step
grounding (6868-6893) and the grounding torque (6986-7034).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import IcebergsConfig
from .dem import dem_K_damp, _HEXDENOM

MAX_DELTAS = 8
_SENT = -(10 ** 8)


# --------------------------------------------------------------------------
# host-side layout analysis / preparation
# --------------------------------------------------------------------------

def analyze_bond_deltas(bond_idx, block_n: int,
                        max_deltas: int = MAX_DELTAS):
    """Distinct ``bond_idx - i`` values if the topology is block-closed.

    Returns a sorted tuple of deltas, or ``None`` when the layout cannot
    run the VMEM kernel (too many distinct deltas, or some bond crosses a
    ``block_n`` boundary).  Host-side: requires concrete values.
    """
    bi = np.asarray(bond_idx)
    n = bi.shape[0]
    if n % block_n or block_n % 128:
        return None
    i = np.broadcast_to(np.arange(n)[:, None], bi.shape)
    valid = bi >= 0
    if not valid.any():
        return ()
    if ((bi[valid] // block_n) != (i[valid] // block_n)).any():
        return None
    deltas = np.unique((bi - i)[valid])
    if deltas.size > max_deltas or (np.abs(deltas) >= block_n).any():
        return None
    return tuple(int(d) for d in deltas)


def pack_conglomerates_blocked(st, block_n: int = 512):
    """Relayout a state so no conglomerate straddles a block boundary.

    First-fit packs contiguous conglomerate runs (and runs of unbonded
    singles, which may split freely) into ``block_n``-element blocks,
    padding the remainder of each block with dead slots.  Returns the
    permuted state (capacity = nblocks * block_n) — a HOST-side, once at
    init operation (the slot layout is static during a run; exchanges or
    spawns that re-slot bonded bergs invalidate it).
    """
    import jax.numpy as _j

    n = st.capacity
    cong = np.asarray(st.conglom_id)
    alive = np.asarray(st.alive)
    bi = np.asarray(st.bond_idx)
    bonded = (bi >= 0).any(axis=1)

    # contiguous runs of equal conglomerate id among bonded/alive slots
    groups = []      # (start, length, splittable)
    i = 0
    while i < n:
        if not (alive[i] or bonded[i]):
            i += 1
            continue
        if bonded[i] and cong[i] != 0:
            j = i
            while j < n and cong[j] == cong[i]:
                j += 1
            groups.append((i, j - i, False))
            i = j
        else:
            groups.append((i, 1, True))
            i += 1

    blocks: list[list[int]] = [[]]
    room = block_n
    for start, length, splittable in groups:
        if length > block_n and not splittable:
            raise ValueError(
                f"conglomerate of {length} elements exceeds block_n="
                f"{block_n}")
        if length > room and not splittable:
            blocks.append([])
            room = block_n
        idx = list(range(start, start + length))
        while idx:
            take = idx if not splittable else idx[:room]
            blocks[-1].extend(take)
            idx = idx[len(take):]
            room -= len(take)
            if room == 0 and (idx or True):
                blocks.append([])
                room = block_n
    if not blocks[-1]:
        blocks.pop()

    nb = len(blocks)
    cap = nb * block_n
    perm = np.full(cap, -1, np.int64)          # new slot -> old slot
    for b, members in enumerate(blocks):
        perm[b * block_n:b * block_n + len(members)] = members
    filled = perm >= 0
    old2new = np.full(n, -1, np.int64)
    old2new[perm[filled]] = np.nonzero(filled)[0]

    def take(a):
        a = np.asarray(a)
        out = np.zeros((cap,) + a.shape[1:], a.dtype)
        out[filled] = a[perm[filled]]
        return out

    kw = {}
    for f in st.__dataclass_fields__:
        a = getattr(st, f)
        if a is None or not hasattr(a, "shape") or a.ndim == 0 \
                or a.shape[:1] != (n,):
            kw[f] = a
            continue
        kw[f] = _j.asarray(take(a))
    new_bi = take(st.bond_idx)
    new_bi[~filled] = -1          # np.zeros pad would alias slot 0
    remapped = np.where(new_bi >= 0, old2new[np.maximum(new_bi, 0)], -1)
    kw["bond_idx"] = _j.asarray(remapped.astype(np.int32))
    return type(st)(**kw)


# --------------------------------------------------------------------------
# kernel helpers
# --------------------------------------------------------------------------

def _flat_roll(x, shift: int):
    """out.flat[i] = x.flat[(i - shift) % x.size] for an (R, 128) tile."""
    R = x.shape[0]
    shift %= R * 128
    q, m = divmod(shift, 128)
    y = pltpu.roll(x, q, 0) if q else x
    if m == 0:
        return y
    z = pltpu.roll(y, 1, 0)
    yl = pltpu.roll(y, m, 1)
    zl = pltpu.roll(z, m, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= m, yl, zl)


def _roll_all(x, deltas):
    """One shifted copy of ``x`` per distinct delta (partner = i + d)."""
    return [_flat_roll(x, -d) for d in deltas]


def _partner(slot_masks_b, rolled):
    """Select this slot's partner values from the rolled copies."""
    acc = slot_masks_b[0] * rolled[0]
    for m, r in zip(slot_masks_b[1:], rolled[1:]):
        acc = acc + m * r
    return acc


class _Flags(NamedTuple):
    latlon: bool
    const_lw: bool
    hex: bool
    bonds_on: bool
    break_sub: bool
    short_ground: bool
    ground_torque: bool
    orig_moi: bool
    ignore_tang: bool
    crit_damp: bool
    tang_crit: bool
    pmag: bool


def _flags(cfg: IcebergsConfig) -> _Flags:
    return _Flags(
        latlon=bool(cfg.grid_is_latlon),
        const_lw=bool(cfg.constant_interaction_LW),
        hex=bool(cfg.hexagonal_icebergs),
        bonds_on=bool(cfg.iceberg_bonds_on),
        break_sub=bool(cfg.break_bonds_on_sub_steps),
        short_ground=bool(cfg.short_step_mts_grounding),
        ground_torque=bool(cfg.use_grounding_torque),
        orig_moi=bool(cfg.orig_dem_moment_of_inertia),
        ignore_tang=bool(cfg.ignore_tangential_force),
        crit_damp=bool(cfg.critical_interaction_damping_on),
        tang_crit=bool(cfg.tang_crit_int_damp_on),
        pmag=bool(cfg.scale_damping_by_pmag),
    )


def _metric(lat_ref, fl: _Flags, Rearth):
    if fl.latlon:
        dx = C.PI_180 * Rearth * jnp.cos(C.PI_180 * lat_ref)
        return dx, C.PI_180 * Rearth
    one = jnp.ones_like(lat_ref)
    return one, one


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _make_kernel(cfg: IcebergsConfig, deltas, n_sub: int, dtf: float,
                 nslots: int):
    fl = _flags(cfg)
    K = dem_K_damp(cfg)
    kspring = cfg.dem_spring_coef
    rho = cfg.rho_bergs
    Re = cfg.Rearth
    dtf2 = 0.5 * dtf
    tn = cfg.frac_thres_n * cfg.frac_thres_scaling
    tt = cfg.frac_thres_t * cfg.frac_thres_scaling
    cs = cfg.spring_coef
    if fl.crit_damp:
        radial_damping = 2. * math.sqrt(cs)
        tangental_damping = (2. * math.sqrt(cs)) / 4. if fl.tang_crit \
            else cfg.tangental_damping_coef
    else:
        radial_damping = cfg.radial_damping_coef
        tangental_damping = cfg.tangental_damping_coef
    if fl.const_lw:
        A0c = cfg.constant_length * cfg.constant_width
        if fl.hex:
            R0c = math.sqrt(A0c * _HEXDENOM)
        else:
            R0c = 0.5 * math.sqrt(A0c)
        if fl.hex:
            R0contact = math.sqrt(A0c * _HEXDENOM)
        elif fl.bonds_on:
            R0contact = 0.5 * math.sqrt(A0c)
        else:
            R0contact = math.sqrt(A0c / C.PI)

    def radius_bond(A):
        if fl.hex:
            return jnp.sqrt(A * _HEXDENOM)
        return 0.5 * jnp.sqrt(A)

    def radius_contact(A):
        if fl.hex:
            return jnp.sqrt(A * _HEXDENOM)
        if fl.bonds_on:
            return 0.5 * jnp.sqrt(A)
        return jnp.sqrt(A / C.PI)

    def gdrag_coeff(thick, od, mass, length, width, area_form: str):
        D = (rho / C.RHO_SEAWATER) * thick
        if cfg.h_to_init_grounding > 0.:
            gf = jnp.clip(1.0 - (od - D) / cfg.h_to_init_grounding, 0., 1.)
        else:
            gf = jnp.where(D > od, 1.0, 0.0)
        if fl.const_lw:
            MM = A0c * thick * rho
            A0 = A0c * jnp.ones_like(mass)
        else:
            MM = mass
            A0 = length * width
        if area_form == 'rect':
            AA = A0
        else:
            if fl.hex:
                R1 = jnp.sqrt(A0 * _HEXDENOM)
            elif fl.bonds_on:
                R1 = 0.5 * jnp.sqrt(A0)
            else:
                R1 = jnp.sqrt(A0 / C.PI)
            AA = C.PI * R1 ** 2
        return jnp.where(gf > 0., -cfg.cdrag_grounding * gf * AA / MM, 0.)

    def kernel(*refs):
        (mv_ref, alive_ref, thick_ref, mass_ref, od_ref, flk_ref,
         len_ref, wid_ref, delta_ref) = refs[:9]
        car_in = refs[9:9 + 15]
        bond_in = refs[9 + 15:9 + 15 + 7]
        car_out = refs[9 + 15 + 7:9 + 15 + 7 + 15]
        bond_out = refs[9 + 15 + 7 + 15:9 + 15 + 7 + 15 + 7]

        mv = mv_ref[...] > 0.5
        alive = alive_ref[...] > 0.5
        thick = thick_ref[...]
        mass = mass_ref[...]
        od = od_ref[...]
        flk = flk_ref[...]
        length = len_ref[...]
        width = wid_ref[...]

        # static per-slot topology
        dslot = [delta_ref[b] for b in range(nslots)]
        slot_masks = [[(dslot[b] == d).astype(thick.dtype)
                       for d in deltas] for b in range(nslots)]
        # a slot participates only when its delta is IN the static set;
        # a delta outside it (possible only if the layout contract was
        # violated after analyze_bond_deltas) is treated as no-bond
        # rather than reading a zeroed partner
        has = [sum(slot_masks[b][k] for k in range(len(deltas))) > 0.5
               for b in range(nslots)]

        # partner STATIC fields (constant across substeps)
        alive_r = _roll_all(alive.astype(thick.dtype), deltas)
        thick_r = _roll_all(thick, deltas)
        flk_r = _roll_all(flk, deltas)
        mass_r = _roll_all(mass, deltas)
        if not fl.const_lw:
            len_r = _roll_all(length, deltas)
            wid_r = _roll_all(width, deltas)
        alive2 = [_partner(slot_masks[b], alive_r) > 0.5
                  for b in range(nslots)]
        thick2 = [_partner(slot_masks[b], thick_r) for b in range(nslots)]
        flk2 = [_partner(slot_masks[b], flk_r) for b in range(nslots)]
        mass2 = [_partner(slot_masks[b], mass_r) for b in range(nslots)]
        if not fl.const_lw:
            len2 = [_partner(slot_masks[b], len_r) for b in range(nslots)]
            wid2 = [_partner(slot_masks[b], wid_r) for b in range(nslots)]

        vstat = [has[b] & alive & alive2[b] & (flk != -1.)
                 & (flk2[b] != -1.) for b in range(nslots)]
        cstat = [has[b] & alive & alive2[b] & (flk != -1.)
                 & (flk2[b] != -1.) for b in range(nslots)]

        # geometry invariants per slot
        if fl.const_lw:
            R1b = R0c
            R2b = [R0c] * nslots
            M1b = A0c * thick * rho
            M2b = [A0c * thick2[b] * rho for b in range(nslots)]
            Rminb = [jnp.full_like(thick, R0c) for _ in range(nslots)]
            TRminb = [thick2[b] for b in range(nslots)]
            l0b = [jnp.full_like(thick, 2. * R0c) for _ in range(nslots)]
            R1c = R0contact
            R2c = [R0contact] * nslots
            M1c = A0c * thick * rho
            M2c = [A0c * thick2[b] * rho for b in range(nslots)]
            A0self = A0c * jnp.ones_like(mass)
        else:
            A1 = length * width
            R1b = radius_bond(A1)
            M1b = mass
            R2b = [radius_bond(len2[b] * wid2[b]) for b in range(nslots)]
            M2b = [mass2[b] for b in range(nslots)]
            Rminb, TRminb, l0b = [], [], []
            for b in range(nslots):
                fs = R1b < R2b[b]
                Rminb.append(jnp.where(fs, R1b, R2b[b]))
                TRminb.append(jnp.where(fs, thick, thick2[b]))
                l0b.append(R1b + R2b[b])
            R1c = radius_contact(A1)
            R2c = [radius_contact(len2[b] * wid2[b]) for b in range(nslots)]
            M1c = mass
            M2c = [mass2[b] for b in range(nslots)]
            A0self = length * width
        if fl.hex:
            R1moi = jnp.sqrt(A0self / (2. * jnp.sqrt(
                jnp.asarray(3., thick.dtype))))
        else:
            R1moi = 0.5 * jnp.sqrt(A0self)
        Mself = (A0c * thick * rho) if fl.const_lw else mass
        dampb = [cfg.dem_damping_coef * jnp.sqrt(
            K * M1b * M2b[b] / (M1b + M2b[b])) for b in range(nslots)]

        if fl.short_ground:
            gdrag_rect = gdrag_coeff(thick, od, mass, length, width, 'rect')
        if fl.ground_torque:
            gdrag_disk = gdrag_coeff(thick, od, mass, length, width, 'disk')

        def body(_, carry):
            (lon, lat, lon_o, lat_o, u, v, u_o, v_o,
             axf, ayf, bxf, byf, angv, anga, rot,
             bbrok, blen, bt1, bt2, brr, bns, bss) = carry

            # drift (icebergs.F90:6790-6831)
            uvel2 = u + dtf2 * (axf + bxf)
            vvel2 = v + dtf2 * (ayf + byf)
            if fl.latlon:
                dxdl = 1. / (C.PI_180 * Re * jnp.cos(C.PI_180 * lat))
                dydl = 1. / (C.PI_180 * Re)
            else:
                dxdl = dydl = 1.
            lonn = lon + dtf * uvel2 * dxdl
            latn = lat + dtf * vvel2 * dydl
            lon = jnp.where(mv, lonn, lon)
            lat = jnp.where(mv, latn, lat)
            lon_o = jnp.where(mv, lonn, lon_o)
            lat_o = jnp.where(mv, latn, lat_o)
            # u_old <- u*; v-component uses bxf (bug-compat, 6826-6827)
            u_o = jnp.where(mv, u + dtf2 * (axf + bxf), u_o)
            v_o = jnp.where(mv, v + dtf2 * (ayf + bxf), v_o)

            axn_in = axf + bxf
            ayn_in = ayf + byf
            uvel3 = u + dtf2 * axn_in
            vvel3 = v + dtf2 * ayn_in

            # rolled partner kinematics (per distinct delta)
            lon_r = _roll_all(lon_o, deltas)
            lat_r = _roll_all(lat_o, deltas)
            uo_r = _roll_all(u_o, deltas)
            vo_r = _roll_all(v_o, deltas)
            av_r = _roll_all(angv, deltas)
            rt_r = _roll_all(rot, deltas)

            F_x = jnp.zeros_like(u)
            F_y = jnp.zeros_like(u)
            T = jnp.zeros_like(u)
            Fd_x = jnp.zeros_like(u)
            Fd_y = jnp.zeros_like(u)
            T_d = jnp.zeros_like(u)
            cIA_x = jnp.zeros_like(u)
            cIA_y = jnp.zeros_like(u)
            cIAd_x = jnp.zeros_like(u)
            cIAd_y = jnp.zeros_like(u)
            nblen, nbt1, nbt2, nbrr, nbns, nbss, nbb = \
                [], [], [], [], [], [], []

            for b in range(nslots):
                lon2 = _partner(slot_masks[b], lon_r)
                lat2 = _partner(slot_masks[b], lat_r)
                uo2 = _partner(slot_masks[b], uo_r)
                vo2 = _partner(slot_masks[b], vo_r)
                av2 = _partner(slot_masks[b], av_r)
                rt2 = _partner(slot_masks[b], rt_r)

                valid = vstat[b] & (bbrok[b] != 1.)

                # ---- bond kernel (calculate_force_dem) ------------------
                lat_ref = 0.5 * (lat_o + lat2)
                dx_dlon, dy_dlat = _metric(lat_ref, fl, Re)
                rx = (lon_o - lon2) * dx_dlon
                ry = (lat_o - lat2) * dy_dlat
                blength = jnp.sqrt(rx * rx + ry * ry)
                lsafe = jnp.where(blength > 0., blength, 1.)
                n1 = rx / lsafe
                n2 = ry / lsafe

                half_delta = 0.5 * (l0b[b] - blength)
                RR1 = R1b - half_delta
                RR2 = R2b[b] - half_delta
                RR1x, RR1y = RR1 * n1, RR1 * n2
                RR2x, RR2y = RR2 * n1, RR2 * n2

                L = 2.0 * (Rminb[b] + (Rminb[b] - half_delta)
                           * jnp.abs(R1b - R2b[b]) / lsafe)
                dT = jnp.abs(thick - thick2[b])
                Thick = TRminb[b] + (Rminb[b] - half_delta) * dT / lsafe

                Fn_mag = kspring * Thick * 2. * half_delta * L / l0b[b]
                Fn_x, Fn_y = Fn_mag * n1, Fn_mag * n2

                ur = u_o - uo2
                vr = v_o - vo2

                tmag = bt1[b] ** 2 + bt2[b] ** 2
                tdotn = bt1[b] * n1 + bt2[b] * n2
                t1p = bt1[b] - tdotn * n1
                t2p = bt2[b] - tdotn * n2
                tmagp = t1p ** 2 + t2p ** 2
                t_rat = jnp.where(
                    tmagp > 0.,
                    jnp.sqrt(tmag / jnp.where(tmagp > 0., tmagp, 1.)), 0.)
                t1p = t_rat * t1p
                t2p = t_rat * t2p

                rotu = RR1y * angv + RR2y * av2
                rotv = -(RR1x * angv + RR2x * av2)
                ur2 = ur + rotu
                vr2 = vr + rotv
                upmag = ur2 * n1 + vr2 * n2
                tangd1 = t1p + (ur2 - upmag * n1) * dtf
                tangd2 = t2p + (vr2 - upmag * n2) * dtf

                ss_factor = -L * Thick * kspring / (
                    l0b[b] * 2.0 * (1.0 + cfg.poisson))
                if fl.ignore_tang:
                    ss_factor = jnp.zeros_like(ss_factor)
                Fs_x = ss_factor * tangd1
                Fs_y = ss_factor * tangd2
                sstress = jnp.sqrt(Fs_x ** 2 + Fs_y ** 2) \
                    / jnp.maximum(L * Thick, 1e-30)
                Ts = -(RR1x * Fs_y - RR1y * Fs_x)

                rel_rotation = brr[b] + (angv - av2) * dtf

                if not fl.orig_moi:
                    theta = jnp.sin(rot - rt2)
                    Tr = -kspring * (L ** 3) * Thick * theta / (12. * l0b[b])
                else:
                    theta = rot - rt2
                    Tr = -(kspring / l0b[b]) * (2. / 3.) \
                        * ((0.5 * L) ** 3) * Thick * theta
                nstress = (kspring / l0b[b]) * (
                    -2. * half_delta + jnp.abs(theta * 0.5 * L))

                dw = angv - av2
                if fl.break_sub:
                    breaking = valid & ((nstress > tn) | (sstress > tt))
                    broken_new = jnp.where(breaking, 1., bbrok[b])
                    w = jnp.where(valid & ~breaking, 1., 0.)
                    wc = jnp.where(breaking & (nstress < 0.), 1., 0.)
                    F_x = F_x + w * (Fn_x + Fs_x) + wc * Fn_x
                    F_y = F_y + w * (Fn_y + Fs_y) + wc * Fn_y
                    T = T + w * (Ts + Tr)
                    Fd_x = Fd_x + (w + wc) * (-dampb[b] * ur)
                    Fd_y = Fd_y + (w + wc) * (-dampb[b] * vr)
                    T_d = T_d + w * (-dampb[b] * dw)
                else:
                    broken_new = bbrok[b]
                    w = jnp.where(valid, 1., 0.)
                    F_x = F_x + w * (Fn_x + Fs_x)
                    F_y = F_y + w * (Fn_y + Fs_y)
                    T = T + w * (Ts + Tr)
                    Fd_x = Fd_x + w * (-dampb[b] * ur)
                    Fd_y = Fd_y + w * (-dampb[b] * vr)
                    T_d = T_d + w * (-dampb[b] * dw)

                keep = valid
                nblen.append(jnp.where(keep, blength, blen[b]))
                nbt1.append(jnp.where(keep, tangd1, bt1[b]))
                nbt2.append(jnp.where(keep, tangd2, bt2[b]))
                nbrr.append(jnp.where(keep, rel_rotation, brr[b]))
                nbns.append(jnp.where(keep, nstress, bns[b]))
                nbss.append(jnp.where(keep, sstress, bss[b]))
                nbb.append(broken_new)

                # ---- broken-bond contact (806-956 via 1789-1792) --------
                bm = cstat[b] & (bbrok[b] == 1.)
                r = blength          # same geometry as the bond eval
                rsafe = lsafe
                crit = R1c + R2c[b]
                active = bm & (r > 0.) & (r < crit)
                M_min = jnp.minimum(M1c, M2c[b])
                accel_spring = cs * (M_min / M1c) * (crit - r)
                af = jnp.where(active, 1., 0.)
                cIA_x = cIA_x + af * accel_spring * rx / rsafe
                cIA_y = cIA_y + af * accel_spring * ry / rsafe

                P11 = (rx * rx) / rsafe ** 2
                P12 = (rx * ry) / rsafe ** 2
                P22 = (ry * ry) / rsafe ** 2
                du = uo2 - u
                dv = vo2 - v

                def pmag(Pa, Pb, Pc, coef):
                    if not fl.pmag:
                        return coef
                    mg = jnp.sqrt((Pa * du + Pb * dv) ** 2
                                  + (Pb * du + Pc * dv) ** 2)
                    return coef * mg

                durel = uo2 - u_o
                dvrel = vo2 - v_o
                crad = pmag(P11, P12, P22,
                            radial_damping * (M_min / M1c))
                ctan = pmag(1. - P11, -P12, 1. - P22,
                            tangental_damping * (M_min / M1c))
                Pd11 = crad * P11 + ctan * (1. - P11)
                Pd12 = crad * P12 + ctan * (-P12)
                Pd22 = crad * P22 + ctan * (1. - P22)
                cIAd_x = cIAd_x + af * (Pd11 * durel + Pd12 * dvrel)
                cIAd_y = cIAd_y + af * (Pd12 * durel + Pd22 * dvrel)

            # ---- assemble accelerations (_substep_forces) ---------------
            IA_x = cIA_x + F_x / Mself
            IA_y = cIA_y + F_y / Mself
            IAd_x = cIAd_x + Fd_x / Mself
            IAd_y = cIAd_y + Fd_y / Mself
            ang_accel = (T + T_d) / (0.5 * Mself * R1moi ** 2)
            axn = IA_x + IAd_x
            ayn = IA_y + IAd_y
            if fl.short_ground:
                axn = axn + u * gdrag_rect
                ayn = ayn + v * gdrag_rect

            uveln = uvel3 + dtf * (0.5 * axn)
            vveln = vvel3 + dtf * (0.5 * ayn)

            axf = jnp.where(mv, axn, axf)
            ayf = jnp.where(mv, ayn, ayf)
            bxf = jnp.where(mv, 0., bxf)
            byf = jnp.where(mv, 0., byf)
            u = jnp.where(mv, uveln, u)
            v = jnp.where(mv, vveln, v)
            u_o = jnp.where(mv, uveln, u_o)
            v_o = jnp.where(mv, vveln, v_o)
            anga = jnp.where(mv, ang_accel, anga)

            bbrok = tuple(jnp.where(mv, nbb[b], bbrok[b])
                          for b in range(nslots))
            blen = tuple(jnp.where(mv, nblen[b], blen[b])
                         for b in range(nslots))
            bt1 = tuple(jnp.where(mv, nbt1[b], bt1[b])
                        for b in range(nslots))
            bt2 = tuple(jnp.where(mv, nbt2[b], bt2[b])
                        for b in range(nslots))
            brr = tuple(jnp.where(mv, nbrr[b], brr[b])
                        for b in range(nslots))
            bns = tuple(jnp.where(mv, nbns[b], bns[b])
                        for b in range(nslots))
            bss = tuple(jnp.where(mv, nbss[b], bss[b])
                        for b in range(nslots))

            # angular kick (icebergs.F90:6986-7034)
            gdrag = gdrag_disk if fl.ground_torque else 0.
            av = (angv + dtf * anga) / (1. - gdrag * dtf)
            angv = jnp.where(mv, av, angv)
            rot = jnp.where(mv, rot + dtf * av, rot)

            return (lon, lat, lon_o, lat_o, u, v, u_o, v_o,
                    axf, ayf, bxf, byf, angv, anga, rot,
                    bbrok, blen, bt1, bt2, brr, bns, bss)

        carry0 = tuple(r[...] for r in car_in) + tuple(
            tuple(bond_in[f][b] for b in range(nslots)) for f in range(7))
        out = jax.lax.fori_loop(0, n_sub, body, carry0)

        for k in range(15):
            car_out[k][...] = out[k]
        for f in range(7):
            for b in range(nslots):
                bond_out[f][b] = out[15 + f][b]

    return kernel


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

_CAR_FIELDS = ("lon", "lat", "lon_old", "lat_old", "uvel", "vvel",
               "uvel_old", "vvel_old", "axn_fast", "ayn_fast",
               "bxn_fast", "byn_fast", "ang_vel", "ang_accel", "rot")
_BOND_FIELDS = ("bond_broken", "bond_length", "bond_tangd1", "bond_tangd2",
                "bond_rel_rotation", "bond_nstress", "bond_sstress")


def supports_vmem_substeps(cfg: IcebergsConfig) -> bool:
    """Static flag-set check (the topology check is separate)."""
    return bool(cfg.dem and (cfg.explicit_inner_mts or cfg.dem)
                and cfg.use_broken_bonds_for_substep_contact
                and (not cfg.break_bonds_on_sub_steps
                     or cfg.fracture_criterion == 'stress'))


def part3_substeps_vmem(st, cfg: IcebergsConfig, deltas,
                        block_n: int = 512, interpret: bool = False):
    """Run all ``cfg.n_sub_steps`` fast substeps in one VMEM-resident
    Pallas kernel.  Returns ``(state, nbroken)``.

    ``deltas`` must come from :func:`analyze_bond_deltas` on the CONCRETE
    bond table this state carries (host-side, before jit).
    """
    assert supports_vmem_substeps(cfg)
    assert deltas, "empty delta set: no bonds — use the scan path"
    N = st.capacity
    assert N % block_n == 0 and block_n % 128 == 0
    # Mosaic tiling: the (R, 128) block needs R % 8 == 0 unless the
    # block IS the whole array (single-block worlds)
    assert block_n % 1024 == 0 or N == block_n or interpret, \
        f"block_n={block_n}: compiled TPU blocks need block_n % 1024 == 0"
    nslots = st.max_bonds
    n_sub = cfg.n_sub_steps
    dtf = cfg.dt / max(n_sub, 1)
    nrows = N // 128
    R = block_n // 128
    nblocks = N // block_n
    dt_ = st.lon.dtype

    def erow(x, dt=None):
        return jnp.asarray(x, dt or dt_).reshape(nrows, 128)

    def brow(x, dt=None):
        # (N, B) -> (B, nrows, 128)
        return jnp.asarray(x, dt or dt_).T.reshape(nslots, nrows, 128)

    moving = (st.alive & (st.static_berg < 0.5)).astype(dt_)
    idx = jnp.arange(N, dtype=jnp.int32)[:, None]
    delta = jnp.where(st.bond_idx >= 0, st.bond_idx - idx, _SENT)

    statics = [erow(moving), erow(st.alive.astype(dt_)),
               erow(st.thickness), erow(st.mass), erow(st.od),
               erow(st.fl_k), erow(st.length), erow(st.width)]
    delta_b = delta.T.reshape(nslots, nrows, 128)
    car = [erow(getattr(st, f)) for f in _CAR_FIELDS]
    bonds = [brow(getattr(st, f)) for f in _BOND_FIELDS]

    espec = pl.BlockSpec((R, 128), lambda i: (i, 0))
    bspec = pl.BlockSpec((nslots, R, 128), lambda i: (0, i, 0))

    kernel = _make_kernel(cfg, deltas, n_sub, dtf, nslots)
    out_shapes = ([jax.ShapeDtypeStruct((nrows, 128), dt_)] * 15
                  + [jax.ShapeDtypeStruct((nslots, nrows, 128), dt_)] * 7)
    out_specs = [espec] * 15 + [bspec] * 7

    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[espec] * 8 + [pl.BlockSpec(
            (nslots, R, 128), lambda i: (0, i, 0))] + [espec] * 15
            + [bspec] * 7,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*statics, delta_b, *car, *bonds)

    kw = {}
    for k, f in enumerate(_CAR_FIELDS):
        kw[f] = outs[k].reshape(N)
    for f_i, f in enumerate(_BOND_FIELDS):
        val = outs[15 + f_i].reshape(nslots, N).T
        if f == "bond_broken":
            kw[f] = val.astype(st.bond_broken.dtype)
        else:
            kw[f] = val
    # broken lanes never unbreak and non-moving rows never update, so the
    # per-substep "newly broken" total equals the before/after diff
    nbroken = jnp.sum((kw["bond_broken"] == 1)
                      & (st.bond_broken != 1)).astype(jnp.int32)
    st = st.replace(**kw)
    st = st.replace(n_bonds=jnp.sum(
        (st.bond_idx >= 0) & (st.bond_broken != 1), axis=1).astype(st.dtype))
    return st, nbroken
