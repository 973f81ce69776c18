"""Bonded-particle DEM force kernel (iKID, Huth et al 2022b Sci. Adv.).

TPU-native port of ``calculate_force_dem`` (``src/icebergs.F90:957-1242``)
and ``calculate_unbonded_same_conglom_dem_force`` (806-956), following the
Wang 2020 scale-invariant parallel-bond model (bond width & thickness
evaluated at the contact point, shear from accumulated tangential
displacement with contact-plane rotation projection, torque from shear +
relative particle rotation), extended with ice-thickness dependence as the
reference does.

All directed bonds are evaluated independently as one (N, B) slab — the
antisymmetry the reference maintains by mirroring ``save_bond_forces``
pairs holds by construction (tangd accumulators are per-directed-bond and
antisymmetric).  Fracture uses the stress criterion of ``break_bonds_dem``
(icebergs_framework.F90:4713-4801).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import IcebergsConfig
from ..grid import convert_from_grid_to_meters

_HEXDENOM = 1. / (2. * math.sqrt(3.))


class DemOut(NamedTuple):
    F_x: jnp.ndarray      # (N,) net bond force w/o damping
    F_y: jnp.ndarray
    T: jnp.ndarray        # net torque w/o damping
    Fd_x: jnp.ndarray     # damping force
    Fd_y: jnp.ndarray
    T_d: jnp.ndarray      # damping torque
    # per-bond updated bookkeeping, (N, B)
    bond_length: jnp.ndarray
    tangd1: jnp.ndarray
    tangd2: jnp.ndarray
    rel_rotation: jnp.ndarray
    nstress: jnp.ndarray
    sstress: jnp.ndarray
    # bond_broken incl. in-kernel per-substep breaking (None when
    # break_bonds_on_sub_steps is off: no breaking inside the kernel)
    broken: jnp.ndarray = None


def _radius(cfg: IcebergsConfig, A):
    if cfg.hexagonal_icebergs:
        return jnp.sqrt(A * _HEXDENOM)
    return 0.5 * jnp.sqrt(A)


def dem_K_damp(cfg: IcebergsConfig) -> float:
    """2k/(3(1-nu^2)) (icebergs_framework.F90:1436)."""
    return 2. * cfg.dem_spring_coef / (3. * (1. - cfg.poisson ** 2))


def make_bond_onehot(st, dtype=jnp.bfloat16):
    """One-hot partner matrix (N, B, N) for MXU-based partner access.

    On TPU, random gathers are slow but matmuls are nearly free at
    DEM-conglomerate sizes (N <= a few thousand): partner fields become
    ``einsum('nbm,mf->nbf', onehot, fields)``, exact for 0/1 weights.
    Build once per outer step (bond topology is fixed during substeps).
    """
    N = st.capacity
    oh = jax.nn.one_hot(jnp.where(st.bond_idx >= 0, st.bond_idx, N),
                        N, dtype=dtype)
    return oh


_BOND_PART_DYN = ("lon_old", "lat_old", "uvel_old", "vvel_old",
                  "ang_vel", "rot")
_BOND_PART_STATIC = ("thickness", "length", "width", "mass", "fl_k")


def _partner_gather(st, names, extra_alive, onehot):
    other = jnp.maximum(st.bond_idx, 0)
    cols = [getattr(st, n) for n in names]
    if extra_alive:
        cols.append(st.alive.astype(st.dtype))
    mat = jnp.stack(cols, axis=-1)
    if onehot is not None:
        # MXU path: partner rows via one-hot matmul.  precision HIGHEST is
        # load-bearing on TPU: the default truncates `mat` to bf16 inside
        # the MXU, and positions ~2e4 m lose ~80 m — the 0/1 one-hot side
        # is exact in bf16, the value side must not be rounded.
        g = jnp.einsum("nbm,mf->nbf", onehot, mat,
                       preferred_element_type=mat.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        g = mat[other]                      # single packed row gather
    part = {n: g[..., k] for k, n in enumerate(names)}
    if extra_alive:
        part["alive"] = g[..., len(names)] > 0.5
    return part


def bond_partner_static(st, onehot=None):
    """Partner columns CONSTANT across MTS substeps (mass/geometry/
    footloose flags + alive: none change inside Part 3) — gather once
    per outer step and pass to :func:`bond_partner_fields` so the
    per-substep gather moves only the 6 kinematic columns."""
    return _partner_gather(st, _BOND_PART_STATIC, True, onehot)


def bond_partner_fields(st, onehot=None, static=None):
    """Packed partner-field table for the (N, B) bond partner slots —
    ONE row gather shared by the bond AND broken-bond-contact kernels
    (each separate 1M-row gather costs ~10-15 ms on v5e and both run
    every substep).  With ``static`` from :func:`bond_partner_static`,
    only the per-substep kinematic columns are gathered here."""
    if static is None:
        static = bond_partner_static(st, onehot=onehot)
    part = _partner_gather(st, _BOND_PART_DYN, False, onehot)
    part.update(static)
    return part


def dem_bond_forces(st, cfg: IcebergsConfig, dt, onehot=None, part=None):
    """Evaluate all unbroken bonds; returns forces/torques + updated
    per-bond state (calculate_force_dem, savestress=True path).

    With ``onehot`` given, partner fields are fetched by one-hot matmul
    (MXU) instead of gathers (see make_bond_onehot).  ``part`` reuses a
    :func:`bond_partner_fields` table.
    """
    if part is None:
        part = bond_partner_fields(st, onehot=onehot)

    def pick(name):
        return part[name]

    valid = ((st.bond_idx >= 0) & (st.bond_broken != 1)
             & st.alive[:, None] & pick("alive")
             & (st.fl_k[:, None] != -1.) & (pick("fl_k") != -1.))

    if cfg.constant_interaction_LW:
        A0 = cfg.constant_length * cfg.constant_width
        if cfg.hexagonal_icebergs:
            R0 = math.sqrt(A0 * _HEXDENOM)
        else:
            R0 = 0.5 * math.sqrt(A0)
        R1 = jnp.full_like(st.bond_length, R0)
        R2 = R1
        M1 = (A0 * st.thickness * cfg.rho_bergs)[:, None] \
            * jnp.ones_like(st.bond_length)
        M2 = A0 * pick("thickness") * cfg.rho_bergs
        Rmin = R1
        T_Rmin = pick("thickness")
        l0 = 2. * R1
    else:
        A1 = (st.length * st.width)[:, None]
        A2 = pick("length") * pick("width")
        M1 = st.mass[:, None] * jnp.ones_like(st.bond_length)
        M2 = pick("mass")
        R1 = _radius(cfg, A1) * jnp.ones_like(st.bond_length)
        R2 = _radius(cfg, A2)
        first_smaller = R1 < R2
        Rmin = jnp.where(first_smaller, R1, R2)
        T_Rmin = jnp.where(first_smaller, st.thickness[:, None],
                           pick("thickness"))
        l0 = R1 + R2

    lat_ref = 0.5 * (st.lat_old[:, None] + pick("lat_old"))
    dx_dlon, dy_dlat = convert_from_grid_to_meters(
        lat_ref, cfg.grid_is_latlon, cfg.Rearth)
    rx = (st.lon_old[:, None] - pick("lon_old")) * dx_dlon
    ry = (st.lat_old[:, None] - pick("lat_old")) * dy_dlat
    length = jnp.sqrt(rx ** 2 + ry ** 2)
    lsafe = jnp.where(length > 0., length, 1.)
    n1 = rx / lsafe
    n2 = ry / lsafe

    half_delta = 0.5 * (l0 - length)
    RR1 = R1 - half_delta
    RR2 = R2 - half_delta
    RR1x, RR1y = RR1 * n1, RR1 * n2
    RR2x, RR2y = RR2 * n1, RR2 * n2

    # bond width & thickness at the contact point (Wang 2020)
    L = 2.0 * (Rmin + (Rmin - half_delta) * jnp.abs(R1 - R2) / lsafe)
    dT = jnp.abs(st.thickness[:, None] - pick("thickness"))
    Thick = T_Rmin + (Rmin - half_delta) * dT / lsafe

    k = cfg.dem_spring_coef
    Fn_mag = k * Thick * 2. * half_delta * L / l0
    Fn_x, Fn_y = Fn_mag * n1, Fn_mag * n2

    ur = st.uvel_old[:, None] - pick("uvel_old")
    vr = st.vvel_old[:, None] - pick("vvel_old")

    # contact-plane rotation projection of the accumulated tangential
    # displacement (preserve magnitude)
    tmag = st.bond_tangd1 ** 2 + st.bond_tangd2 ** 2
    tdotn = st.bond_tangd1 * n1 + st.bond_tangd2 * n2
    t1p = st.bond_tangd1 - tdotn * n1
    t2p = st.bond_tangd2 - tdotn * n2
    tmagp = t1p ** 2 + t2p ** 2
    t_rat = jnp.where(tmagp > 0., jnp.sqrt(tmag / jnp.where(tmagp > 0., tmagp, 1.)), 0.)
    t1p = t_rat * t1p
    t2p = t_rat * t2p

    # relative tangential velocities incl. particle rotation
    rotu = RR1y * st.ang_vel[:, None] + RR2y * pick("ang_vel")
    rotv = -(RR1x * st.ang_vel[:, None] + RR2x * pick("ang_vel"))
    ur2 = ur + rotu
    vr2 = vr + rotv
    upmag = ur2 * n1 + vr2 * n2
    up, vp = upmag * n1, upmag * n2
    tangd1 = t1p + (ur2 - up) * dt
    tangd2 = t2p + (vr2 - vp) * dt

    # shear force & stress
    ss_factor = -L * Thick * k / (l0 * 2.0 * (1.0 + cfg.poisson))
    if cfg.ignore_tangential_force:
        ss_factor = jnp.zeros_like(ss_factor)
    Fs_x = ss_factor * tangd1
    Fs_y = ss_factor * tangd2
    sstress = jnp.sqrt(Fs_x ** 2 + Fs_y ** 2) / jnp.maximum(L * Thick, 1e-30)

    Ts = -(RR1x * Fs_y - RR1y * Fs_x)

    rel_rotation = st.bond_rel_rotation \
        + (st.ang_vel[:, None] - pick("ang_vel")) * dt

    if not cfg.orig_dem_moment_of_inertia:
        theta = jnp.sin(st.rot[:, None] - pick("rot"))   # Wang 2020
        Tr = -k * (L ** 3) * Thick * theta / (12. * l0)
    else:
        theta = st.rot[:, None] - pick("rot")            # Potyondy-Cundall
        Tr = -(k / l0) * (2. / 3.) * ((0.5 * L) ** 3) * Thick * theta

    nstress = (k / l0) * (-2. * half_delta + jnp.abs(theta * 0.5 * L))

    damping_coef = cfg.dem_damping_coef * jnp.sqrt(
        dem_K_damp(cfg) * M1 * M2 / (M1 + M2))
    dw = st.ang_vel[:, None] - pick("ang_vel")

    # in-kernel per-substep fracture (icebergs.F90:1140-1199): a bond
    # whose fresh stress exceeds a threshold breaks NOW and contributes
    # no force this substep — except the compression contact (Fn) +
    # linear damping when it failed under shear with normal compression
    # (nstress < 0).  Symmetric: both directed lanes compute identical
    # stresses, so reciprocity holds without a partner pass.
    broken_new = None
    if cfg.break_bonds_on_sub_steps:
        assert cfg.fracture_criterion == 'stress', \
            "break_bonds_on_sub_steps requires fracture_criterion='stress'"
        breaking = valid & ((nstress > cfg.frac_thres_n
                             * cfg.frac_thres_scaling)
                            | (sstress > cfg.frac_thres_t
                               * cfg.frac_thres_scaling))
        broken_new = jnp.where(breaking, 1, st.bond_broken)
        w = jnp.where(valid & ~breaking, 1., 0.)
        wc = jnp.where(breaking & (nstress < 0.), 1., 0.)
        F_x = jnp.sum(w * (Fn_x + Fs_x) + wc * Fn_x, -1)
        F_y = jnp.sum(w * (Fn_y + Fs_y) + wc * Fn_y, -1)
        T = jnp.sum(w * (Ts + Tr), -1)
        Fd_x = jnp.sum((w + wc) * (-damping_coef * ur), -1)
        Fd_y = jnp.sum((w + wc) * (-damping_coef * vr), -1)
        T_d = jnp.sum(w * (-damping_coef * dw), -1)
    else:
        w = jnp.where(valid, 1., 0.)
        F_x = jnp.sum(w * (Fn_x + Fs_x), -1)
        F_y = jnp.sum(w * (Fn_y + Fs_y), -1)
        T = jnp.sum(w * (Ts + Tr), -1)
        Fd_x = jnp.sum(w * (-damping_coef * ur), -1)
        Fd_y = jnp.sum(w * (-damping_coef * vr), -1)
        T_d = jnp.sum(w * (-damping_coef * dw), -1)

    keep = valid
    return DemOut(
        F_x=F_x, F_y=F_y, T=T, Fd_x=Fd_x, Fd_y=Fd_y, T_d=T_d,
        bond_length=jnp.where(keep, length, st.bond_length),
        tangd1=jnp.where(keep, tangd1, st.bond_tangd1),
        tangd2=jnp.where(keep, tangd2, st.bond_tangd2),
        rel_rotation=jnp.where(keep, rel_rotation, st.bond_rel_rotation),
        nstress=jnp.where(keep, nstress, st.bond_nstress),
        sstress=jnp.where(keep, sstress, st.bond_sstress),
        broken=broken_new)


def dem_contact_forces(st, cfg: IcebergsConfig, other, mask, part=None):
    """Unbonded same-conglomerate contact force + explicit damping.

    Port of ``calculate_unbonded_same_conglom_dem_force``
    (icebergs.F90:806-956).  Returns (IA_x, IA_y, IAd_x, IAd_y).

    Partner fields come from ONE packed row gather: at 1M elements each
    separate (N, B) gather costs ~10-15 ms on v5e, and this kernel runs
    EVERY substep (the 9 per-field gathers measured 134 ms/eval).
    When the caller's ``other`` is the bond partner table, pass
    ``part`` from :func:`bond_partner_fields` to reuse ITS gather —
    valid only when ``other == max(st.bond_idx, 0)``.
    """
    if part is not None:
        fl_k2, T2 = part["fl_k"], part["thickness"]
        lon2, lat2 = part["lon_old"], part["lat_old"]
        u2g, v2g = part["uvel_old"], part["vvel_old"]
        L2g, W2g, M2g = part["length"], part["width"], part["mass"]
    else:
        g = jnp.stack([st.fl_k, st.thickness, st.lon_old, st.lat_old,
                       st.uvel_old, st.vvel_old, st.length, st.width,
                       st.mass], axis=-1)[other]           # (N, B, 9)
        fl_k2, T2 = g[..., 0], g[..., 1]
        lon2, lat2 = g[..., 2], g[..., 3]
        u2g, v2g = g[..., 4], g[..., 5]
        L2g, W2g, M2g = g[..., 6], g[..., 7], g[..., 8]

    mask = mask & (st.fl_k[:, None] != -1.) & (fl_k2 != -1.)

    if cfg.constant_interaction_LW:
        A0 = cfg.constant_length * cfg.constant_width
        if cfg.hexagonal_icebergs:
            R0 = math.sqrt(A0 * _HEXDENOM)
        elif cfg.iceberg_bonds_on:
            R0 = 0.5 * math.sqrt(A0)
        else:
            R0 = math.sqrt(A0 / C.PI)
        R1 = R0
        R2 = R0
        M1 = (A0 * st.thickness * cfg.rho_bergs)[:, None]
        M2 = A0 * T2 * cfg.rho_bergs
    else:
        A1 = (st.length * st.width)[:, None]
        A2 = L2g * W2g
        if cfg.hexagonal_icebergs:
            R1 = jnp.sqrt(A1 * _HEXDENOM)
            R2 = jnp.sqrt(A2 * _HEXDENOM)
        elif cfg.iceberg_bonds_on:
            R1 = 0.5 * jnp.sqrt(A1)
            R2 = 0.5 * jnp.sqrt(A2)
        else:
            R1 = jnp.sqrt(A1 / C.PI)
            R2 = jnp.sqrt(A2 / C.PI)
        M1 = st.mass[:, None]
        M2 = M2g

    lat_ref = 0.5 * (st.lat_old[:, None] + lat2)
    dx_dlon, dy_dlat = convert_from_grid_to_meters(
        lat_ref, cfg.grid_is_latlon, cfg.Rearth)
    rx = (st.lon_old[:, None] - lon2) * dx_dlon
    ry = (st.lat_old[:, None] - lat2) * dy_dlat
    r = jnp.sqrt(rx ** 2 + ry ** 2)
    rsafe = jnp.where(r > 0., r, 1.)

    crit = R1 + R2
    spring_coef = cfg.spring_coef
    if cfg.critical_interaction_damping_on:
        radial_damping = 2. * math.sqrt(spring_coef)
        tangental_damping = (2. * math.sqrt(spring_coef)) / 4. \
            if cfg.tang_crit_int_damp_on else cfg.tangental_damping_coef
    else:
        radial_damping = cfg.radial_damping_coef
        tangental_damping = cfg.tangental_damping_coef

    active = mask & (r > 0.) & (r < crit)
    M_min = jnp.minimum(M1, M2)

    accel_spring = spring_coef * (M_min / M1) * (crit - r)
    IA_x = jnp.sum(jnp.where(active, accel_spring * rx / rsafe, 0.), -1)
    IA_y = jnp.sum(jnp.where(active, accel_spring * ry / rsafe, 0.), -1)

    P11 = (rx * rx) / rsafe ** 2
    P12 = (rx * ry) / rsafe ** 2
    P22 = (ry * ry) / rsafe ** 2
    u2, v2 = u2g, v2g
    # uvel0 == u1 == the substep-start velocity (accel_explicit_inner_mts
    # passes uvel0 for both, icebergs.F90:1838-1841)
    du = u2 - st.uvel[:, None]
    dv = v2 - st.vvel[:, None]

    def pmag(P11, P12, P22, coef):
        if not cfg.scale_damping_by_pmag:
            return coef
        m = jnp.sqrt((P11 * du + P12 * dv) ** 2 + (P12 * du + P22 * dv) ** 2)
        return coef * m   # u1 == u0 here -> 0.5*(m+m) = m

    durel = u2g - st.uvel_old[:, None]
    dvrel = v2g - st.vvel_old[:, None]

    crad = pmag(P11, P12, P22, radial_damping * (M_min / M1))
    ctan = pmag(1. - P11, -P12, 1. - P22, tangental_damping * (M_min / M1))
    Pd11 = crad * P11 + ctan * (1. - P11)
    Pd12 = crad * P12 + ctan * (-P12)
    Pd22 = crad * P22 + ctan * (1. - P22)
    IAd_x = jnp.sum(jnp.where(active, Pd11 * durel + Pd12 * dvrel, 0.), -1)
    IAd_y = jnp.sum(jnp.where(active, Pd12 * durel + Pd22 * dvrel, 0.), -1)
    return IA_x, IA_y, IAd_x, IAd_y


def dem_contact_forces_pairs(st, cfg: IcebergsConfig, me, other, mask):
    """Pair-list form of :func:`dem_contact_forces` (same formulas,
    icebergs.F90:806-956) for a compacted (P,) list of candidate pairs.

    The MTS substep loop's contact candidates are frozen per outer step
    (the reference never re-bins cells during substeps), so the
    same-conglomerate superset can be compacted once and each substep
    evaluates only these P pairs instead of the dense (N, M) slab.
    Per-pair values are bitwise those of the dense kernel; only the
    accumulation order differs (scatter-add vs row-sum).
    Returns (IA_x, IA_y, IAd_x, IAd_y) scattered to (N,).
    """
    N = st.capacity
    # packed per-berg row gather: one (N, F) matrix, two (P, F) gathers
    packed = jnp.stack([st.lon_old, st.lat_old, st.uvel_old, st.vvel_old,
                        st.uvel, st.vvel, st.length * st.width,
                        st.thickness, st.fl_k], axis=-1)
    g1 = packed[me]
    g2 = packed[other]
    mask = mask & (g1[:, 8] != -1.) & (g2[:, 8] != -1.)

    if cfg.constant_interaction_LW:
        A0 = cfg.constant_length * cfg.constant_width
        if cfg.hexagonal_icebergs:
            R0 = math.sqrt(A0 * _HEXDENOM)
        elif cfg.iceberg_bonds_on:
            R0 = 0.5 * math.sqrt(A0)
        else:
            R0 = math.sqrt(A0 / C.PI)
        R1 = R0
        R2 = R0
        M1 = A0 * g1[:, 7] * cfg.rho_bergs
        M2 = A0 * g2[:, 7] * cfg.rho_bergs
    else:
        A1 = g1[:, 6]
        A2 = g2[:, 6]
        if cfg.hexagonal_icebergs:
            R1 = jnp.sqrt(A1 * _HEXDENOM)
            R2 = jnp.sqrt(A2 * _HEXDENOM)
        elif cfg.iceberg_bonds_on:
            R1 = 0.5 * jnp.sqrt(A1)
            R2 = 0.5 * jnp.sqrt(A2)
        else:
            R1 = jnp.sqrt(A1 / C.PI)
            R2 = jnp.sqrt(A2 / C.PI)
        M1 = st.mass[me]
        M2 = st.mass[other]

    lat_ref = 0.5 * (g1[:, 1] + g2[:, 1])
    dx_dlon, dy_dlat = convert_from_grid_to_meters(
        lat_ref, cfg.grid_is_latlon, cfg.Rearth)
    rx = (g1[:, 0] - g2[:, 0]) * dx_dlon
    ry = (g1[:, 1] - g2[:, 1]) * dy_dlat
    r = jnp.sqrt(rx ** 2 + ry ** 2)
    rsafe = jnp.where(r > 0., r, 1.)

    crit = R1 + R2
    spring_coef = cfg.spring_coef
    if cfg.critical_interaction_damping_on:
        radial_damping = 2. * math.sqrt(spring_coef)
        tangental_damping = (2. * math.sqrt(spring_coef)) / 4. \
            if cfg.tang_crit_int_damp_on else cfg.tangental_damping_coef
    else:
        radial_damping = cfg.radial_damping_coef
        tangental_damping = cfg.tangental_damping_coef

    active = mask & (r > 0.) & (r < crit)
    M_min = jnp.minimum(M1, M2)

    accel_spring = spring_coef * (M_min / M1) * (crit - r)
    fx = jnp.where(active, accel_spring * rx / rsafe, 0.)
    fy = jnp.where(active, accel_spring * ry / rsafe, 0.)

    P11 = (rx * rx) / rsafe ** 2
    P12 = (rx * ry) / rsafe ** 2
    P22 = (ry * ry) / rsafe ** 2
    # as in the dense kernel: pmag velocity difference uses the partner's
    # *_old velocity minus the self substep-start velocity (uvel)
    du = g2[:, 2] - g1[:, 4]
    dv = g2[:, 3] - g1[:, 5]

    def pmag(P11, P12, P22, coef):
        if not cfg.scale_damping_by_pmag:
            return coef
        m = jnp.sqrt((P11 * du + P12 * dv) ** 2
                     + (P12 * du + P22 * dv) ** 2)
        return coef * m

    durel = g2[:, 2] - g1[:, 2]
    dvrel = g2[:, 3] - g1[:, 3]

    crad = pmag(P11, P12, P22, radial_damping * (M_min / M1))
    ctan = pmag(1. - P11, -P12, 1. - P22,
                tangental_damping * (M_min / M1))
    Pd11 = crad * P11 + ctan * (1. - P11)
    Pd12 = crad * P12 + ctan * (-P12)
    Pd22 = crad * P22 + ctan * (1. - P22)
    dx_ = jnp.where(active, Pd11 * durel + Pd12 * dvrel, 0.)
    dy_ = jnp.where(active, Pd12 * durel + Pd22 * dvrel, 0.)

    # one packed (P, 4) -> (N, 4) accumulation; inactive pairs contribute
    # exact zeros (fx..dy_ are masked by `active`), so the target can stay
    # `me` itself, which is sorted ascending (compact_conglom_pairs
    # preserves row-major order) — the TPU scatter then runs as a segment
    # reduction instead of random updates
    vals = jnp.stack([fx, fy, dx_, dy_], axis=-1)
    acc = jnp.zeros((N, 4), vals.dtype).at[me].add(
        vals, mode='drop', indices_are_sorted=True)
    return acc[:, 0], acc[:, 1], acc[:, 2], acc[:, 3]


def break_bonds_dem(st, cfg: IcebergsConfig):
    """Stress-criterion fracture (break_bonds_dem,
    icebergs_framework.F90:4713-4801): mark bonds broken where
    nstress > frac_thres_n or sstress > frac_thres_t; refresh n_bonds."""
    if cfg.fracture_criterion != 'stress':
        return st, jnp.zeros((), jnp.int32)
    tn = cfg.frac_thres_n * cfg.frac_thres_scaling
    tt = cfg.frac_thres_t * cfg.frac_thres_scaling
    if tn <= 0. and tt <= 0.:
        return st, jnp.zeros((), jnp.int32)
    tn = tn if tn > 0. else jnp.inf
    tt = tt if tt > 0. else jnp.inf
    has = st.bond_idx >= 0
    breaking = has & (st.bond_broken != 1) & (
        (st.bond_nstress > tn) | (st.bond_sstress > tt))
    broken = jnp.where(breaking, 1, st.bond_broken)
    st = st.replace(bond_broken=broken)
    live = has & (broken != 1)
    st = st.replace(n_bonds=jnp.sum(live, axis=1).astype(st.dtype))
    return st, jnp.sum(breaking.astype(jnp.int32))
