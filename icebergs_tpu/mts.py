"""Multiple-time-stepping velocity Verlet (MTS) and the iKID DEM loop.

TPU-native port of ``evolve_icebergs_mts`` (``src/icebergs.F90:6576-7078``),
``accel_mts`` (1277-1708) and ``accel_explicit_inner_mts`` (1709-1947):

* **Part 1** — solve V_{n+1} with slow forces (ocean/atm/ice drag, Coriolis,
  slope, wave radiation) plus cross-conglomerate collision forces, with an
  optional fixed-point ``force_convergence`` iteration;
* **Part 2** — half-kick by the slow acceleration;
* **Part 3** — ``mts_sub_steps`` fast substeps over bond/contact forces
  only, as one ``lax.scan`` (drift, DEM bond forces, torque/angular update,
  per-substep fracture).  No communication happens inside the scan — the
  multi-device layer replicates whole conglomerates beforehand, exactly the
  invariant ``transfer_mts_bergs`` maintains in the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import constants as C
from .config import IcebergsConfig
from .dynamics import adjust_index_and_ground, _advance_position
from .grid import Grid
from .ops import forces as _forces
from .ops import dem as _dem
from .ops.accel import IA, zero_ia


class MtsDiags(NamedTuple):
    broken_bonds: jnp.ndarray
    # same-conglomerate candidate pairs excluded from the frozen substep
    # pair list by the velocity/acceleration skin prefilter (see
    # compact_conglom_pairs; 0 when the prefilter is disabled)
    skin_dropped: jnp.ndarray = jnp.zeros((), jnp.int32)
    # candidate pairs that did not fit in the frozen pair list's static
    # capacity (compact_conglom_pairs cap/act_cap): nonzero means the
    # substep contact forces MISSED pairs — resize (auto_pair_cap).
    # None when no pair compaction runs (vmem kernel / broken-bond
    # regimes): adding a constant-zero leaf to the step's output pytree
    # for those paths tripped a jax executable-cache buffer-count
    # mismatch on repeat driver runs in one process
    pair_overflow: Optional[jnp.ndarray] = None
    # Part-1 force-convergence iterations actually run this outer step
    # (0 when force_convergence is off) — at 1M bergs each iteration
    # costs a full slow-physics pass + partner-velocity refresh, so
    # this is the DEM outer step's dominant knob
    conv_iters: jnp.ndarray = jnp.zeros((), jnp.int32)
    # Part-1 fused-search fallback overflow (dropped/truncated exact-
    # fallback candidates); None on the tables path
    p1_overflow: Optional[jnp.ndarray] = None


def _slow_accel_mts(st, cfg: IcebergsConfig, ia_fn):
    """Part-1 acceleration (accel_mts with mts_part=1).

    u* = V_k (previous cycle's final velocity); all explicit terms land in
    axn; the implicit 2x2 solve uses scaling=0.5 and CN Coriolis.
    Returns (ax, ay, axn, ayn, bxn, byn, Fdc_mag).
    """
    scaling = 0.5
    u_star, v_star = st.uvel, st.vvel
    uvel0, vvel0 = st.uvel, st.vvel
    dt = cfg.dt

    if cfg.grid_is_latlon and not cfg.use_f_plane:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * st.lat)
    else:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * cfg.lat_ref) \
            * jnp.ones_like(st.lat)

    # clamp: dead slots carry mass/width/length 0, and the raw x/0
    # lanes in the drag/wave terms — though masked downstream — are
    # inf/NaN intermediates that XLA fusion can leak into live lanes
    # inside a larger jit (observed on XLA:CPU; see accel counterpart).
    # Bitwise identical for real bergs.
    M = jnp.maximum(st.mass, 1e-30)
    T = st.thickness
    D = (cfg.rho_bergs / C.RHO_SEAWATER) * T
    F = T - D
    W, L = st.width, st.length
    hi = jnp.minimum(st.hi, D)
    D_hi = jnp.maximum(0., D - hi)
    uo, vo, ui, vi, ua, va = st.uo, st.vo, st.ui, st.vi, st.ua, st.va

    # radius-based vertical faces for hexagonal DEM elements
    # (icebergs.F90:1378-1386)
    if cfg.dem and cfg.hexagonal_icebergs and cfg.radius_based_drag:
        L2 = 2. * jnp.sqrt(L * W / (2. * jnp.sqrt(jnp.asarray(3., M.dtype))))
        W2 = L2
    else:
        L2, W2 = L, W

    # grounding ramp
    if cfg.h_to_init_grounding > 0.:
        groundfrac = jnp.clip(1.0 - (st.od - D) / cfg.h_to_init_grounding,
                              0., 1.)
    else:
        groundfrac = jnp.where(D > st.od, 1.0, 0.0)
    # M is clamped: dead slots carry mass 0 and the raw 0/0 lane —
    # though where()'d out — is a NaN intermediate that XLA's fusion
    # rewrites can leak into live lanes inside a larger jit (observed on
    # XLA:CPU: jitted step NaN'd while the de-optimized graph was
    # finite).  Bitwise identical for any real berg (M > 0).
    c_gnd = jnp.where(groundfrac > 0.,
                      (cfg.cdrag_grounding * W * L * groundfrac)
                      / jnp.maximum(M, 1e-30), 0.)
    if cfg.short_step_mts_grounding:
        c_gnd = jnp.zeros_like(c_gnd)

    # wave radiation
    uwave, vwave = ua - uo, va - vo
    wmod2 = uwave ** 2 + vwave ** 2
    ampl = 0.5 * 0.02025 * wmod2
    Lwl = 0.32 * wmod2
    Cr = 0.06 * jnp.clip((L2 - 0.125 * Lwl) / (0.125 * Lwl + 1.e-30), 0., 1.)
    wave_rad = 0.5 * C.RHO_SEAWATER / M * Cr * C.GRAVITY * ampl \
        * jnp.minimum(ampl, F) * (2. * W2 * L2) \
        / jnp.maximum(W2 + L2, 1e-30)
    wmod = jnp.sqrt(ua ** 2 + va ** 2)
    nz = wmod != 0.
    uwave = jnp.where(nz, ua / jnp.where(nz, wmod, 1.), 0.)
    vwave = jnp.where(nz, va / jnp.where(nz, wmod, 1.), 0.)
    wave_rad = jnp.where(nz, wave_rad, 0.)

    if cfg.iceberg_bonds_on and cfg.internal_bergs_for_drag:
        dragfrac = (cfg.n_max_bonds_shape - st.n_bonds) / cfg.n_max_bonds_shape
    else:
        dragfrac = jnp.ones_like(M)

    c_ocn = C.RHO_SEAWATER / M * cfg.ocean_drag_scale \
        * (0.5 * C.CD_WV * dragfrac * W2 * D_hi + C.CD_WH * W * L)
    c_atm = C.RHO_AIR / M * (0.5 * C.CD_AV * dragfrac * W2 * F
                             + C.CD_AH * W * L)
    c_ice = jnp.where(jnp.abs(hi) == 0., 0.,
                      C.RHO_ICE / M * (0.5 * C.CD_IV * dragfrac * W2 * hi))
    c_ice = jnp.where(jnp.abs(ui) + jnp.abs(vi) == 0., 0., c_ice)

    ia = ia_fn(uvel0, vvel0)
    if cfg.only_interactive_forces:
        axn = ia.IA_x * 0.
        ayn = ia.IA_y * 0.
    else:
        axn = -C.GRAVITY * st.ssh_x + wave_rad * uwave + ia.IA_x
        ayn = -C.GRAVITY * st.ssh_y + wave_rad * vwave + ia.IA_y
        axn = axn + f_cori * v_star
        ayn = ayn - f_cori * u_star

    def spd(a, b):
        return jnp.sqrt(a * a + b * b)

    uveln, vveln = uvel0, vvel0
    ax = ay = jnp.zeros_like(M)
    for itloop in (1, 2):
        if itloop == 2:
            ia = ia_fn(uveln, vveln)   # re-evaluate with the iterate
        if cfg.only_interactive_forces:
            # bergs feel interaction forces only (icebergs.F90:1480-1494)
            RHS_x = (ia.IA_x / 2.) - scaling * (
                (ia.P11 * u_star + ia.P12 * v_star) - ia.Pu_x)
            RHS_y = (ia.IA_y / 2.) - scaling * (
                (ia.P21 * u_star + ia.P22 * v_star) - ia.Pu_y)
            A11 = 1. + scaling * dt * ia.P11
            A22 = 1. + scaling * dt * ia.P22
            A12 = scaling * dt * ia.P12
            A21 = scaling * dt * ia.P21
        else:
            drag_ocn = c_ocn * 0.5 * (spd(uveln - uo, vveln - vo)
                                      + spd(uvel0 - uo, vvel0 - vo))
            drag_atm = c_atm * 0.5 * (spd(uveln - ua, vveln - va)
                                      + spd(uvel0 - ua, vvel0 - va))
            drag_ice = c_ice * 0.5 * (spd(uveln - ui, vveln - vi)
                                      + spd(uvel0 - ui, vvel0 - vi))
            drag_gnd = c_gnd
            RHS_x = (axn / 2.) + scaling * (
                -drag_ocn * (u_star - uo) - drag_atm * (u_star - ua)
                - drag_ice * (u_star - ui) - drag_gnd * u_star)
            RHS_y = (ayn / 2.) + scaling * (
                -drag_ocn * (v_star - vo) - drag_atm * (v_star - va)
                - drag_ice * (v_star - vi) - drag_gnd * v_star)
            RHS_x = RHS_x - scaling * ((ia.P11 * u_star + ia.P12 * v_star)
                                       - ia.Pu_x)
            RHS_y = RHS_y - scaling * ((ia.P21 * u_star + ia.P22 * v_star)
                                       - ia.Pu_y)

            lam = drag_ocn + drag_atm + drag_ice + drag_gnd
            A11 = 1. + scaling * dt * lam + scaling * dt * ia.P11
            A22 = 1. + scaling * dt * lam + scaling * dt * ia.P22
            A12 = -scaling * dt * f_cori / 2. + scaling * dt * ia.P12
            A21 = scaling * dt * f_cori / 2. + scaling * dt * ia.P21
        detA = 1. / (A11 * A22 - A12 * A21)
        ax = detA * (A22 * RHS_x - A12 * RHS_y)
        ay = detA * (A11 * RHS_y - A21 * RHS_x)
        uveln = u_star + dt * ax
        vveln = v_star + dt * ay

    # recompute explicit split with the new velocity (CN Coriolis)
    if cfg.only_interactive_forces:
        axn, ayn = ia.IA_x, ia.IA_y
    else:
        axn = -C.GRAVITY * st.ssh_x + wave_rad * uwave + ia.IA_x \
            + f_cori * vveln
        ayn = -C.GRAVITY * st.ssh_y + wave_rad * vwave + ia.IA_y \
            - f_cori * uveln
    bxn = 2. * ax - axn
    byn = 2. * ay - ayn

    # collisional damping force magnitude (convergence bookkeeping)
    Fdc_x = M * (ia.Pu_x - (ia.P11 * uveln + ia.P12 * vveln))
    Fdc_y = M * (ia.Pu_y - (ia.P21 * uveln + ia.P22 * vveln))
    return ax, ay, axn, ayn, bxn, byn, jnp.abs(Fdc_x) + jnp.abs(Fdc_y)


def _contact_masks(st, nbr, cfg: IcebergsConfig):
    """Substep contact candidates: same-conglomerate, not unbroken-bonded,
    both ends with open bond slots (accel_explicit_inner_mts contact rules,
    icebergs.F90:1817-1855)."""
    other = nbr.cand_idx
    same = st.conglom_id[:, None] == st.conglom_id[other]
    unbroken_partner = jnp.any(
        (other[:, :, None] == jnp.where(st.bond_idx >= 0, st.bond_idx, -2)[:, None, :])
        & (st.bond_broken[:, None, :] != 1), axis=-1)
    open_self = (st.n_bonds < cfg.max_bonds)[:, None]
    open_other = st.n_bonds[other] < cfg.max_bonds
    m = nbr.cand_valid & same & ~unbroken_partner & open_other
    if cfg.dem:
        m = m & open_self
    return m


def compact_conglom_pairs(st, nbr, cap: int, cfg: IcebergsConfig = None,
                          dt=None):
    """Compact the frozen substep-contact superset to a (cap,) pair list.

    The candidate SET is constant across substeps (cells are not re-binned
    inside the substep loop — matching the reference, whose per-cell lists
    are likewise frozen during accel_explicit_inner_mts): only
    same-conglomerate membership and cand_valid enter here; the dynamic
    terms (bond breakage, open slots) are evaluated per substep in
    :func:`_pair_contact_masks`.
    Returns (me, other, pvalid, overflow, skin_dropped).

    With ``cfg``/``dt`` and ``cfg.mts_pair_skin > 0``: pairs further apart
    than ``1.05*crit + mts_pair_skin*vint_max*dt + a_rel*dt^2`` are dropped
    from the frozen list.  ``vint_max`` is the worst internal (relative to
    own conglomerate mean) speed at freeze time and ``a_rel`` a
    fracture-release acceleration bound (a breaking bond can release at
    most its fracture-threshold force, ``frac_thres * 2R*T / M``), so the
    reach survives mid-step bond fracture accelerating fragments.  This is
    a HEURISTIC prefilter, not exact: pathological stiffening beyond the
    release bound could in principle close faster than the margin.  Pairs
    dropped by it are counted in ``skin_dropped``
    (``MtsDiags.skin_dropped``); set ``mts_pair_skin <= 0`` to disable the
    prefilter and keep every same-conglomerate candidate.
    """
    M = nbr.cand_idx.shape[1]
    keepM, skin_dropped = _pair_keep_mask(st, nbr, cfg, dt)

    # two-level compaction: rows with any keeper first (an N-element
    # scatter), then the flat stage over act*M only.  The single-stage
    # flat cumsum+scatter over all N*M entries measured 272 ms at
    # 20k x 400 on v5e, and a lane-axis argsort pre-pass 228 ms; with
    # the internal-velocity skin almost every row is contact-free, so
    # this is ~free at rest and scales with the colliding subset.
    N = keepM.shape[0]
    act_cap = max(1024, cap // 64)
    rowany = jnp.any(keepM, axis=1)
    rrank = jnp.cumsum(rowany.astype(jnp.int32)) - 1
    rgrant = rowany & (rrank < act_cap)
    rsel = jnp.zeros((act_cap,), jnp.int32).at[
        jnp.where(rgrant, rrank, act_cap)].set(
        jnp.arange(N, dtype=jnp.int32), mode='drop')
    row_overflow = jnp.sum((rowany & ~rgrant).astype(jnp.int32))

    keep2 = keepM[rsel]                        # (act_cap, M)
    cand2 = nbr.cand_idx[rsel]
    rvalid = jnp.arange(act_cap) < jnp.sum(rgrant.astype(jnp.int32))
    keep2 = keep2 & rvalid[:, None]

    F = keep2.reshape(-1)
    rank = jnp.cumsum(F.astype(jnp.int32)) - 1
    granted = F & (rank < cap)
    sel = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(granted, rank, cap)].set(
        jnp.arange(F.shape[0], dtype=jnp.int32), mode='drop')
    npair = jnp.sum(granted.astype(jnp.int32))
    pvalid = jnp.arange(cap) < npair
    me = rsel[jnp.minimum(sel // M, act_cap - 1)]
    other = cand2.reshape(-1)[sel]
    overflow = row_overflow * M + jnp.sum((F & ~granted).astype(jnp.int32))
    return me, other, pvalid, overflow, skin_dropped


def _pair_keep_mask(st, nbr, cfg: IcebergsConfig = None, dt=None):
    """The frozen substep-contact candidate mask (N, M) shared by
    :func:`compact_conglom_pairs` and :func:`auto_pair_cap`: valid
    same-conglomerate candidates, minus the velocity/acceleration-skin
    prefilter when configured.  Returns ``(keepM, skin_dropped)``."""
    same = st.conglom_id[:, None] == st.conglom_id[nbr.cand_idx]
    keepM = nbr.cand_valid & same
    skin_dropped = jnp.zeros((), jnp.int32)
    if cfg is not None and dt is not None and cfg.mts_pair_skin > 0.:
        other = nbr.cand_idx
        from .grid import convert_from_grid_to_meters
        lat_ref = 0.5 * (st.lat[:, None] + st.lat[other])
        dxl, dyl = convert_from_grid_to_meters(lat_ref, cfg.grid_is_latlon,
                                               cfg.Rearth)
        rx = (st.lon[:, None] - st.lon[other]) * dxl
        ry = (st.lat[:, None] - st.lat[other]) * dyl
        r2 = rx * rx + ry * ry
        if cfg.constant_interaction_LW:
            A1 = jnp.full_like(st.lon, cfg.constant_length
                               * cfg.constant_width)
        else:
            A1 = st.length * st.width
        import math as _m
        if cfg.hexagonal_icebergs:
            rad = jnp.sqrt(A1 / (2. * _m.sqrt(3.)))
        elif cfg.iceberg_bonds_on:
            rad = 0.5 * jnp.sqrt(A1)
        else:
            rad = jnp.sqrt(A1 / _m.pi)
        # DEM/MTS contact engages at r < R1+R2 (dem.py:267,369;
        # use_c_crit_dist pair forces likewise) — contact_distance does
        # NOT enter.  Skin = mts_pair_skin x the worst INTERNAL closing
        # speed of any conglomerate (|v - own conglomerate's mean
        # velocity|) over the outer step, +5%, plus a fracture-release
        # acceleration term: same-conglomerate pairs share the advection
        # velocity, so the skin stays near zero for rigidly drifting
        # rafts and the frozen list stays near touching size.
        crit = rad[:, None] + rad[other]
        cid = jnp.maximum(st.conglom_id, 0)
        ncid = int(st.capacity)          # ids bounded by slot count
        w = jnp.where(st.alive, 1., 0.)
        su = jnp.zeros((ncid,), st.uvel.dtype).at[cid].add(w * st.uvel)
        sv = jnp.zeros((ncid,), st.uvel.dtype).at[cid].add(w * st.vvel)
        sn = jnp.zeros((ncid,), st.uvel.dtype).at[cid].add(w)
        mu = su[cid] / jnp.maximum(sn[cid], 1.)
        mv = sv[cid] / jnp.maximum(sn[cid], 1.)
        vint = jnp.sqrt((st.uvel - mu) ** 2 + (st.vvel - mv) ** 2)
        vint_max = jnp.max(jnp.where(st.alive, vint, 0.))
        # acceleration floor: a bond fracturing mid-outer-step releases at
        # most its fracture-threshold force (break_bonds_dem breaks at
        # stress >= frac_thres * scaling; bond area ~ 2R*T), so a fragment
        # of a raft at rest can close at most ~a_rel*dt^2 within the step
        a_rel = jnp.zeros((), rad.dtype)
        if cfg.dem and cfg.fracture_criterion != 'none':
            sig = max(cfg.frac_thres_n, cfg.frac_thres_t) \
                * cfg.frac_thres_scaling
            if cfg.constant_interaction_LW:
                Mb = (cfg.constant_length * cfg.constant_width
                      * st.thickness * cfg.rho_bergs)
            else:
                Mb = st.mass
            a_berg = sig * 2. * rad * st.thickness / jnp.maximum(Mb, 1.)
            a_rel = jnp.max(jnp.where(st.alive, a_berg, 0.))
        reach = 1.05 * crit + cfg.mts_pair_skin * vint_max * dt \
            + a_rel * dt * dt
        drop = keepM & (r2 > reach * reach)
        skin_dropped = jnp.sum(drop.astype(jnp.int32))
        keepM = keepM & ~drop
    return keepM, skin_dropped


def auto_pair_cap(st, nbr, cfg: IcebergsConfig, *, safety: float = 4.0,
                  minimum: int = 2048, multiple: int = 1024) -> int:
    """Host-side sizing of the frozen substep pair-list capacity from the
    CONCRETE initial state (call EAGERLY, before tracing): counts the
    skin-filtered candidate pairs and rounds ``safety`` x the count up to
    a ``multiple``.  The safety factor covers compaction growth during
    the run (spawned bergs, conglomerates drifting into contact); actual
    overflow is still counted per step (``MtsDiags.pair_overflow``) so an
    undersized cap is detected, never silent."""
    import numpy as _np
    keepM, _ = _pair_keep_mask(st, nbr, cfg, cfg.dt)
    n = int(_np.asarray(jnp.sum(keepM.astype(jnp.int32))))
    cap = max(minimum, int(_np.ceil(safety * max(n, 1) / multiple))
              * multiple)
    return min(cap, keepM.shape[0] * keepM.shape[1])


def _pair_contact_masks(st, me, other, pvalid, cfg: IcebergsConfig):
    """Per-substep dynamic part of _contact_masks on the pair list."""
    unbroken_partner = jnp.any(
        (st.bond_idx[me] == other[:, None])
        & (st.bond_broken[me] != 1), axis=-1)
    m = pvalid & ~unbroken_partner & (st.n_bonds[other] < cfg.max_bonds)
    if cfg.dem:
        m = m & (st.n_bonds[me] < cfg.max_bonds)
    return m


def _substep_forces(st, nbr, cfg: IcebergsConfig, dt, onehot=None,
                    pairs=None, part_static=None):
    """One substep's bond + contact accelerations (explicit inner MTS).

    Returns (axn, ayn, ang_accel, new bond bookkeeping)."""
    if cfg.dem:
        part = _dem.bond_partner_fields(st, onehot=onehot,
                                        static=part_static)
        out = _dem.dem_bond_forces(st, cfg, dt, part=part)
        IA_x, IA_y, IAd_x, IAd_y = (jnp.zeros_like(st.uvel),) * 4
        if cfg.use_broken_bonds_for_substep_contact:
            # contact only through broken-bond pairs; partner fields
            # shared with the bond kernel (one gather per substep)
            bo = jnp.maximum(st.bond_idx, 0)
            bm = (st.bond_idx >= 0) & (st.bond_broken == 1) \
                & st.alive[:, None] & st.alive[bo]
            cIA_x, cIA_y, cIAd_x, cIAd_y = _dem.dem_contact_forces(
                st, cfg, bo, bm, part=part)
        else:
            if pairs is not None:
                me, po, pvalid = pairs
                pm = _pair_contact_masks(st, me, po, pvalid, cfg)
                cIA_x, cIA_y, cIAd_x, cIAd_y = \
                    _dem.dem_contact_forces_pairs(st, cfg, me, po, pm)
            else:
                m = _contact_masks(st, nbr, cfg)
                cIA_x, cIA_y, cIAd_x, cIAd_y = _dem.dem_contact_forces(
                    st, cfg, nbr.cand_idx, m)
            # broken-bond pairs also collide (icebergs.F90:1789-1792)
            bo = jnp.maximum(st.bond_idx, 0)
            bm = (st.bond_idx >= 0) & (st.bond_broken == 1) \
                & st.alive[:, None] & st.alive[bo]
            bIA = _dem.dem_contact_forces(st, cfg, bo, bm, part=part)
            cIA_x, cIA_y = cIA_x + bIA[0], cIA_y + bIA[1]
            cIAd_x, cIAd_y = cIAd_x + bIA[2], cIAd_y + bIA[3]
        IA_x, IA_y = IA_x + cIA_x, IA_y + cIA_y
        IAd_x, IAd_y = IAd_x + cIAd_x, IAd_y + cIAd_y

        M = st.mass
        if cfg.constant_interaction_LW:
            M = cfg.constant_length * cfg.constant_width * st.thickness \
                * cfg.rho_bergs
            A0 = cfg.constant_length * cfg.constant_width
        else:
            A0 = st.length * st.width
        if cfg.hexagonal_icebergs:
            R1 = jnp.sqrt(A0 / (2. * jnp.sqrt(jnp.asarray(3., M.dtype))))
        else:
            R1 = 0.5 * jnp.sqrt(A0)

        F_x, F_y = out.F_x, out.F_y
        Fd_x, Fd_y = out.Fd_x, out.Fd_y
        T, T_d = out.T, out.T_d
        if cfg.dem_beam_test > 0:
            F_x, F_y, Fd_y = _apply_beam_loads(st, cfg, F_x, F_y, Fd_y)

        IA_x = IA_x + F_x / M
        IA_y = IA_y + F_y / M
        IAd_x = IAd_x + Fd_x / M
        IAd_y = IAd_y + Fd_y / M
        ang_accel = (T + T_d) / (0.5 * M * R1 ** 2)
        bond_updates = out
    else:
        # non-DEM MTS: bond spring forces via calculate_force (bonded=True)
        bo, bv = _forces.bond_partner_table(st)
        ia_b = _forces.pair_forces(st, cfg, bo, bv, bonded=True,
                                   use_c_crit_dist=False,
                                   u0=st.uvel, v0=st.vvel,
                                   u1=st.uvel, v1=st.vvel)
        m = _contact_masks(st, nbr, cfg)
        ia_c = _forces.pair_forces(st, cfg, nbr.cand_idx, m, bonded=False,
                                   use_c_crit_dist=True,
                                   u0=st.uvel, v0=st.vvel,
                                   u1=st.uvel, v1=st.vvel)
        du = st.uvel_old
        dv = st.vvel_old

        def damp(ia):
            # explicit damping: IAd = P (u_other_old - u_self_old); the
            # matrix form folds u_self via Pu - P u_self
            IAd_x = ia.Pu_x - (ia.P11 * du + ia.P12 * dv)
            IAd_y = ia.Pu_y - (ia.P21 * du + ia.P22 * dv)
            return IAd_x, IAd_y

        bdx, bdy = damp(ia_b)
        cdx, cdy = damp(ia_c)
        IA_x = ia_b.IA_x + ia_c.IA_x
        IA_y = ia_b.IA_y + ia_c.IA_y
        IAd_x, IAd_y = bdx + cdx, bdy + cdy
        ang_accel = jnp.zeros_like(IA_x)
        bond_updates = None

    axn = IA_x + IAd_x
    ayn = IA_y + IAd_y
    return axn, ayn, ang_accel, bond_updates


def _inner_accel_implicit(s, nbr, cfg: IcebergsConfig, dtf, axn_in, ayn_in):
    """Implicit inner substep acceleration (accel_mts with mts_part=3 and
    only_interactive_forces, icebergs.F90:1480-1547): interaction springs
    in axn, damping projections solved implicitly with scaling=0.5.

    Returns (ax, ay, axn, ayn, bxn, byn)."""
    scaling = 0.5
    ia_fn = _forces.make_ia_fn(s, nbr, cfg, mts_part=3)
    u_star = s.uvel + 0.5 * dtf * axn_in
    v_star = s.vvel + 0.5 * dtf * ayn_in
    uvel0, vvel0 = s.uvel, s.vvel

    ia = ia_fn(uvel0, vvel0)
    uveln, vveln = uvel0, vvel0
    ax = ay = jnp.zeros_like(u_star)
    for itloop in (1, 2):
        if itloop == 2:
            ia = ia_fn(uveln, vveln)
        RHS_x = (ia.IA_x / 2.) - scaling * (
            (ia.P11 * u_star + ia.P12 * v_star) - ia.Pu_x)
        RHS_y = (ia.IA_y / 2.) - scaling * (
            (ia.P21 * u_star + ia.P22 * v_star) - ia.Pu_y)
        A11 = 1. + scaling * dtf * ia.P11
        A22 = 1. + scaling * dtf * ia.P22
        A12 = scaling * dtf * ia.P12
        A21 = scaling * dtf * ia.P21
        detA = 1. / (A11 * A22 - A12 * A21)
        ax = detA * (A22 * RHS_x - A12 * RHS_y)
        ay = detA * (A11 * RHS_y - A21 * RHS_x)
        uveln = u_star + dtf * ax
        vveln = v_star + dtf * ay
    axn, ayn = ia.IA_x, ia.IA_y
    bxn = 2. * ax - axn
    byn = 2. * ay - ayn
    return ax, ay, axn, ayn, bxn, byn


def _apply_beam_loads(st, cfg: IcebergsConfig, F_x, F_y, Fd_y):
    """DEM beam-test loads (icebergs.F90:1861-1877): simply-supported beam
    (pinned ends, center load) or cantilever (end load).  Beam end
    coordinates come from the min/max start_lon like dem_tests_init."""
    start = jnp.min(jnp.where(st.alive, st.start_lon, jnp.inf))
    end = jnp.max(jnp.where(st.alive, st.start_lon, -jnp.inf))
    if cfg.dem_beam_test == 1:
        is_end = (st.start_lon == start) | (st.start_lon == end)
        is_mid = st.start_lon == 0.5 * (start + end)
        F_y = jnp.where(is_end, 0., F_y)
        Fd_y = jnp.where(is_end, 0., Fd_y)
        F_y = jnp.where(is_mid, F_y - 1.5e5, F_y)
    elif cfg.dem_beam_test == 2:
        is_end = st.start_lon == end
        F_y = jnp.where(is_end, F_y - 1.5e10 / 3., F_y)
    return F_x, F_y, Fd_y


def _grounding_drag_coeff(st, cfg: IcebergsConfig, area_form: str):
    """gdrag for short-step grounding / grounding torque
    (icebergs.F90:6868-6893, 6986-7034)."""
    D = (cfg.rho_bergs / C.RHO_SEAWATER) * st.thickness
    if cfg.h_to_init_grounding > 0.:
        gf = jnp.clip(1.0 - (st.od - D) / cfg.h_to_init_grounding, 0., 1.)
    else:
        gf = jnp.where(D > st.od, 1.0, 0.0)
    if cfg.constant_interaction_LW:
        MM = cfg.constant_length * cfg.constant_width * st.thickness \
            * cfg.rho_bergs
        A0 = cfg.constant_length * cfg.constant_width \
            * jnp.ones_like(st.mass)
    else:
        MM = st.mass
        A0 = st.length * st.width
    if area_form == 'rect':
        AA = A0
    else:  # disk of interaction radius
        if cfg.hexagonal_icebergs:
            R1 = jnp.sqrt(A0 / (2. * jnp.sqrt(jnp.asarray(3., A0.dtype))))
        elif cfg.iceberg_bonds_on:
            R1 = 0.5 * jnp.sqrt(A0)
        else:
            R1 = jnp.sqrt(A0 / C.PI)
        AA = C.PI * R1 ** 2
    return jnp.where(gf > 0., -cfg.cdrag_grounding * gf * AA / MM, 0.)


def evolve_icebergs_mts(st, grid: Grid, frc, cfg: IcebergsConfig,
                        pair_cap: int | None = None,
                        contact_cap: int | None = None,
                        substep_sync=None,
                        ncells_radius: int | None = None,
                        max_per_cell: int = 16,
                        neighbor_mode: str = "tables",
                        fused_kw: dict | None = None,
                        substep_kernel: str = "scan",
                        vmem_deltas=None,
                        vmem_block_n: int = 512,
                        vmem_interpret: bool = False):
    """Full MTS cycle: Part 1 slow solve, Part 2 half-kick, Part 3 substeps.

    ``pair_cap`` compacts the substep contact candidates (frozen per outer
    step) to a pair list of that capacity — see
    :func:`compact_conglom_pairs`.  Size it >= the number of
    same-conglomerate neighbor-cell pairs (~elements x conglomerate
    coordination); overflow drops the excess pairs.

    ``substep_sync`` (state -> state), if given, runs at the top of every
    substep — the ring ghost-state refresh hook for conglomerates sharded
    across devices (transfer_mts_bergs' per-substep analog when an
    aggregate exceeds one device; the ring-pipelined design slot of
    SURVEY §2.6).

    Returns (state, MtsDiags)."""
    dt = cfg.dt
    dt_2 = 0.5 * dt
    moving = st.alive & (st.static_berg < 0.5)

    def sel(new, old, m=None):
        mm = moving if m is None else m
        return jnp.where(mm, new, old)

    # neighbor tables for cross-conglomerate collisions (Part 1) and the
    # substep same-conglomerate contact masks; skipped entirely when the
    # fused Part-1 search is on and substep contacts go through the
    # broken-bond pair table (at 1M elements the (N, M) candidate slab
    # is the fixed cost the fused path exists to remove)
    need_nbr = (neighbor_mode != "fused"
                or not (cfg.dem
                        and cfg.use_broken_bonds_for_substep_contact))
    nbr = _forces.build_neighbor_tables(
        st, grid, cfg, max_per_cell=max_per_cell,
        ncells_radius=(ncells_radius if ncells_radius is not None
                       else _forces.neighbor_radius(grid, cfg))) \
        if need_nbr else None

    # ---- PART 1: slow forces --------------------------------------------
    # pair search + geometry precompute ONCE (positions are frozen during
    # the convergence loop; only *_old velocities iterate)
    p1_overflow = None
    if neighbor_mode == "fused":
        # Pallas strip search + cap-free (N, 2) eval for the
        # cross-conglomerate collision group — no (N, M) candidate slab.
        # The exact-fallback compaction cap defaults to the config's
        # growable fused_fallback_cap (the (cap, strips*W) fallback slab
        # is re-evaluated EVERY convergence iteration, so oversizing it
        # costs Part-1 time); its overflow counter is surfaced as
        # MtsDiags.p1_overflow so callers grow on evidence instead of
        # silently dropping pairs
        from .ops.fused_contact import make_ia_fn_fused_mts1
        fkw = dict(fallback_cap=cfg.fused_fallback_cap)
        fkw.update(fused_kw or {})
        part1_refresh, _p1stats = make_ia_fn_fused_mts1(
            st, grid, cfg,
            radius=(ncells_radius if ncells_radius is not None
                    else _forces.neighbor_radius(grid, cfg)),
            **fkw)
        p1_overflow = _p1stats.overflow
    else:
        part1_refresh = _forces.make_ia_fn(st, nbr, cfg, mts_part=1,
                                           contact_cap=contact_cap,
                                           return_refresh=True)

    def part1_once(s):
        return _slow_accel_mts(s, cfg, part1_refresh(s))

    conv_iters = jnp.zeros((), jnp.int32)
    if not cfg.skip_first_outer_mts_step:
        if cfg.force_convergence:
            # fixed-point iteration on V_{n+1} until the velocity-change
            # norm is below tolerance (icebergs.F90:6663-6743)
            def cond(carry):
                s, it, done = carry
                return (~done) & (it < 50)

            def body(carry):
                s, it, done = carry
                ax, ay, axn, ayn, bxn, byn, fdc = part1_once(s)
                up = sel(s.uvel + dt * ax, s.uvel_prev)
                vp = sel(s.vvel + dt * ay, s.vvel_prev)
                usum = jnp.sum(jnp.where(moving, s.uvel_old ** 2
                                         + s.vvel_old ** 2, 0.))
                usum1 = jnp.sum(jnp.where(moving, up ** 2 + vp ** 2, 0.))
                usum2 = jnp.sum(jnp.where(moving, (up - s.uvel_old) ** 2
                                          + (vp - s.vvel_old) ** 2, 0.))
                denom = jnp.sqrt(usum) + jnp.sqrt(usum1)
                normchange = jnp.where(denom > 0.,
                                       2. * jnp.sqrt(usum2) / denom, 0.)
                had_collision = jnp.any(moving & (fdc != 0.))
                done2 = (~had_collision) | (normchange
                                            < cfg.convergence_tolerance)
                s = s.replace(axn=sel(axn, s.axn), ayn=sel(ayn, s.ayn),
                              bxn=sel(bxn, s.bxn), byn=sel(byn, s.byn),
                              uvel_prev=up, vvel_prev=vp,
                              uvel_old=sel(up, s.uvel_old),
                              vvel_old=sel(vp, s.vvel_old))
                return (s, it + 1, done2)

            st, conv_iters, _ = jax.lax.while_loop(
                cond, body, (st, jnp.asarray(0), jnp.asarray(False)))
        else:
            ax, ay, axn, ayn, bxn, byn, _ = part1_once(st)
            st = st.replace(
                axn=sel(axn, st.axn), ayn=sel(ayn, st.ayn),
                bxn=sel(bxn, st.bxn), byn=sel(byn, st.byn),
                uvel=sel(st.uvel + dt * ax, st.uvel),
                vvel=sel(st.vvel + dt * ay, st.vvel))
            st = st.replace(uvel_prev=sel(st.uvel, st.uvel_prev),
                            vvel_prev=sel(st.vvel, st.vvel_prev))

        broken_total = jnp.zeros((), jnp.int32)
        if cfg.dem and not cfg.break_bonds_on_sub_steps:
            st, nb = _dem.break_bonds_dem(st, cfg)
            broken_total = broken_total + nb

        # ---- PART 2: half-kick by the slow acceleration ------------------
        u0 = st.uvel_prev + dt_2 * (st.axn + st.bxn)
        v0 = st.vvel_prev + dt_2 * (st.ayn + st.byn)
        st = st.replace(uvel=sel(u0, st.uvel), vvel=sel(v0, st.vvel),
                        uvel_old=sel(u0, st.uvel_old),
                        vvel_old=sel(v0, st.vvel_old))
        if cfg.force_convergence:
            st = st.replace(axn=sel(st.axn_fast, st.axn),
                            ayn=sel(st.ayn_fast, st.ayn),
                            bxn=sel(st.bxn_fast, st.bxn),
                            byn=sel(st.byn_fast, st.byn))
    else:
        broken_total = jnp.zeros((), jnp.int32)

    # ---- PART 3: fast substeps -------------------------------------------
    # VMEM-resident Pallas path: the whole substep loop per conglomerate
    # block, state in VMEM, partner access by static-delta rolls
    # (ops/dem_vmem.py).  The caller supplies the host-verified deltas.
    if (substep_kernel == "vmem" and substep_sync is None
            and cfg.n_sub_steps > 0 and vmem_deltas is not None):
        from .ops.dem_vmem import part3_substeps_vmem, \
            supports_vmem_substeps
        assert supports_vmem_substeps(cfg), \
            "vmem substep kernel: unsupported flag set"
        st, nb = part3_substeps_vmem(st, cfg, vmem_deltas,
                                     block_n=vmem_block_n,
                                     interpret=vmem_interpret)
        broken_total = broken_total + nb
        st = st.replace(uvel_old=sel(st.uvel, st.uvel_old),
                        vvel_old=sel(st.vvel, st.vvel_old))
        lonn, latn, i, j, xi, yj, _ = adjust_index_and_ground(
            grid, cfg, st.lon, st.lat, st.ine, st.jne)
        st = st.replace(lon=sel(lonn, st.lon), lat=sel(latn, st.lat),
                        lon_old=sel(lonn, st.lon_old),
                        lat_old=sel(latn, st.lat_old),
                        ine=jnp.where(moving, i, st.ine),
                        jne=jnp.where(moving, j, st.jne),
                        xi=sel(xi, st.xi), yj=sel(yj, st.yj))
        return st, MtsDiags(broken_bonds=broken_total,
                            conv_iters=conv_iters,
                            p1_overflow=p1_overflow)

    dtf = cfg.dt / max(cfg.n_sub_steps, 1)
    dtf_2 = 0.5 * dtf

    # MXU partner access for small-N DEM: bond topology is fixed across
    # substeps, so one-hot matmuls replace the per-substep gathers
    onehot = None
    if cfg.dem and st.capacity <= 4096:
        onehot = _dem.make_bond_onehot(st)

    # partner columns constant across substeps: one gather per OUTER step
    part_static = _dem.bond_partner_static(st, onehot=onehot) \
        if cfg.dem else None

    # frozen substep-contact pair list (candidate set is constant across
    # substeps; only breakage/slot masks change)
    pairs = None
    skin_dropped = jnp.zeros((), jnp.int32)
    pair_overflow = None
    if (pair_cap is not None and cfg.dem
            and not cfg.use_broken_bonds_for_substep_contact):
        me_p, ot_p, pv_p, pair_overflow, skin_dropped = \
            compact_conglom_pairs(st, nbr, pair_cap, cfg=cfg, dt=cfg.dt)
        pairs = (me_p, ot_p, pv_p)

    def substep(s, _):
        if substep_sync is not None:
            s = substep_sync(s)
        # drift (icebergs.F90:6790-6831)
        uvel2 = s.uvel + dtf_2 * (s.axn_fast + s.bxn_fast)
        vvel2 = s.vvel + dtf_2 * (s.ayn_fast + s.byn_fast)
        lonn, latn = _advance_position(grid, cfg, s.lon, s.lat,
                                       uvel2, vvel2, dtf)
        s = s.replace(lon=sel(lonn, s.lon), lat=sel(latn, s.lat),
                      lon_old=sel(lonn, s.lon_old),
                      lat_old=sel(latn, s.lat_old))
        # u_old <- u* for interactions; NOTE the v-component reproduces the
        # reference's use of bxn_fast (icebergs.F90:6826-6827)
        uo_ = s.uvel + dtf_2 * (s.axn_fast + s.bxn_fast)
        vo_ = s.vvel + dtf_2 * (s.ayn_fast + s.bxn_fast)
        s = s.replace(uvel_old=sel(uo_, s.uvel_old),
                      vvel_old=sel(vo_, s.vvel_old))

        # kick
        axn_in = s.axn_fast + s.bxn_fast
        ayn_in = s.ayn_fast + s.byn_fast
        uvel3 = s.uvel + dtf_2 * axn_in
        vvel3 = s.vvel + dtf_2 * ayn_in

        explicit_inner = cfg.explicit_inner_mts or cfg.dem
        if explicit_inner:
            axn, ayn, ang_accel, bu = _substep_forces(
                s, nbr, cfg, dtf, onehot=onehot, pairs=pairs,
                part_static=part_static)
            if cfg.short_step_mts_grounding:
                gdrag = _grounding_drag_coeff(s, cfg, 'rect')
                axn = axn + s.uvel * gdrag
                ayn = ayn + s.vvel * gdrag
            bxn = jnp.zeros_like(axn)
            byn = jnp.zeros_like(ayn)
            uveln = uvel3 + dtf * (0.5 * axn)
            vveln = vvel3 + dtf * (0.5 * ayn)
        else:
            # implicit inner substeps (accel_mts path), optionally iterated
            # to convergence (icebergs.F90:6833-6974)
            bu = None
            ang_accel = s.ang_accel

            def kick(sv):
                ax, ay, axn, ayn, bxn, byn = _inner_accel_implicit(
                    sv, nbr, cfg, dtf, axn_in, ayn_in)
                return uvel3 + dtf * ax, vvel3 + dtf * ay, axn, ayn, bxn, byn

            uveln, vveln, axn, ayn, bxn, byn = kick(s)
            if cfg.force_convergence:
                def cond(c):
                    sv, un, vn, _, _, _, _, it, done = c
                    return (~done) & (it < 30)

                def body(c):
                    sv, un, vn, axn, ayn, bxn, byn, it, done = c
                    sv2 = sv.replace(uvel_old=sel(un, sv.uvel_old),
                                     vvel_old=sel(vn, sv.vvel_old))
                    un2, vn2, axn2, ayn2, bxn2, byn2 = kick(sv2)
                    usum = jnp.sum(jnp.where(moving, un ** 2 + vn ** 2, 0.))
                    usum1 = jnp.sum(jnp.where(moving, un2 ** 2 + vn2 ** 2,
                                              0.))
                    usum2 = jnp.sum(jnp.where(moving, (un2 - un) ** 2
                                              + (vn2 - vn) ** 2, 0.))
                    den = jnp.sqrt(usum) + jnp.sqrt(usum1)
                    nc = jnp.where(den > 0., 2. * jnp.sqrt(usum2) / den, 0.)
                    return (sv2, un2, vn2, axn2, ayn2, bxn2, byn2, it + 1,
                            nc < cfg.convergence_tolerance)

                carry = (s, uveln, vveln, axn, ayn, bxn, byn,
                         jnp.asarray(0), jnp.asarray(False))
                (_, uveln, vveln, axn, ayn, bxn, byn, _, _) = \
                    jax.lax.while_loop(cond, body, carry)

        s = s.replace(
            axn_fast=sel(axn, s.axn_fast), ayn_fast=sel(ayn, s.ayn_fast),
            bxn_fast=sel(bxn, s.bxn_fast),
            byn_fast=sel(byn, s.byn_fast),
            uvel=sel(uveln, s.uvel), vvel=sel(vveln, s.vvel),
            uvel_old=sel(uveln, s.uvel_old),
            vvel_old=sel(vveln, s.vvel_old),
            ang_accel=sel(ang_accel, s.ang_accel))
        if bu is not None:
            bm = moving[:, None]
            s = s.replace(
                bond_length=jnp.where(bm, bu.bond_length, s.bond_length),
                bond_tangd1=jnp.where(bm, bu.tangd1, s.bond_tangd1),
                bond_tangd2=jnp.where(bm, bu.tangd2, s.bond_tangd2),
                bond_rel_rotation=jnp.where(bm, bu.rel_rotation,
                                            s.bond_rel_rotation),
                bond_nstress=jnp.where(bm, bu.nstress, s.bond_nstress),
                bond_sstress=jnp.where(bm, bu.sstress, s.bond_sstress))

        nb = jnp.zeros((), jnp.int32)
        if bu is not None and bu.broken is not None:
            # in-kernel per-substep fracture (icebergs.F90:1140-1199)
            bm = moving[:, None]
            newly = bm & (bu.broken == 1) & (s.bond_broken != 1)
            nb = nb + jnp.sum(newly.astype(jnp.int32))
            brok = jnp.where(bm, bu.broken, s.bond_broken)
            s = s.replace(
                bond_broken=brok,
                n_bonds=jnp.sum((s.bond_idx >= 0) & (brok != 1),
                                axis=1).astype(s.dtype))
        if cfg.dem:
            gdrag = _grounding_drag_coeff(s, cfg, 'disk') \
                if cfg.use_grounding_torque else jnp.zeros_like(s.ang_vel)
            av = (s.ang_vel + dtf * s.ang_accel) / (1. - gdrag * dtf)
            s = s.replace(ang_vel=sel(av, s.ang_vel),
                          rot=sel(s.rot + dtf * av, s.rot))
            if cfg.break_bonds_on_sub_steps \
                    and not cfg.use_broken_bonds_for_substep_contact:
                # idempotent partner-propagation pass (the in-kernel
                # break above already marked both directed lanes)
                s, nb2 = _dem.break_bonds_dem(s, cfg)
                nb = nb + nb2
        return s, nb

    if cfg.n_sub_steps > 0:
        st, nbroken = jax.lax.scan(substep, st, None, length=cfg.n_sub_steps)
        broken_total = broken_total + jnp.sum(nbroken)

    # finalize: re-localize on the grid (icebergs.F90:7056-7075)
    st = st.replace(uvel_old=sel(st.uvel, st.uvel_old),
                    vvel_old=sel(st.vvel, st.vvel_old))
    lonn, latn, i, j, xi, yj, _ = adjust_index_and_ground(
        grid, cfg, st.lon, st.lat, st.ine, st.jne)
    st = st.replace(lon=sel(lonn, st.lon), lat=sel(latn, st.lat),
                    lon_old=sel(lonn, st.lon_old),
                    lat_old=sel(latn, st.lat_old),
                    ine=jnp.where(moving, i, st.ine),
                    jne=jnp.where(moving, j, st.jne),
                    xi=sel(xi, st.xi), yj=sel(yj, st.yj))
    return st, MtsDiags(broken_bonds=broken_total,
                        conv_iters=conv_iters,
                        p1_overflow=p1_overflow,
                        skin_dropped=skin_dropped,
                        pair_overflow=pair_overflow)
