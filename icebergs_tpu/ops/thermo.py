"""Thermodynamics: melt laws, basal-melt boundary-layer model, rolling.

TPU-native port of ``thermodynamics`` (``src/icebergs.F90:2844-3306``),
``find_basal_melt`` / ``calculate_TFreeze`` / ``calculate_density``
(3492-3828), ``rolling`` (3307-3369) and ``fl_bits_dimensions`` (3370-3389).

The reference's per-berg linked-list loop becomes slab-wide elementwise math
plus one masked scatter-add of melt fluxes onto the grid.  Iterative solves
(3-equation interface salinity) run as fixed-trip-count masked loops, which
XLA unrolls/fuses cleanly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import IcebergsConfig


class MeltDiags(NamedTuple):
    floating_melt: jnp.ndarray   # (nx+2,ny+2) kg/m2/s
    calving_hflx: jnp.ndarray    # W/m2
    berg_melt: jnp.ndarray       # kg/m2/s
    bergy_src: jnp.ndarray
    bergy_melt: jnp.ndarray
    fl_bits_melt: jnp.ndarray
    melt_buoy: jnp.ndarray
    melt_eros: jnp.ndarray
    melt_conv: jnp.ndarray
    net_heat: jnp.ndarray        # J into ocean this step (scalar)
    nbergs_melted: jnp.ndarray
    melt_by_class: jnp.ndarray = None   # (nx+2,ny+2,nclasses) kg/m2/s
    # footloose melt splits (icebergs.F90:3145-3199)
    fl_parent_melt: jnp.ndarray = None
    fl_child_melt: jnp.ndarray = None
    melt_buoy_fl: jnp.ndarray = None
    melt_eros_fl: jnp.ndarray = None
    melt_conv_fl: jnp.ndarray = None
    # with defer_cell_cols: the 14 per-berg melt columns, to be reduced
    # by the caller inside the spreading slot-sum pass
    deferred_cols: tuple = None
    # strict per-category interval scalars (kg this step, mass_scaling
    # applied) for the budget tables (diag.report_full_budget): the
    # gridded bergy_src/bergy_melt fields LUMP the fl-bits-internal
    # erosion with the berg->bits source (matching the reference's
    # diagnostics), so exact per-category closure needs the split
    bergy_src_kg: jnp.ndarray = None       # berg mass -> bergy bits
    bergy_melt_kg: jnp.ndarray = None      # bergy bits -> ocean
    flb_bergy_melt_kg: jnp.ndarray = None  # fl bergy bits -> ocean
    berg_melt_kg: jnp.ndarray = None       # total berg mass loss (dM)
    fl_bits_melt_kg: jnp.ndarray = None    # fl-bits loss (dMfl, incl.
    #                                        the part eroded to fl bergy)
    net_melt_kg: jnp.ndarray = None        # total floating -> ocean
    flb_internal_eros_kg: jnp.ndarray = None  # fl bits -> fl bergy bits


def melt_by_class_field(st, grid, cfg: IcebergsConfig, melt_rate_w, alive):
    """Per-calving-class melt diagnostic (id_melt_by_class,
    icebergs.F90:3147-3155): class from nearest initial_mass to the berg's
    start_mass, hemisphere-dependent tables."""
    import numpy as np
    ms = jnp.asarray(np.asarray(cfg.initial_mass), st.dtype)
    mn = jnp.asarray(np.asarray(cfg.initial_mass_n
                                if cfg.separate_distrib_for_n_hemisphere
                                else cfg.initial_mass), st.dtype)
    south = st.lat < 0.
    dist_s = jnp.abs(ms[None, :] - st.start_mass[:, None])
    dist_n = jnp.abs(mn[None, :] - st.start_mass[:, None])
    k = jnp.where(south, jnp.argmin(dist_s, axis=1),
                  jnp.argmin(dist_n, axis=1)).astype(jnp.int32)
    I, J = st.ine + 1, st.jne + 1
    out = jnp.zeros((grid.nx + 2, grid.ny + 2, ms.shape[0]), st.dtype)
    return out.at[I, J, k].add(jnp.where(alive, melt_rate_w, 0.))


# --------------------------------------------------------------------------
# linear EOS and freezing point (copied-from-MOM forms, icebergs.F90:3770-3828)
# --------------------------------------------------------------------------

_DTFR_DP = -7.53e-08
_DTFR_DS = -0.0573
_TFR_S0_P0 = 0.0832


def calculate_tfreeze(S, pres):
    """Linear freezing-point of seawater (icebergs.F90:3779-3800)."""
    return (_TFR_S0_P0 + _DTFR_DS * S) + _DTFR_DP * pres


def calculate_density(T, S, rho_t0_s0, dr_dt, dr_ds):
    """Linear EOS (icebergs.F90:3802-3828)."""
    return rho_t0_s0 + dr_dt * T + dr_ds * S


# --------------------------------------------------------------------------
# 2/3-equation basal melt (Holland & Jenkins 1999 style)
# --------------------------------------------------------------------------

def find_basal_melt(cfg: IcebergsConfig, dvo, lat, salt, temp, thickness,
                    use_three_equation: bool):
    """Basal melt rate (m/s) under ice-shelf-style thermodynamics.

    Port of ``find_basal_melt`` (icebergs.F90:3492-3768): von Karman
    viscous boundary layer with molecular sublayers; the 3-equation variant
    iterates the interface salinity (fixed 20 outer x 30 inner masked
    iterations here; the reference exits early on the same tolerances).
    """
    VK = 0.40
    ZETA_N = 0.052
    RC = 0.20
    dR0_dT = -0.038357
    dR0_dS = 0.805876
    RHO_T0_S0 = 999.910681
    Salin_Ice = 0.0
    kd_molec_salt = 8.02e-10
    kd_molec_temp = 1.41e-7
    kv_molec = 1.95e-6
    Cp_ml = 3974.0
    LF = 3.335e5
    p_atm = 101325.0
    c2_3 = 2.0 / 3.0

    density_ice = cfg.rho_bergs
    Rho0 = C.RHO_SEAWATER
    Hml = 10.0
    p_int = p_atm + (C.GRAVITY * thickness * density_ice)

    Rhoml = calculate_density(temp, salt, RHO_T0_S0, dR0_dT, dR0_dS)

    I_ZETA_N = 1.0 / ZETA_N
    I_LF = 1.0 / LF
    SC = kv_molec / kd_molec_salt
    PR = kv_molec / kd_molec_temp
    I_VK = 1.0 / VK
    RhoCp = Rho0 * Cp_ml

    Gam_mol_t = 12.5 * (PR ** c2_3) - 6.
    Gam_mol_s = 12.5 * (SC ** c2_3) - 6.

    ustar = jnp.sqrt(cfg.cdrag_icebergs * (dvo ** 2 + cfg.utide_icebergs ** 2))
    ustar_h = jnp.maximum(cfg.ustar_icebergs_bg, ustar)

    if cfg.grid_is_latlon and not cfg.use_f_plane:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * lat)
    else:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * cfg.lat_ref) \
            * jnp.ones_like(lat)
    absf = jnp.abs(f_cori)
    hBL_neut = jnp.where((absf * Hml <= VK * ustar_h) | (absf == 0.),
                         Hml, (VK * ustar_h) / jnp.maximum(absf, 1e-30))
    hBL_neut_h_molec = ZETA_N * ((hBL_neut * ustar_h) / (5.0 * kv_molec))
    ln_neut = jnp.where(hBL_neut_h_molec > 1.0,
                        jnp.log(jnp.maximum(hBL_neut_h_molec, 1e-30)), 0.0)

    def gam_TS(Gam_turb):
        if cfg.const_gamma:
            I_Gam_T = cfg.Gamma_T_3EQ * jnp.ones_like(Gam_turb)
            I_Gam_S = cfg.Gamma_T_3EQ / 35. * jnp.ones_like(Gam_turb)
        else:
            I_Gam_T = 1.0 / (Gam_mol_t + Gam_turb)
            I_Gam_S = 1.0 / (Gam_mol_s + Gam_turb)
        return I_Gam_T, I_Gam_S

    out_of_bounds = jnp.zeros_like(temp, dtype=bool)
    lprec3 = jnp.zeros_like(temp)

    if use_three_equation:
        dB_dS = (C.GRAVITY / Rhoml) * dR0_dS
        dB_dT = (C.GRAVITY / Rhoml) * dR0_dT
        Gam_turb_neut = I_VK * (ln_neut + (0.5 * I_ZETA_N - 1.0))

        def outer_body(_, carry):
            (Sbdry, Sb_min, Sb_max, sb_min_set, sb_max_set, oob, done,
             lprec_acc) = carry
            tfreeze = calculate_tfreeze(Sbdry, p_int)
            dT_ustar = (temp - tfreeze) * ustar_h
            dS_ustar = (salt - Sbdry) * ustar_h

            I_Gam_T, I_Gam_S = gam_TS(Gam_turb_neut)
            wT_flux = dT_ustar * I_Gam_T
            wB_flux = dB_dS * (dS_ustar * I_Gam_S) + dB_dT * wT_flux

            # stabilizing buoyancy flux: Newton iteration on wB
            n_star_term = (ZETA_N / RC) * (hBL_neut * VK) / ustar_h ** 3

            def inner_body(_, inner):
                wB, wT, IGt, IGs, idone = inner
                I_n_star = jnp.sqrt(1.0 + n_star_term * wB)
                dIns_dwB = 0.5 * n_star_term / jnp.maximum(I_n_star, 1e-30)
                big = hBL_neut_h_molec > I_n_star ** 2
                Gam_turb = jnp.where(
                    big,
                    I_VK * ((ln_neut - 2.0 * jnp.log(jnp.maximum(I_n_star, 1e-30)))
                            + (0.5 * I_ZETA_N * I_n_star - 1.0)),
                    I_VK * (0.5 * I_ZETA_N * I_n_star - 1.0))
                dG_dwB = jnp.where(
                    big,
                    I_VK * (-2.0 / jnp.maximum(I_n_star, 1e-30)
                            + 0.5 * I_ZETA_N) * dIns_dwB,
                    I_VK * (0.5 * I_ZETA_N) * dIns_dwB)
                IGt2, IGs2 = gam_TS(Gam_turb)
                wT2 = dT_ustar * IGt2
                wB2 = dB_dS * (dS_ustar * IGs2) + dB_dT * wT2
                DwB = wB2 - wB
                conv = jnp.abs(DwB) < 1e-4 * (jnp.abs(wB2) + jnp.abs(wB))
                dDwB = -dG_dwB * (dB_dS * (dS_ustar * IGs2 ** 2)
                                  + dB_dT * (dT_ustar * IGt2 ** 2)) - 1.0
                wB_new = wB - DwB / dDwB
                upd = ~idone
                return (jnp.where(upd, wB_new, wB),
                        jnp.where(upd, wT2, wT),
                        jnp.where(upd, IGt2, IGt),
                        jnp.where(upd, IGs2, IGs),
                        idone | conv)

            need_inner = wB_flux > 0.0
            inner0 = (wB_flux, wT_flux, I_Gam_T, I_Gam_S, ~need_inner)
            wB_flux, wT_flux_i, I_Gam_T_i, I_Gam_S_i, _ = jax.lax.fori_loop(
                0, 30, inner_body, inner0)
            wT_flux = jnp.where(need_inner, wT_flux_i, wT_flux)
            I_Gam_T = jnp.where(need_inner, I_Gam_T_i, I_Gam_T)
            I_Gam_S = jnp.where(need_inner, I_Gam_S_i, I_Gam_S)

            t_flux = RhoCp * wT_flux
            exch_vel_s = ustar_h * I_Gam_S
            lprec = I_LF * t_flux

            mass_exch = exch_vel_s * Rho0
            Sbdry_it = (salt * mass_exch + Salin_Ice * lprec) \
                / (mass_exch + lprec)
            dS_it = Sbdry_it - Sbdry
            conv = jnp.abs(dS_it) < 1e-4 * (0.5 * (salt + Sbdry + 1.e-10))

            # bounds bookkeeping: detect irregular iteration (-> 2-eq fallback)
            bad_max = (dS_it < 0.) & sb_max_set & (Sbdry > Sb_max)
            bad_min = (dS_it >= 0.) & sb_min_set & (Sbdry < Sb_min)
            new_oob = oob | ((bad_max | bad_min) & ~done)

            Sb_max = jnp.where((dS_it < 0.) & ~done, Sbdry, Sb_max)
            sb_max_set = sb_max_set | ((dS_it < 0.) & ~done)
            Sb_min = jnp.where((dS_it >= 0.) & ~done, Sbdry, Sb_min)
            sb_min_set = sb_min_set | ((dS_it >= 0.) & ~done)

            upd = ~done & ~new_oob
            Sbdry = jnp.where(upd, Sbdry_it, Sbdry)
            lprec_acc = jnp.where(~done, lprec, lprec_acc)
            done = done | conv | new_oob
            return (Sbdry, Sb_min, Sb_max, sb_min_set, sb_max_set,
                    new_oob, done, lprec_acc)

        z = jnp.zeros_like(temp)
        fb = jnp.zeros_like(temp, dtype=bool)
        carry = (salt, z, z, fb, fb, fb, fb, z)
        carry = jax.lax.fori_loop(0, 20, outer_body, carry)
        (_, _, _, _, _, out_of_bounds, _, lprec3) = carry

    # 2-equation form (also the 3-equation out-of-bounds fallback)
    tfreeze2 = calculate_tfreeze(salt, p_int)
    Gam_turb = I_VK * (ln_neut + (0.5 * I_ZETA_N - 1.0))
    I_Gam_T2 = 1.0 / (Gam_mol_t + Gam_turb)
    exch_vel_t = ustar_h * I_Gam_T2
    wT_flux2 = exch_vel_t * (temp - tfreeze2)
    lprec2 = I_LF * (RhoCp * wT_flux2)

    if use_three_equation:
        lprec = jnp.where(out_of_bounds, lprec2, lprec3)
    else:
        lprec = lprec2
    return lprec / density_ice


# --------------------------------------------------------------------------
# rolling (icebergs.F90:3307-3369)
# --------------------------------------------------------------------------

def rolling(cfg: IcebergsConfig, Tn, Wn, Ln):
    """Iceberg rolling: 3 schemes, returns updated (Tn, Wn, Ln)."""
    Delta = 6.0
    Dn = (cfg.rho_bergs / C.RHO_SEAWATER) * Tn
    can = Dn > 0.

    def swap(a, b, cond):
        return jnp.where(cond, b, a), jnp.where(cond, a, b)

    if (not cfg.use_updated_rolling_scheme) and (cfg.tip_parameter < 999.):
        # Scheme 3 (legacy WM79, erroneous variant kept for compat)
        cond = can & (jnp.maximum(Wn, Ln)
                      < jnp.sqrt(0.92 * Dn ** 2 + 58.32 * Dn))
        Tn, Wn = swap(Tn, Wn, cond)
        Wn, Ln = swap(Wn, Ln, Wn > Ln)
        return Tn, Wn, Ln

    # make W the smaller horizontal dimension first
    Wn, Ln = jnp.minimum(Wn, Ln), jnp.maximum(Wn, Ln)

    if (not cfg.use_updated_rolling_scheme) and (cfg.tip_parameter >= 999.):
        # Scheme 2: corrected Weeks & Mellor
        q = cfg.rho_bergs / C.RHO_SEAWATER
        crit = (6.0 * q * (1 - q) * Tn ** 2) - (12. * Delta * q * Tn)
        cond = can & (Wn < jnp.sqrt(jnp.maximum(crit, 0.))) & (crit > 0.)
        Tn, Wn = swap(Tn, Wn, cond)
        Wn, Ln = jnp.minimum(Wn, Ln), jnp.maximum(Wn, Ln)
        return Tn, Wn, Ln

    # Scheme 1: updated (Burton et al 2012 Eq 27)
    if cfg.tip_parameter > 0.:
        tip = cfg.tip_parameter
    else:
        q = cfg.rho_bergs / C.RHO_SEAWATER
        tip = math.sqrt(6 * q * (1 - q))
    cond = can & ((tip * Tn) > Wn)
    Tn, Wn = swap(Tn, Wn, cond)
    Wn, Ln = jnp.minimum(Wn, Ln), jnp.maximum(Wn, Ln)
    return Tn, Wn, Ln


# --------------------------------------------------------------------------
# footloose-bits representative dimensions (icebergs.F90:3370-3389)
# --------------------------------------------------------------------------

_L_C = C.PI / (2. * math.sqrt(2.))
_LW_C = 1. / (C.GRAVITY * C.RHO_SEAWATER)
_B_C = 1. / (12. * (1. - 0.3 ** 2))


def fl_bits_dimensions(cfg: IcebergsConfig, thickness):
    """Representative footloose-bit berg dimensions (L, W, T)."""
    l_w = (_LW_C * cfg.fl_youngs * _B_C * thickness ** 3) ** 0.25
    l_b = _L_C * l_w
    L_fl = 3. * l_b
    W_fl = l_b
    T_fl = thickness
    T_fl, W_fl, L_fl = rolling(cfg, T_fl, W_fl, L_fl)
    return L_fl, W_fl, T_fl


# --------------------------------------------------------------------------
# the main thermodynamics pass
# --------------------------------------------------------------------------

def thermodynamics(st, grid, frc, cfg: IcebergsConfig, sort_ctx=None,
                   with_class_melt: bool = False,
                   defer_cell_cols: bool = False):
    """Melt every berg, update dimensions, roll, kill fully-melted bergs,
    and accumulate gridded melt diagnostics.

    Port of ``thermodynamics`` (icebergs.F90:2844-3306).
    """
    perday = 1. / 86400.
    dt = cfg.dt
    alive = st.alive

    SST = st.sst
    SSS = st.sss
    IC = jnp.minimum(1., st.cn + cfg.sicn_shift)
    M = st.mass
    T = st.thickness
    W = st.width
    L = st.length
    Vol = T * W * L
    I, J = st.ine + 1, st.jne + 1

    dvo = jnp.sqrt((st.uvel - st.uo) ** 2 + (st.vvel - st.vo) ** 2)
    dva = jnp.sqrt((st.ua - st.uo) ** 2 + (st.va - st.vo) ** 2)
    Ss = 1.5 * jnp.sqrt(dva) + 0.1 * dva   # sea state

    # melt laws in m/s (icebergs.F90:2915-2921)
    Mv = jnp.maximum(7.62e-3 * SST + 1.29e-3 * SST ** 2, 0.) * perday
    Lsafe = jnp.maximum(L, 1e-30)
    Mb = jnp.maximum(0.58 * dvo ** 0.8 * (SST + 4.0) / Lsafe ** 0.2, 0.) * perday
    Me = jnp.maximum((1. / 12.) * (SST + 2.) * Ss
                     * (1 + jnp.cos(C.PI * IC ** 3)), 0.) * perday

    Mv_fl, Me_fl = Mv, Me   # saved for footloose bits before bond rescaling

    N_max = cfg.n_max_bonds_shape
    N_bonds = st.n_bonds if cfg.iceberg_bonds_on else jnp.zeros_like(M)
    N_bonds = jnp.where(st.static_berg == 1., N_max, N_bonds)

    # ice-shelf-style melting (icebergs.F90:2948-2984)
    if cfg.melt_icebergs_as_ice_shelf or cfg.use_mixed_melting:
        SSS_eff = SSS if cfg.use_mixed_layer_salinity_for_thermo \
            else jnp.full_like(SSS, 35.0)
        Ms = find_basal_melt(cfg, dvo, st.lat, SSS_eff, SST, T,
                             cfg.Use_three_equation_model)
        Ms = jnp.maximum(Ms, 0.)
        if cfg.melt_cutoff >= 0. and cfg.apply_thickness_cutoff_to_bergs_melt:
            Dn0 = (cfg.rho_bergs / C.RHO_SEAWATER) * T
            thin = (grid.ocean_depth[I, J] - Dn0) < cfg.melt_cutoff
            Ms = jnp.where(thin, 0., Ms)
        if cfg.use_mixed_melting:
            frac = (N_max - N_bonds) / N_max
            Me = frac * (Mv + Me)
            Mv = jnp.zeros_like(Mv)
            Mb = frac * Mb + (N_bonds / N_max) * Ms
        else:
            Mv = jnp.zeros_like(Mv)
            Me = jnp.zeros_like(Me)
            Mb = Ms

    if cfg.set_melt_rates_to_zero:
        Mv = jnp.zeros_like(Mv)
        Mb = jnp.zeros_like(Mb)
        Me = jnp.zeros_like(Me)

    Vsafe = jnp.maximum(Vol, 1e-30)
    if cfg.use_operator_splitting:
        # operator-split volume update (icebergs.F90:2995-3013).  The
        # mass diffs are the reference's Mnew_k - Mnew_{k+1} rewritten in
        # PRODUCT form (algebraically identical): the literal subtraction
        # is catastrophic in f32 — at dt=10 s a 3.6 km berg erodes
        # ~7e-5 m/step, far below ulp(W*L), so dMe/dMv round to 0 and the
        # footloose foot (fl_k += dMe/fb, icebergs.F90:3018) never grows.
        # The reference is immune only because it compiles -r8.
        dT = jnp.minimum(Mb * dt, T)
        Tn = jnp.maximum(T - Mb * dt, 0.)
        dMb = (M / Vsafe) * (W * L) * dT
        dv = Mv * dt
        dWv = jnp.minimum(dv, W)
        dLv = jnp.minimum(dv, L)
        Ln1 = jnp.maximum(L - dv, 0.)
        Wn1 = jnp.maximum(W - dv, 0.)
        dMv = (M / Vsafe) * Tn * (dWv * L + dLv * W - dWv * dLv)
        de = Me * dt
        dWe = jnp.minimum(de, Wn1)
        dLe = jnp.minimum(de, Ln1)
        Ln = jnp.maximum(Ln1 - de, 0.)
        Wn = jnp.maximum(Wn1 - de, 0.)
        dMe = (M / Vsafe) * Tn * (dWe * Ln1 + dLe * Wn1 - dWe * dLe)
        dM = dMb + dMv + dMe
        Mnew = M - dM
    else:
        Ln = jnp.maximum(L - (Mv + Me) * dt, 0.)
        Wn = jnp.maximum(W - (Mv + Me) * dt, 0.)
        Ln1, Wn1 = Ln, Wn
        Tn = jnp.maximum(T - Mb * dt, 0.)
        Mnew = (Tn * Wn * Ln / Vsafe) * M
        dM = M - Mnew
        dMb = (M / Vsafe) * (W * L) * Mb * dt
        dMe = (M / Vsafe) * (T * (W + L)) * Me * dt
        dMv = (M / Vsafe) * (T * (W + L)) * Mv * dt

    # footloose foot-area accumulation on fl_k (icebergs.F90:3016-3036)
    fl_k = st.fl_k
    if cfg.footloose:
        l_b3 = 3. * _L_C * (_LW_C * cfg.fl_youngs * _B_C * Tn ** 3) ** 0.25
        fb = Tn * (1. - cfg.rho_bergs / C.RHO_SEAWATER)
        kd = Tn - fb
        fbs = jnp.maximum(fb, 1e-30)
        kds = jnp.maximum(kd, 1e-30)
        wide = W > l_b3
        dk_wide = (dMe / fbs - dMv / kds) / cfg.rho_bergs
        dMv_l = dMv * (Wn1 + W) / jnp.maximum(2. * (Ln1 + W), 1e-30)
        dMe_l = dMe * (Wn + Wn1) / jnp.maximum(2. * (Ln + Wn1), 1e-30)
        dk_narrow = (dMe_l / fbs - dMv_l / kds) / cfg.rho_bergs
        dk = jnp.where(wide, dk_wide, dk_narrow)
        apply = (fl_k >= 0) & (L > l_b3)
        fl_k = jnp.where(apply, jnp.maximum(fl_k + dk, 0.), fl_k)

    # footloose bits melt (icebergs.F90:3039-3082)
    has_fl = st.mass_of_fl_bits > 0.
    Lfl, Wfl, Tfl = fl_bits_dimensions(cfg, T)
    Mfl = st.mass_of_fl_bits
    Volfl = jnp.maximum(Lfl * Wfl * Tfl, 1e-30)
    Mb_fl = jnp.maximum(0.58 * dvo ** 0.8 * (SST + 4.0)
                        / jnp.maximum(Lfl, 1e-30) ** 0.2, 0.) * perday
    Tnfl = jnp.maximum(Tfl - Mb_fl * dt, 0.)
    Mnew1_fl = (Tnfl * Wfl * Lfl / Volfl) * Mfl
    dMb_fl = Mfl - Mnew1_fl
    Lnfl = jnp.maximum(Lfl - Mv_fl * dt, 0.)
    Wnfl = jnp.maximum(Wfl - Mv_fl * dt, 0.)
    Mnew2_fl = (Tnfl * Wnfl * Lnfl / Volfl) * Mfl
    dMv_fl = Mnew1_fl - Mnew2_fl
    Lnfl = jnp.maximum(Lnfl - Me_fl * dt, 0.)
    Wnfl = jnp.maximum(Wnfl - Me_fl * dt, 0.)
    Mnew_fl = (Tnfl * Wnfl * Lnfl / Volfl) * Mfl
    dMe_fl = Mnew2_fl - Mnew_fl
    dMfl = Mfl - Mnew_fl
    dMb_fl = jnp.where(has_fl, dMb_fl, 0.)
    dMv_fl = jnp.where(has_fl, dMv_fl, 0.)
    dMe_fl = jnp.where(has_fl, dMe_fl, 0.)
    dMfl = jnp.where(has_fl, dMfl, 0.)
    Mnew_fl = jnp.where(has_fl, Mnew_fl, st.mass_of_fl_bits)

    # bergy bits (icebergs.F90:3085-3131)
    if cfg.bergy_bit_erosion_fraction > 0.:
        Mbits = st.mass_of_bits
        dMbitsE = cfg.bergy_bit_erosion_fraction * dMe
        nMbits = Mbits + dMbitsE
        Lbits = jnp.minimum(jnp.minimum(L, W), jnp.minimum(T, 40.))
        Lbits = jnp.maximum(Lbits, 1e-30)
        Abits = (Mbits / cfg.rho_bergs) / Lbits
        Mbb = jnp.maximum(0.58 * dvo ** 0.8 * (SST + 2.0) / Lbits ** 0.2,
                          0.) * perday
        Mbb = cfg.rho_bergs * Abits * Mbb
        dMbitsM = jnp.minimum(Mbb * dt, nMbits)
        nMbits = nMbits - dMbitsM
        died = Mnew == 0.
        dMbitsM = jnp.where(died, dMbitsM + nMbits, dMbitsM)
        nMbits = jnp.where(died, 0., nMbits)

        Mbits_fl = st.mass_of_fl_bergy_bits
        dMbitsE_fl = jnp.where(has_fl,
                               cfg.bergy_bit_erosion_fraction * dMe_fl, 0.)
        nMbits_fl = Mbits_fl + dMbitsE_fl
        Lbits_fl = jnp.minimum(jnp.minimum(Lfl, Wfl), jnp.minimum(Tfl, 40.))
        Lbits_fl = jnp.maximum(Lbits_fl, 1e-30)
        Abits_fl = (Mbits_fl / cfg.rho_bergs) / Lbits_fl
        Mbb_fl = jnp.maximum(0.58 * dvo ** 0.8 * (SST + 2.0)
                             / Lbits_fl ** 0.2, 0.) * perday
        Mbb_fl = cfg.rho_bergs * Abits_fl * Mbb_fl
        dMbitsM_fl = jnp.where(has_fl, jnp.minimum(Mbb_fl * dt, nMbits_fl), 0.)
        nMbits_fl = nMbits_fl - dMbitsM_fl
        died_fl = Mnew_fl == 0.
        dMbitsM_fl = jnp.where(has_fl & died_fl, dMbitsM_fl + nMbits_fl,
                               dMbitsM_fl)
        nMbits_fl = jnp.where(has_fl & died_fl, 0., nMbits_fl)
        nMbits_fl = jnp.where(has_fl, nMbits_fl, st.mass_of_fl_bergy_bits)
    else:
        dMbitsE = dMbitsM = dMbitsE_fl = dMbitsM_fl = jnp.zeros_like(M)
        nMbits = st.mass_of_bits
        nMbits_fl = st.mass_of_fl_bergy_bits

    # ---- gridded melt diagnostics (masked scatter-add) --------------------
    area = jnp.maximum(grid.area[I, J], 1e-30)
    scale = st.mass_scaling
    w = jnp.where(alive, scale / (dt * area), 0.)

    shape = (grid.nx + 2, grid.ny + 2)
    dtype = M.dtype

    melt_tot = (dM - (dMbitsE - dMbitsM) + dMfl - (dMbitsE_fl - dMbitsM_fl))
    net_heat = jnp.sum(jnp.where(alive, melt_tot * st.heat_density * scale,
                                 0.))

    def _kg(x):
        return jnp.sum(jnp.where(alive, x * scale, 0.))

    budget_scalars = dict(
        bergy_src_kg=_kg(dMbitsE), bergy_melt_kg=_kg(dMbitsM),
        flb_bergy_melt_kg=_kg(dMbitsM_fl), berg_melt_kg=_kg(dM),
        fl_bits_melt_kg=_kg(dMfl), net_melt_kg=_kg(melt_tot),
        flb_internal_eros_kg=_kg(dMbitsE_fl))
    # all melt diagnostics in ONE packed row scatter (14 fields).
    # melt_buoy/eros/conv accumulate only for non-footloose bergs; the
    # *_fl twins take the fl-bits melt (parents, when dMfl>0) or the
    # child berg's own melt (fl_k<0) — icebergs.F90:3145-3199.
    parent = fl_k >= 0.
    child_melt = jnp.where(parent, dMfl - (dMbitsE_fl - dMbitsM_fl),
                           dM - (dMbitsE - dMbitsM))
    fl_gate = parent & (dMfl > 0.)
    cols = [melt_tot * w, melt_tot * st.heat_density * w, dM * w,
            (dMbitsE + dMbitsE_fl) * w, (dMbitsM + dMbitsM_fl) * w,
            dMfl * w,
            jnp.where(parent, dMb, 0.) * w,
            jnp.where(parent, dMe, 0.) * w,
            jnp.where(parent, dMv, 0.) * w,
            jnp.where(parent, dM - (dMbitsE - dMbitsM), 0.) * w,
            child_melt * w,
            jnp.where(fl_gate, dMb_fl, jnp.where(parent, 0., dMb)) * w,
            jnp.where(fl_gate, dMe_fl, jnp.where(parent, 0., dMe)) * w,
            jnp.where(fl_gate, dMv_fl, jnp.where(parent, 0., dMv)) * w]
    cols = [jnp.where(alive, v, 0.) for v in cols]
    deferred = None
    if defer_cell_cols and cfg.parallel_reprod:
        # the caller folds these 14 columns into the spreading slot-sum
        # pass (same sort_ctx scatter indices -> per-column bits
        # unchanged); gridded fields come back through MeltDiags._replace
        deferred = cols
        (floating_melt, calving_hflx, berg_melt, bergy_src, bergy_melt,
         fl_bits_melt, melt_buoy, melt_eros, melt_conv, fl_parent_melt,
         fl_child_melt, melt_buoy_fl, melt_eros_fl, melt_conv_fl) = \
            [None] * 14
    elif cfg.parallel_reprod:
        # fixed-tree per-cell sums in (cell, id) order: melt fields hash
        # identically on any device layout (parallel_reprod)
        from .spread import scatter_cell_deterministic
        (floating_melt, calving_hflx, berg_melt, bergy_src, bergy_melt,
         fl_bits_melt, melt_buoy, melt_eros, melt_conv, fl_parent_melt,
         fl_child_melt, melt_buoy_fl, melt_eros_fl, melt_conv_fl) = \
            scatter_cell_deterministic(grid, st, cols, alive,
                                       K=cfg.reprod_max_per_cell,
                                       sort_ctx=sort_ctx,
                                       method=cfg.slot_sum_method_eff)
    else:
        vals = jnp.stack(cols, axis=-1)
        packed = jnp.zeros(shape + (len(cols),), dtype).at[I, J].add(vals)
        (floating_melt, calving_hflx, berg_melt, bergy_src, bergy_melt,
         fl_bits_melt, melt_buoy, melt_eros, melt_conv, fl_parent_melt,
         fl_child_melt, melt_buoy_fl, melt_eros_fl, melt_conv_fl) = [
            packed[..., k] for k in range(len(cols))]

    # rolling for unbonded bergs (icebergs.F90:3140)
    if cfg.allow_bergs_to_roll:
        Tr, Wr, Lr = rolling(cfg, Tn, Wn, Ln)
        roll_ok = N_bonds == 0.
        Tn = jnp.where(roll_ok, Tr, Tn)
        Wn = jnp.where(roll_ok, Wr, Wn)
        Ln = jnp.where(roll_ok, Lr, Ln)

    if cfg.Iceberg_melt_without_decay:
        # fluxes enter the ocean but berg shape is unchanged
        pass  # state stays as-is; diagnostics above already computed
    else:
        st = st.replace(
            mass=jnp.where(alive, Mnew, st.mass),
            mass_of_bits=jnp.where(alive, nMbits, st.mass_of_bits),
            mass_of_fl_bits=jnp.where(alive, Mnew_fl, st.mass_of_fl_bits),
            mass_of_fl_bergy_bits=jnp.where(alive, nMbits_fl,
                                            st.mass_of_fl_bergy_bits),
            thickness=jnp.where(alive, Tn, st.thickness),
            width=jnp.where(alive, jnp.minimum(Wn, Ln), st.width),
            length=jnp.where(alive, jnp.maximum(Wn, Ln), st.length),
            fl_k=jnp.where(alive, fl_k, st.fl_k))

    # death / promotion of footloose bits (icebergs.F90:3225-3262)
    if cfg.Iceberg_melt_without_decay:
        melted = jnp.zeros_like(alive)
    else:
        melted = alive & (Mnew <= 0.)
    promote = melted & (Mnew_fl > 0.)
    kill = melted & ~promote

    if cfg.footloose:
        new_mass = Lnfl * Wnfl * Tnfl * cfg.rho_bergs
        nm = jnp.maximum(new_mass, 1e-30)
        new_scaling = Mnew_fl * st.mass_scaling / nm
        nMbits_fl_scaled = nMbits_fl * st.mass_scaling / jnp.maximum(
            new_scaling, 1e-30)
        st = st.replace(
            mass=jnp.where(promote, new_mass, st.mass),
            length=jnp.where(promote, Lnfl, st.length),
            width=jnp.where(promote, Wnfl, st.width),
            thickness=jnp.where(promote, Tnfl, st.thickness),
            mass_scaling=jnp.where(promote, new_scaling, st.mass_scaling),
            mass_of_bits=jnp.where(promote, nMbits_fl_scaled,
                                   st.mass_of_bits),
            mass_of_fl_bits=jnp.where(promote, 0., st.mass_of_fl_bits),
            mass_of_fl_bergy_bits=jnp.where(promote, 0.,
                                            st.mass_of_fl_bergy_bits),
            fl_k=jnp.where(promote, -1., st.fl_k))

    st = st.replace(alive=st.alive & ~kill)
    nbergs_melted = jnp.sum(melted.astype(jnp.int32))

    # computed only when the diagnostic is requested (the reference gates
    # on id_melt_by_class > 0)
    mbc = melt_by_class_field(st, grid, cfg, melt_tot * w, alive) \
        if with_class_melt else None
    diags = MeltDiags(
        floating_melt=floating_melt, calving_hflx=calving_hflx,
        berg_melt=berg_melt, bergy_src=bergy_src, bergy_melt=bergy_melt,
        fl_bits_melt=fl_bits_melt, melt_buoy=melt_buoy, melt_eros=melt_eros,
        melt_conv=melt_conv, net_heat=net_heat, nbergs_melted=nbergs_melted,
        melt_by_class=mbc,
        fl_parent_melt=fl_parent_melt, fl_child_melt=fl_child_melt,
        melt_buoy_fl=melt_buoy_fl, melt_eros_fl=melt_eros_fl,
        melt_conv_fl=melt_conv_fl, deferred_cols=deferred,
        **budget_scalars)
    return st, diags
