"""Momentum kernel: instantaneous iceberg acceleration.

Vectorized TPU port of ``accel`` (``src/icebergs.F90:1949-2443``): Coriolis
(Crank-Nicolson for Verlet), wave-radiation force (Stern et al 2017 Eqs
A4-A5), quadratic drag against ocean/atmosphere/sea-ice, grounding drag
ramp, sea-surface slope, berg-berg interaction forces, a two-pass
predictor-corrector on the drag coefficients, and the implicit 2x2 solve
(Stern et al 2017 Eq B7).

The per-berg subroutine becomes one elementwise kernel over the whole
capacity slab; everything fuses into a handful of VPU ops under XLA.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from .. import constants as C
from ..config import IcebergsConfig


class IA(NamedTuple):
    """Interaction accelerations + damping projection (interactive_force)."""
    IA_x: jnp.ndarray
    IA_y: jnp.ndarray
    P11: jnp.ndarray
    P12: jnp.ndarray
    P21: jnp.ndarray
    P22: jnp.ndarray
    Pu_x: jnp.ndarray
    Pu_y: jnp.ndarray


def zero_ia(shape, dtype) -> IA:
    z = jnp.zeros(shape, dtype)
    return IA(z, z, z, z, z, z, z, z)


class AccelOut(NamedTuple):
    ax: jnp.ndarray
    ay: jnp.ndarray
    axn: jnp.ndarray
    ayn: jnp.ndarray
    bxn: jnp.ndarray
    byn: jnp.ndarray
    tickets: jnp.ndarray   # speeding-ticket mask (diagnostic)


def accel(cfg: IcebergsConfig, grid, *, lat, mass, thickness, width, length,
          n_bonds, env, uvel, vvel, uvel0, vvel0, dt, axn_in, ayn_in,
          loc_dx, ia_fn: Optional[Callable] = None) -> AccelOut:
    """Compute accelerations for every berg (elementwise over slabs).

    Args mirror the Fortran: ``uvel/vvel`` the latest (RK stage) velocity,
    ``uvel0/vvel0`` the start-of-step velocity, ``axn_in/ayn_in`` the
    previous step's explicit acceleration (for u*), ``ia_fn(us, vs) -> IA``
    the interactive-force closure (None when interactions are off),
    ``loc_dx`` the local min(dx, dy) for the CFL ticket diagnostic.
    """
    runge = cfg.Runge_not_Verlet
    interactive = cfg.interactive_icebergs_on and ia_fn is not None
    # Verlet requires implicit CN Coriolis + Bob's scheme (icebergs.F90:2007)
    if not runge:
        alpha, beta, C_N = 1.0, 1.0, 1.0
        unpc = True
    else:
        alpha, beta, C_N = 0.0, 1.0, 0.0
        unpc = cfg.use_new_predictive_corrective

    u_star = uvel0 + axn_in * (dt / 2.)
    v_star = vvel0 + ayn_in * (dt / 2.)

    uo, vo, ui, vi, ua, va = env.uo, env.vo, env.ui, env.vi, env.ua, env.va
    ssh_x, ssh_y = env.ssh_x, env.ssh_y
    hi, od = env.hi, env.od

    if cfg.grid_is_latlon and not cfg.use_f_plane:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * lat)
    else:
        f_cori = (2. * C.OMEGA) * jnp.sin(C.PI_180 * cfg.lat_ref) \
            * jnp.ones_like(lat)

    # clamp: dead slots carry mass 0, and the raw x/0 lanes in the
    # drag/wave terms — though masked downstream by the alive/moving
    # selects — are inf/NaN intermediates that XLA fusion rewrites can
    # leak into live lanes inside a larger jit (observed on XLA:CPU:
    # the jitted MTS step NaN'd while the de-optimized graph was
    # finite).  Bitwise identical for real bergs (M > 0).
    M = jnp.maximum(mass, 1e-30)
    T = thickness
    D = (cfg.rho_bergs / C.RHO_SEAWATER) * T     # draught (keel depth)
    F = T - D                                     # freeboard
    W = width
    L = length

    hi = jnp.minimum(hi, D)
    D_hi = jnp.maximum(0., D - hi)

    # grounding ramp (icebergs.F90:2075-2093)
    if cfg.h_to_init_grounding > 0.:
        groundfrac = jnp.clip(1.0 - (od - D) / cfg.h_to_init_grounding, 0., 1.)
    else:
        groundfrac = jnp.where(D > od, 1.0, 0.0)
    c_gnd = jnp.where(groundfrac > 0.,
                      (cfg.cdrag_grounding * W * L * groundfrac) / M, 0.)

    # wave radiation (Stern et al 2017 Eqs A4-A5; icebergs.F90:2095-2117)
    Cr0 = 0.06
    uwave = ua - uo
    vwave = va - vo
    wmod2 = uwave * uwave + vwave * vwave
    ampl = 0.5 * 0.02025 * wmod2
    Lwavelength = 0.32 * wmod2
    Lcutoff = 0.125 * Lwavelength
    Ltop = 0.25 * Lwavelength
    Cr = Cr0 * jnp.clip((L - Lcutoff) / ((Ltop - Lcutoff) + 1.e-30), 0., 1.)
    wave_rad = 0.5 * C.RHO_SEAWATER / M * Cr * C.GRAVITY * ampl \
        * jnp.minimum(ampl, F) * (2. * W * L) \
        / jnp.maximum(W + L, 1e-30)
    wmod = jnp.sqrt(ua * ua + va * va)
    nonzero_wind = wmod != 0.
    uwave = jnp.where(nonzero_wind, ua / jnp.where(nonzero_wind, wmod, 1.), 0.)
    vwave = jnp.where(nonzero_wind, va / jnp.where(nonzero_wind, wmod, 1.), 0.)
    wave_rad = jnp.where(nonzero_wind, wave_rad, 0.)

    # bonded-element side-drag reduction (icebergs.F90:2119-2135)
    if cfg.iceberg_bonds_on and cfg.internal_bergs_for_drag:
        N_max = cfg.n_max_bonds_shape
        dragfrac = (N_max - n_bonds) / N_max
    else:
        dragfrac = jnp.ones_like(M)

    # weighted drag coefficients (Stern et al 2017 Eqs A1-A3)
    c_ocn = C.RHO_SEAWATER / M * cfg.ocean_drag_scale \
        * (0.5 * C.CD_WV * dragfrac * W * D_hi + C.CD_WH * W * L)
    c_atm = C.RHO_AIR / M * (0.5 * C.CD_AV * dragfrac * W * F
                             + C.CD_AH * W * L)
    c_ice = jnp.where(jnp.abs(hi) == 0., 0.,
                      C.RHO_ICE / M * (0.5 * C.CD_IV * dragfrac * W * hi))
    c_ice = jnp.where(jnp.abs(ui) + jnp.abs(vi) == 0., 0., c_ice)

    zero = jnp.zeros_like(M)
    axn = ayn = bxn = byn = zero

    # explicit accel: surface slope + wave radiation (icebergs.F90:2146-2157)
    gx = -C.GRAVITY * ssh_x + wave_rad * uwave
    gy = -C.GRAVITY * ssh_y + wave_rad * vwave
    if not runge:
        axn, ayn = gx, gy
    else:
        bxn, byn = gx, gy

    ia = ia_fn(uvel0, vvel0) if interactive else zero_ia(M.shape, M.dtype)
    if interactive:
        if not runge:
            axn = axn + ia.IA_x
            ayn = ayn + ia.IA_y
        else:
            bxn = bxn + ia.IA_x
            byn = byn + ia.IA_y

    # Coriolis (icebergs.F90:2172-2184)
    if alpha > 0.:
        if C_N > 0.:
            axn = axn + f_cori * v_star
            ayn = ayn - f_cori * u_star
        else:
            bxn = bxn + f_cori * v_star
            byn = byn - f_cori * u_star
    else:
        bxn = bxn + f_cori * vvel
        byn = byn - f_cori * uvel

    if unpc:
        uveln, vveln = uvel0, vvel0
    else:
        uveln, vveln = uvel, vvel

    def spd(a, b):
        return jnp.sqrt(a * a + b * b)

    ax = ay = zero
    for itloop in (1, 2):   # drag predictor-corrector (icebergs.F90:2192)
        us, vs = (uvel0, vvel0) if itloop == 1 else (uveln, vveln)
        if unpc:
            drag_ocn = c_ocn * 0.5 * (spd(uveln - uo, vveln - vo)
                                      + spd(uvel0 - uo, vvel0 - vo))
            drag_atm = c_atm * 0.5 * (spd(uveln - ua, vveln - va)
                                      + spd(uvel0 - ua, vvel0 - va))
            drag_ice = c_ice * 0.5 * (spd(uveln - ui, vveln - vi)
                                      + spd(uvel0 - ui, vvel0 - vi))
        else:
            usm = 0.5 * (uveln + uvel)
            vsm = 0.5 * (vveln + vvel)
            drag_ocn = c_ocn * spd(usm - uo, vsm - vo)
            drag_atm = c_atm * spd(usm - ua, vsm - va)
            drag_ice = c_ice * spd(usm - ui, vsm - vi)
            us, vs = usm, vsm
        drag_gnd = c_gnd

        RHS_x = (axn / 2.) + bxn
        RHS_y = (ayn / 2.) + byn
        if beta > 0.:
            RHS_x = RHS_x - drag_ocn * (u_star - uo) - drag_atm * (u_star - ua) \
                - drag_ice * (u_star - ui) - drag_gnd * u_star
            RHS_y = RHS_y - drag_ocn * (v_star - vo) - drag_atm * (v_star - va) \
                - drag_ice * (v_star - vi) - drag_gnd * v_star
        else:
            RHS_x = RHS_x - drag_ocn * (uvel - uo) - drag_atm * (uvel - ua) \
                - drag_ice * (uvel - ui) - drag_gnd * uvel
            RHS_y = RHS_y - drag_ocn * (vvel - vo) - drag_atm * (vvel - va) \
                - drag_ice * (vvel - vi) - drag_gnd * vvel

        if interactive:
            if itloop > 1:
                ia = ia_fn(us, vs)
            if beta > 0.:
                RHS_x = RHS_x - ((ia.P11 * u_star + ia.P12 * v_star) - ia.Pu_x)
                RHS_y = RHS_y - ((ia.P21 * u_star + ia.P22 * v_star) - ia.Pu_y)
            else:
                RHS_x = RHS_x - ((ia.P11 * uvel + ia.P12 * vvel) - ia.Pu_x)
                RHS_y = RHS_y - ((ia.P21 * uvel + ia.P22 * vvel) - ia.Pu_y)

        if alpha + beta > 0.:
            if cfg.only_interactive_forces:
                RHS_x = (ia.IA_x / 2.) - ((ia.P11 * u_star + ia.P12 * v_star)
                                          - ia.Pu_x)
                RHS_y = (ia.IA_y / 2.) - ((ia.P21 * u_star + ia.P22 * v_star)
                                          - ia.Pu_y)
                A11 = 1. + dt * ia.P11
                A12 = dt * ia.P12
                A21 = dt * ia.P21
                A22 = 1. + dt * ia.P22
            else:
                lam = drag_ocn + drag_atm + drag_ice + drag_gnd
                A11 = 1. + beta * dt * lam
                A22 = 1. + beta * dt * lam
                A12 = -alpha * dt * f_cori
                A21 = alpha * dt * f_cori
                if C_N > 0.:
                    A12 = A12 / 2.
                    A21 = A21 / 2.
                if interactive:
                    A11 = A11 + dt * ia.P11
                    A12 = A12 + dt * ia.P12
                    A21 = A21 + dt * ia.P21
                    A22 = A22 + dt * ia.P22
            detA = 1. / ((A11 * A22) - (A12 * A21))
            ax = detA * (A22 * RHS_x - A12 * RHS_y)
            ay = detA * (A11 * RHS_y - A21 * RHS_x)
        else:
            ax, ay = RHS_x, RHS_y

        uveln = u_star + dt * ax
        vveln = v_star + dt * ay

    # recompute the explicit split (Stern et al 2017 Eq B5; icebergs.F90:2283-2305)
    if cfg.only_interactive_forces:
        axn, ayn = ia.IA_x, ia.IA_y
    else:
        axn = ayn = zero
        if not runge:
            axn = -C.GRAVITY * ssh_x + wave_rad * uwave
            ayn = -C.GRAVITY * ssh_y + wave_rad * vwave
            if interactive:
                axn = axn + ia.IA_x
                ayn = ayn + ia.IA_y
        if C_N > 0.:
            axn = axn + f_cori * vveln
            ayn = ayn - f_cori * uveln
    bxn = ax - (axn / 2.)
    byn = ay - (ayn / 2.)

    # speeding tickets (diagnostic only; icebergs.F90:2308-2330)
    speed = spd(uveln, vveln)
    new_speed = loc_dx / dt * abs(cfg.speed_limit)
    tickets = (cfg.speed_limit > 0.) & (speed > 0.) & (new_speed < speed)

    if cfg.override_iceberg_velocities:
        return AccelOut(zero, zero, zero, zero, zero, zero, tickets)
    return AccelOut(ax, ay, axn, ayn, bxn, byn, tickets)
