"""Time stepping: Verlet / RK4 evolution and position bookkeeping.

TPU-native port of ``evolve_icebergs`` / ``verlet_stepping`` /
``Runge_Kutta_stepping`` / ``update_verlet_position`` /
``adjust_index_and_ground`` (``src/icebergs.F90:7081-8100``).  The per-berg
linked-list loops become slab-wide array ops; the bounded cell-walk in
``adjust_index_and_ground`` becomes a fixed 4x unrolled masked update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import constants as C
from .config import IcebergsConfig
from .grid import (Grid, apply_modulo_around_point, cell_to_pos,
                   convert_from_meters_to_grid)
from .ops.accel import accel
from .ops.interp import interp_flds, Env

POSN_EPS = 0.05  # pushback after a coast bounce (icebergs.F90:7836)


# --------------------------------------------------------------------------
# position bookkeeping
# --------------------------------------------------------------------------

def _frac_coords(grid: Grid, cfg: IcebergsConfig, lon, lat):
    """Global fractional cell coordinates on the regular grid."""
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.0
    cx = apply_modulo_around_point(
        lon, grid.lon0 + 0.5 * grid.dlon * grid.nx, Lx)
    fx = (cx - grid.lon0) / grid.dlon
    fy = (lat - grid.lat0) / grid.dlat
    return fx, fy


def _cell_to_pos_curvilinear(grid: Grid, cfg: IcebergsConfig, i, j, xi, yj):
    """Bilinear quad map (xi, yj) -> position from the cell corners (the
    inverse of calc_xiyj; yj2x/xi2y in pos_within_cell,
    icebergs_framework.F90:6350-6364)."""
    from .geometry import cell_corners
    from .grid import apply_modulo_around_point
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    x1, x2, x3, x4, y1, y2, y3, y4 = cell_corners(grid, i, j)
    x2 = apply_modulo_around_point(x2, x1, Lx)
    x3 = apply_modulo_around_point(x3, x1, Lx)
    x4 = apply_modulo_around_point(x4, x1, Lx)
    w1 = (1. - xi) * (1. - yj)
    w2 = xi * (1. - yj)
    w3 = xi * yj
    w4 = (1. - xi) * yj
    return (w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4,
            w1 * y1 + w2 * y2 + w3 * y3 + w4 * y4)


def adjust_index_and_ground_curvilinear(grid: Grid, cfg: IcebergsConfig,
                                        lon, lat, i, j):
    """Curvilinear-grid re-localization: the general quad-cell walk of
    ``adjust_index_and_ground`` (icebergs.F90:7819-8100) driven by
    ``pos_within_cell``'s calc_xiyj coordinates instead of global
    fractional coordinates.  Active when ``cfg.grid_is_regular`` is False
    (grid_is_regular, icebergs_framework.F90:749)."""
    from .geometry import pos_within_cell_curvilinear
    Lx = cfg.Lx if cfg.grid_is_latlon else -1.
    msk = grid.msk
    bounced = jnp.zeros(lon.shape, bool)

    for _ in range(4):  # icount<4 walk (icebergs.F90:7941)
        xi, yj, in_cell = pos_within_cell_curvilinear(grid, lon, lat, i, j,
                                                      Lx)
        move_w = xi < 0.
        move_e = xi >= 1.
        ti = jnp.clip(i - move_w.astype(jnp.int32)
                      + move_e.astype(jnp.int32), 0, grid.nx - 1)
        ocean_x = msk[ti + 1, j + 1] > 0.
        stepped_x = (~in_cell) & (move_w | move_e)
        b_x = stepped_x & ((~ocean_x) | (ti == i))
        i = jnp.where(stepped_x & ocean_x, ti, i)

        move_s = yj < 0.
        move_n = yj >= 1.
        tj = jnp.clip(j - move_s.astype(jnp.int32)
                      + move_n.astype(jnp.int32), 0, grid.ny - 1)
        ocean_y = msk[i + 1, tj + 1] > 0.
        stepped_y = (~in_cell) & (move_s | move_n)
        b_y = stepped_y & ((~ocean_y) | (tj == j))
        j = jnp.where(stepped_y & ocean_y, tj, j)

        newly_bounced = b_x | b_y
        bounced = bounced | newly_bounced

        xi2, yj2, _ = pos_within_cell_curvilinear(grid, lon, lat, i, j, Lx)
        xi_c = jnp.clip(xi2, POSN_EPS, 1. - POSN_EPS)
        yj_c = jnp.clip(yj2, POSN_EPS, 1. - POSN_EPS)
        blon, blat = _cell_to_pos_curvilinear(grid, cfg, i, j, xi_c, yj_c)
        lon = jnp.where(newly_bounced, blon, lon)
        lat = jnp.where(newly_bounced, blat, lat)

    # final safety clamp (icebergs.F90:8058-8066)
    xi, yj, _ = pos_within_cell_curvilinear(grid, lon, lat, i, j, Lx)
    bad = (xi < 0.) | (xi >= 1.) | (yj <= 0.) | (yj > 1.)
    xi_c = jnp.clip(xi, POSN_EPS, 1. - POSN_EPS)
    yj_c = jnp.clip(yj, POSN_EPS, 1. - POSN_EPS)
    clon, clat = _cell_to_pos_curvilinear(grid, cfg, i, j, xi_c, yj_c)
    lon = jnp.where(bad, clon, lon)
    lat = jnp.where(bad, clat, lat)
    xi = jnp.where(bad, xi_c, xi)
    yj = jnp.where(bad, yj_c, yj)
    return lon, lat, i, j, xi, yj, bounced


def _msk25_table(msk):
    """(nx+6, ny+6) int32 table: bit (dy+2)*5+(dx+2) of cell (p, q) is
    msk2[p+dx, q+dy] > 0 on a 2-ring zero-padded mask, so one gather at
    an anchor cell answers ocean/land for every offset within +-2."""
    msk2 = jnp.pad(msk, 2)               # extra rings read as land
    m25 = jnp.zeros(msk2.shape, jnp.int32)
    kbit = 0
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            nb = jnp.roll(msk2, (-dx, -dy), (0, 1)) > 0.
            m25 = m25 | (nb.astype(jnp.int32) << kbit)
            kbit += 1
    return m25


def _msk81_rows(msk):
    """(9, nx+10, ny+10) int32 rows: row k, bit (dx+4) of cell (p, q) is
    msk4[p+dx, q+(k-4)] > 0 on a 4-ring zero-padded mask — the 9x9
    ocean/land neighborhood of an anchor cell as nine 9-bit integers
    (each < 2^9, exact through an f32 table row).  Covers every offset
    a 4-iteration walk can reach, so a walk seeded with these rows
    needs NO mid-walk re-anchor gather."""
    msk4 = jnp.pad(msk, 4)               # extra rings read as land
    rows = []
    for dy in range(-4, 5):
        r = jnp.zeros(msk4.shape, jnp.int32)
        for dx in range(-4, 5):
            nb = jnp.roll(msk4, (-dx, -dy), (0, 1)) > 0.
            r = r | (nb.astype(jnp.int32) << (dx + 4))
        rows.append(r)
    return jnp.stack(rows)


def _walk4(grid: Grid, cfg: IcebergsConfig, lon, lat, i, j, fx, fy,
           m25_tab, m25_pre=None, m81_pre=None):
    """The 4-iteration masked land-bounce walk — the bitwise core of
    :func:`adjust_index_and_ground` (icebergs.F90:7941-8057) — on
    whatever row set it is given.  Returns
    ``(lon, lat, i, j, fx, fy, bounced)``.

    ``m25_pre``: the first anchor's packed mask, precomputed (the
    sorted-frame interp kernel extracts it for free at the same cell) —
    skips one (N,) table gather; iteration 3's re-anchor still gathers.

    ``m81_pre``: (9, N) packed 9x9 anchor rows (:func:`_msk81_rows`
    values at the start cell, extracted for free by the table interp) —
    the walk then runs GATHER-FREE: the same mask bits come from
    elementwise row selects instead of the iteration-3 re-anchor
    gather.  Bitwise-identical walk decisions (same underlying msk
    cells; offsets never exceed +-4)."""
    dtype = lon.dtype
    bounced = jnp.zeros(lon.shape, bool)

    use81 = m81_pre is not None
    if use81:
        def bit81(oi_off, oj_off):
            row = jnp.zeros_like(i)
            for k in range(9):
                row = jnp.where(oj_off == k - 4, m81_pre[k], row)
            return ((row >> (oi_off + 4)) & 1) > 0
        m25 = None
    else:
        m25 = m25_tab[i + 3, j + 3] if m25_pre is None else m25_pre
    oi = jnp.zeros_like(i)               # current offset from the anchor
    oj = jnp.zeros_like(j)

    for it in range(4):  # icount<4 walk (icebergs.F90:7941)
        if it == 2 and not use81:
            # re-anchor: offsets would exceed +-2 otherwise
            m25 = m25_tab[i + 3, j + 3]
            oi = jnp.zeros_like(i)
            oj = jnp.zeros_like(j)

        xi = fx - i.astype(dtype)
        yj = fy - j.astype(dtype)
        in_cell = (xi >= 0.) & (xi < 1.) & (yj >= 0.) & (yj < 1.)

        # x-direction walk / bounce
        move_w = xi < 0.
        move_e = xi >= 1.
        ti = jnp.clip(i - move_w.astype(jnp.int32) + move_e.astype(jnp.int32),
                      0, grid.nx - 1)
        dix = ti - i                     # in {-1, 0, 1}
        if use81:
            ocean_x = bit81(oi + dix, oj)
        else:
            ocean_x = ((m25 >> ((oj + 2) * 5 + oi + dix + 2)) & 1) > 0
        stepped_x = (~in_cell) & (move_w | move_e)
        b_x = stepped_x & ((~ocean_x) | (ti == i))
        moved_x = stepped_x & ocean_x
        i = jnp.where(moved_x, ti, i)
        oi = jnp.where(moved_x, oi + dix, oi)

        # y-direction walk / bounce (uses the updated i, like the
        # reference)
        move_s = yj < 0.
        move_n = yj >= 1.
        tj = jnp.clip(j - move_s.astype(jnp.int32) + move_n.astype(jnp.int32),
                      0, grid.ny - 1)
        djy = tj - j
        if use81:
            ocean_y = bit81(oi, oj + djy)
        else:
            ocean_y = ((m25 >> ((oj + djy + 2) * 5 + oi + 2)) & 1) > 0
        stepped_y = (~in_cell) & (move_s | move_n)
        b_y = stepped_y & ((~ocean_y) | (tj == j))
        moved_y = stepped_y & ocean_y
        j = jnp.where(moved_y, tj, j)
        oj = jnp.where(moved_y, oj + djy, oj)

        newly_bounced = b_x | b_y
        bounced = bounced | newly_bounced

        # after a bounce, clamp intra-cell coords and move the berg there
        xi = fx - i.astype(dtype)
        yj = fy - j.astype(dtype)
        xi_c = jnp.clip(xi, POSN_EPS, 1. - POSN_EPS)
        yj_c = jnp.clip(yj, POSN_EPS, 1. - POSN_EPS)
        blon, blat = cell_to_pos(grid, i, j, xi_c, yj_c)
        lon = jnp.where(newly_bounced, blon, lon)
        lat = jnp.where(newly_bounced, blat, lat)
        fx = jnp.where(newly_bounced, i.astype(dtype) + xi_c, fx)
        fy = jnp.where(newly_bounced, j.astype(dtype) + yj_c, fy)

    return lon, lat, i, j, fx, fy, bounced


# walk compaction: rows already inside their cell never change during the
# walk (steps/bounces fire only on ~in_cell rows), so at production scale
# the 4-iteration walk runs on the compacted ~9% of movers only and folds
# back through a rank table; a lax.cond falls back to the dense walk if
# the movers overflow the static cap (exactness guard)
# Mover compaction DISABLED by default: the same-window TPU A/B at 1M
# bergs (tools/profile_phases.py, 2026-08-18) measured the compacted
# walk at 126 ms vs 32 ms dense — the compaction scatter/gather round
# trip costs 4x the dense 4-iteration walk it saves.  Kept for A/B
# (set a finite threshold to re-enable).
WALK_COMPACT_MIN_N = 1 << 60
# cap = N // FRAC.  At dt=600 s and ~0.3 m/s drift on 2 km cells the
# mover fraction is ~12%; N/4 leaves ample headroom before the dense
# fallback fires (the fallback stays exact either way)
WALK_COMPACT_FRAC = 4
WALK_COMPACT_CAP_FLOOR = 4096


def _walk4_compact(grid: Grid, cfg: IcebergsConfig, lon, lat, i, j,
                   fx, fy, m25_tab, m25_pre=None, m81_pre=None):
    """Mover-compacted :func:`_walk4`: bitwise identical outputs."""
    import jax
    N = lon.shape[0]
    cap = max(WALK_COMPACT_CAP_FLOOR, N // WALK_COMPACT_FRAC)
    dtype = lon.dtype

    xi = fx - i.astype(dtype)
    yj = fy - j.astype(dtype)
    mover = ~((xi >= 0.) & (xi < 1.) & (yj >= 0.) & (yj < 1.))
    rank = jnp.cumsum(mover.astype(jnp.int32)) - 1
    n_mov = jnp.sum(mover.astype(jnp.int32))

    def dense(args):
        return _walk4(grid, cfg, *args, m25_tab, m25_pre=m25_pre,
                      m81_pre=m81_pre)

    def compact(args):
        lon, lat, i, j, fx, fy = args
        granted = mover & (rank < cap)
        sel = jnp.zeros((cap,), jnp.int32).at[
            jnp.where(granted, rank, cap)].set(
            jnp.arange(N, dtype=jnp.int32), mode='drop')
        sub = _walk4(grid, cfg, lon[sel], lat[sel], i[sel], j[sel],
                     fx[sel], fy[sel], m25_tab,
                     m25_pre=(None if m25_pre is None
                              else m25_pre[sel]),
                     m81_pre=(None if m81_pre is None
                              else m81_pre[:, sel]))
        code = jnp.minimum(jnp.where(granted, rank, cap), cap)

        def fold(orig, s):
            tab = jnp.concatenate([s, jnp.zeros((1,), s.dtype)])
            return jnp.where(granted, tab[code], orig)

        lon2 = fold(lon, sub[0])
        lat2 = fold(lat, sub[1])
        i2 = fold(i, sub[2])
        j2 = fold(j, sub[3])
        fx2 = fold(fx, sub[4])
        fy2 = fold(fy, sub[5])
        bounced = fold(jnp.zeros(N, bool), sub[6])
        return lon2, lat2, i2, j2, fx2, fy2, bounced

    return jax.lax.cond(n_mov <= cap, compact, dense,
                        (lon, lat, i, j, fx, fy))


def adjust_index_and_ground(grid: Grid, cfg: IcebergsConfig, lon, lat,
                            i, j, m25_pre=None):
    """Re-localize bergs after motion, bouncing off land cells.

    Port of ``adjust_index_and_ground`` (icebergs.F90:7819-8100), regular
    grid path: walk at most 4 cells from the old cell toward the new
    position; where the walk would enter a land cell, clamp the position
    just inside the current cell (posn_eps pushback).  On
    ``grid_is_regular=False`` dispatches to the curvilinear quad walk.

    The 4-iteration walk needs only TWO mask gathers: a 5x5 packed-bit
    table (:func:`_msk25_table`, constant-folded for a static grid)
    anchored at the start cell covers iterations 1-2 (offsets stay
    within +-2), then one re-anchor at the updated cell covers 3-4.
    At ``N >= WALK_COMPACT_MIN_N`` the walk runs on the compacted
    movers only (bitwise identical; dense fallback on cap overflow).

    ``m25_pre`` may also be a tuple ``(m25, m81)`` (the table interp's
    walk-anchor extraction): ``m81`` (9, N) then makes the whole walk
    gather-free (see :func:`_walk4`).

    Returns (lon, lat, i, j, xi, yj, bounced).
    """
    if not cfg.grid_is_regular:
        return adjust_index_and_ground_curvilinear(grid, cfg, lon, lat,
                                                   i, j)
    dtype = lon.dtype
    m81_pre = None
    if isinstance(m25_pre, tuple):
        m25_pre, m81_pre = m25_pre

    fx, fy = _frac_coords(grid, cfg, lon, lat)
    m25_tab = _msk25_table(grid.msk)

    if lon.ndim == 1 and lon.shape[0] >= WALK_COMPACT_MIN_N:
        lon, lat, i, j, fx, fy, bounced = _walk4_compact(
            grid, cfg, lon, lat, i, j, fx, fy, m25_tab,
            m25_pre=m25_pre, m81_pre=m81_pre)
    else:
        lon, lat, i, j, fx, fy, bounced = _walk4(
            grid, cfg, lon, lat, i, j, fx, fy, m25_tab,
            m25_pre=m25_pre, m81_pre=m81_pre)

    # final safety clamp (icebergs.F90:8058-8066)
    xi = fx - i.astype(dtype)
    yj = fy - j.astype(dtype)
    bad = (xi < 0.) | (xi >= 1.) | (yj <= 0.) | (yj > 1.)
    xi_c = jnp.clip(xi, POSN_EPS, 1. - POSN_EPS)
    yj_c = jnp.clip(yj, POSN_EPS, 1. - POSN_EPS)
    clon, clat = cell_to_pos(grid, i, j, xi_c, yj_c)
    lon = jnp.where(bad, clon, lon)
    lat = jnp.where(bad, clat, lat)
    xi = jnp.where(bad, xi_c, xi)
    yj = jnp.where(bad, yj_c, yj)
    return lon, lat, i, j, xi, yj, bounced


# --------------------------------------------------------------------------
# tangential-plane transforms near the pole (icebergs.F90:7767-7818)
# --------------------------------------------------------------------------

def rotpos_to_tang(lon, lat, Rearth):
    colat = 90. - lat
    r = Rearth * (colat * C.PI_180)
    return r * jnp.cos(lon * C.PI_180), r * jnp.sin(lon * C.PI_180)


def rotpos_from_tang(x, y, Rearth):
    r = jnp.sqrt(x * x + y * y)
    lat = 90. - (C.R180_PI * r / Rearth)
    lon = C.R180_PI * jnp.arccos(jnp.clip(x / jnp.maximum(r, 1e-30), -1., 1.)) \
        * jnp.sign(y)
    return lon, lat


def rotvec_to_tang(lon, u, v):
    clon = jnp.cos(lon * C.PI_180)
    slon = jnp.sin(lon * C.PI_180)
    return -slon * u - clon * v, clon * u - slon * v


def rotvec_from_tang(lon, xdot, ydot):
    clon = jnp.cos(lon * C.PI_180)
    slon = jnp.sin(lon * C.PI_180)
    return -slon * xdot + clon * ydot, -clon * xdot - slon * ydot


def _advance_position(grid, cfg, lon, lat, u, v, dt):
    """Position update with tangential-plane handling near the pole."""
    dxdl, dydl = convert_from_meters_to_grid(lat, cfg.grid_is_latlon,
                                             cfg.Rearth)
    lonn = lon + dt * u * dxdl
    latn = lat + dt * v * dydl
    if cfg.grid_is_latlon:
        on_tang = lat > 89.
        x1, y1 = rotpos_to_tang(lon, lat, cfg.Rearth)
        xd, yd = rotvec_to_tang(lon, u, v)
        tlon, tlat = rotpos_from_tang(x1 + dt * xd, y1 + dt * yd, cfg.Rearth)
        lonn = jnp.where(on_tang, tlon, lonn)
        latn = jnp.where(on_tang, tlat, latn)
    return lonn, latn


# --------------------------------------------------------------------------
# steppers
# --------------------------------------------------------------------------

class EvolveOut(NamedTuple):
    state: object
    tickets: jnp.ndarray   # number of speeding tickets this step
    bounced: jnp.ndarray   # number of coast bounces this step


def _loc_dx(grid: Grid, i, j):
    """min(dx, dy) around the berg cell (icebergs.F90:2313)."""
    I, J = i + 1, j + 1
    return jnp.minimum(0.5 * (grid.dx[I, J] + grid.dx[I, J - 1]),
                       0.5 * (grid.dy[I, J] + grid.dy[I - 1, J]))


def _berg_kwargs(st):
    return dict(lat=st.lat, mass=st.mass, thickness=st.thickness,
                width=st.width, length=st.length, n_bonds=st.n_bonds)


def _cached_env(st) -> Env:
    return Env(uo=st.uo, vo=st.vo, ui=st.ui, vi=st.vi, ua=st.ua, va=st.va,
               ssh_x=st.ssh_x, ssh_y=st.ssh_y, sst=st.sst, sss=st.sss,
               cn=st.cn, hi=st.hi, od=st.od)


def verlet_step(st, grid: Grid, frc, cfg: IcebergsConfig, ia_fn=None,
                m25_pre=None):
    """Velocity-Verlet step (verlet_stepping + update_verlet_position).

    Port of icebergs.F90:7203-7330 and 7684-7766; see Stern et al 2017
    Appendix B for the explicit/implicit acceleration split.
    """
    dt = cfg.dt
    dt_2 = 0.5 * dt
    env = _cached_env(st)
    loc_dx = _loc_dx(grid, st.ine, st.jne)

    uvel1, vvel1 = st.uvel, st.vvel
    axn_p, ayn_p = st.axn, st.ayn           # previous-step explicit accel
    uvel_prev = uvel1 - dt_2 * st.bxn        # (icebergs.F90:7258)
    vvel_prev = vvel1 - dt_2 * st.byn

    out = accel(cfg, grid, **_berg_kwargs(st), env=env,
                uvel=uvel1, vvel=vvel1, uvel0=uvel1, vvel0=vvel1, dt=dt,
                axn_in=axn_p, ayn_in=ayn_p, loc_dx=loc_dx, ia_fn=ia_fn)

    # V_{n+1} = u* + dt*ax (Stern et al 2017 Eq B5)
    uveln = (uvel1 + dt_2 * axn_p) + dt * out.ax
    vveln = (vvel1 + dt_2 * ayn_p) + dt * out.ay
    if cfg.override_iceberg_velocities:
        uveln = jnp.full_like(uveln, cfg.u_override)
        vveln = jnp.full_like(vveln, cfg.v_override)

    moving = st.alive & (st.static_berg < 0.5)

    def sel(new, old):
        return jnp.where(moving, new, old)

    st = st.replace(
        axn=sel(out.axn, st.axn), ayn=sel(out.ayn, st.ayn),
        bxn=sel(out.bxn, st.bxn), byn=sel(out.byn, st.byn),
        uvel=sel(uveln, st.uvel), vvel=sel(vveln, st.vvel),
        uvel_prev=sel(uvel_prev, st.uvel_prev),
        vvel_prev=sel(vvel_prev, st.vvel_prev))

    # position update (update_verlet_position, icebergs.F90:7684-7766):
    # X_{n+1} = X_n + dt*(V_{n+1} + dt/2*(a_{n+1}+b_{n+1}))
    uvel2 = st.uvel + dt_2 * (st.axn + st.bxn)
    vvel2 = st.vvel + dt_2 * (st.ayn + st.byn)
    lonn, latn = _advance_position(grid, cfg, st.lon, st.lat, uvel2, vvel2, dt)
    lonn, latn, i, j, xi, yj, bounced = adjust_index_and_ground(
        grid, cfg, lonn, latn, st.ine, st.jne, m25_pre=m25_pre)

    st = st.replace(
        lon=sel(lonn, st.lon), lat=sel(latn, st.lat),
        ine=jnp.where(moving, i, st.ine), jne=jnp.where(moving, j, st.jne),
        xi=sel(xi, st.xi), yj=sel(yj, st.yj))

    tickets = jnp.sum((out.tickets & moving).astype(jnp.int32))
    nbounce = jnp.sum((bounced & moving).astype(jnp.int32))
    return EvolveOut(st, tickets, nbounce)


def rk4_step(st, grid: Grid, frc, cfg: IcebergsConfig, ia_fn=None,
             m25_pre=None):
    """4th-order Runge-Kutta step (Runge_Kutta_stepping, icebergs.F90:7331).

    With the default ``old_interp_flds_order=False`` every stage uses the
    environment cached at the step start (the reference's accel reads
    ``berg%uo`` etc.); with the flag set, fields are re-interpolated at each
    stage position.
    """
    dt = cfg.dt
    dt_2, dt_6 = 0.5 * dt, dt / 6.
    env1 = _cached_env(st)

    lon1, lat1 = st.lon, st.lat
    uvel1, vvel1 = st.uvel, st.vvel
    i1, j1 = st.ine, st.jne
    axn_p, ayn_p = st.axn, st.ayn
    moving = st.alive & (st.static_berg < 0.5)

    def metric(lat):
        return convert_from_meters_to_grid(lat, cfg.grid_is_latlon, cfg.Rearth)

    def stage_env(lon, lat, i, j, xi, yj):
        if cfg.old_interp_flds_order:
            return interp_flds(grid, frc, cfg, lon, lat, i, j, xi, yj)
        return env1

    def call_accel(envk, i, j, u, v, dtk):
        return accel(cfg, grid, **_berg_kwargs(st), env=envk,
                     uvel=u, vvel=v, uvel0=uvel1, vvel0=vvel1, dt=dtk,
                     axn_in=axn_p, ayn_in=ayn_p,
                     loc_dx=_loc_dx(grid, i, j), ia_fn=ia_fn)

    # stage 1: A1 = A(X1)
    dxdl1, dydl = metric(lat1)
    u1, v1 = uvel1 * dxdl1, vvel1 * dydl
    o1 = call_accel(env1, i1, j1, uvel1, vvel1, dt_2)

    # stage 2: X2 = X1 + dt/2 V1 ; V2 = V1 + dt/2 A1
    lon2, lat2 = _advance_position(grid, cfg, lon1, lat1, uvel1, vvel1, dt_2)
    uvel2, vvel2 = uvel1 + dt_2 * o1.ax, vvel1 + dt_2 * o1.ay
    lon2, lat2, i2, j2, xi2, yj2, b2 = adjust_index_and_ground(
        grid, cfg, lon2, lat2, i1, j1, m25_pre=m25_pre)
    dxdl2, _ = metric(lat2)
    u2, v2 = uvel2 * dxdl2, vvel2 * dydl
    o2 = call_accel(stage_env(lon2, lat2, i2, j2, xi2, yj2),
                    i2, j2, uvel2, vvel2, dt_2)

    # stage 3: X3 = X1 + dt/2 V2 ; V3 = V1 + dt/2 A2
    lon3, lat3 = _advance_position(grid, cfg, lon1, lat1, uvel2, vvel2, dt_2)
    uvel3, vvel3 = uvel1 + dt_2 * o2.ax, vvel1 + dt_2 * o2.ay
    lon3, lat3, i3, j3, xi3, yj3, b3 = adjust_index_and_ground(
        grid, cfg, lon3, lat3, i1, j1, m25_pre=m25_pre)
    dxdl3, _ = metric(lat3)
    u3, v3 = uvel3 * dxdl3, vvel3 * dydl
    o3 = call_accel(stage_env(lon3, lat3, i3, j3, xi3, yj3),
                    i3, j3, uvel3, vvel3, dt)

    # stage 4: X4 = X1 + dt V3 ; V4 = V1 + dt A3
    lon4, lat4 = _advance_position(grid, cfg, lon1, lat1, uvel3, vvel3, dt)
    uvel4, vvel4 = uvel1 + dt * o3.ax, vvel1 + dt * o3.ay
    lon4, lat4, i4, j4, xi4, yj4, b4 = adjust_index_and_ground(
        grid, cfg, lon4, lat4, i1, j1, m25_pre=m25_pre)
    dxdl4, _ = metric(lat4)
    u4, v4 = uvel4 * dxdl4, vvel4 * dydl
    o4 = call_accel(stage_env(lon4, lat4, i4, j4, xi4, yj4),
                    i4, j4, uvel4, vvel4, dt)

    # combine: Xn = X1 + dt(V1+2V2+2V3+V4)/6 ; Vn = V1 + dt(A1+2A2+2A3+A4)/6
    lonn = lon1 + dt_6 * ((u1 + u4) + 2. * (u2 + u3))
    latn = lat1 + dt_6 * ((v1 + v4) + 2. * (v2 + v3))
    uveln = uvel1 + dt_6 * ((o1.ax + o4.ax) + 2. * (o2.ax + o3.ax))
    vveln = vvel1 + dt_6 * ((o1.ay + o4.ay) + 2. * (o2.ay + o3.ay))
    axn = ((o1.axn + o4.axn) + 2. * (o2.axn + o3.axn)) / 6.
    ayn = ((o1.ayn + o4.ayn) + 2. * (o2.ayn + o3.ayn)) / 6.
    bxn = (((o1.ax + o4.ax) + 2. * (o2.ax + o3.ax)) / 6.) - axn / 2.
    byn = (((o1.ay + o4.ay) + 2. * (o2.ay + o3.ay)) / 6.) - ayn / 2.

    if cfg.override_iceberg_velocities:
        uveln = jnp.full_like(uveln, cfg.u_override)
        vveln = jnp.full_like(vveln, cfg.v_override)

    lonn, latn, i, j, xi, yj, bn = adjust_index_and_ground(
        grid, cfg, lonn, latn, i1, j1, m25_pre=m25_pre)

    def sel(new, old):
        return jnp.where(moving, new, old)

    st = st.replace(
        axn=sel(axn, st.axn), ayn=sel(ayn, st.ayn),
        bxn=sel(bxn, st.bxn), byn=sel(byn, st.byn),
        uvel=sel(uveln, st.uvel), vvel=sel(vveln, st.vvel),
        lon=sel(lonn, st.lon), lat=sel(latn, st.lat),
        ine=jnp.where(moving, i, st.ine), jne=jnp.where(moving, j, st.jne),
        xi=sel(xi, st.xi), yj=sel(yj, st.yj))

    tickets = jnp.sum(((o1.tickets | o2.tickets | o3.tickets | o4.tickets)
                       & moving).astype(jnp.int32))
    nbounce = jnp.sum(((b2 | b3 | b4 | bn) & moving).astype(jnp.int32))
    return EvolveOut(st, tickets, nbounce)


def evolve_icebergs(st, grid: Grid, frc, cfg: IcebergsConfig, ia_fn=None,
                    m25_pre=None):
    """One dynamics step for all bergs (evolve_icebergs, icebergs.F90:7081).

    After stepping, the order-invariance copies (uvel_old/lon_old...) are
    refreshed in a second pass exactly like the reference (7185-7198).
    """
    if cfg.Runge_not_Verlet:
        out = rk4_step(st, grid, frc, cfg, ia_fn=ia_fn, m25_pre=m25_pre)
    else:
        out = verlet_step(st, grid, frc, cfg, ia_fn=ia_fn,
                          m25_pre=m25_pre)
    st = out.state
    if cfg.interactive_icebergs_on:
        moving = st.alive & (st.static_berg < 0.5)

        def sel(new, old):
            return jnp.where(moving, new, old)

        st = st.replace(uvel_old=sel(st.uvel, st.uvel_old),
                        vvel_old=sel(st.vvel, st.vvel_old),
                        lon_old=sel(st.lon, st.lon_old),
                        lat_old=sel(st.lat, st.lat_old))
    return EvolveOut(st, out.tickets, out.bounced)
