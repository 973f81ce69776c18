"""Field -> particle interpolation kernels (vectorized over all bergs).

TPU-native port of ``interp_flds`` (``src/icebergs.F90:4718-4969``) and the
A-grid quadratic interpolation ``quad_interp_from_agrid``
(``src/icebergs_framework.F90:7168-7255``).  The per-berg subroutine call
becomes one gather-heavy array op over the whole capacity slab.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..grid import Grid, bilin_corner
from ..config import IcebergsConfig


class Env(NamedTuple):
    uo: jnp.ndarray
    vo: jnp.ndarray
    ui: jnp.ndarray
    vi: jnp.ndarray
    ua: jnp.ndarray
    va: jnp.ndarray
    ssh_x: jnp.ndarray
    ssh_y: jnp.ndarray
    sst: jnp.ndarray
    sss: jnp.ndarray
    cn: jnp.ndarray
    hi: jnp.ndarray
    od: jnp.ndarray


def quad_interp_from_agrid(grid: Grid, fld, lon, lat, i, j, xi, yj,
                           cfg: IcebergsConfig):
    """Bi-quadratic Lagrange interpolation of an A-grid (cell-center) field.

    Port of ``quad_interp_from_agrid`` (icebergs_framework.F90:7168-7255),
    regular-grid path.  The 3x3 node array is staggered by cell-index parity
    (``mind``/``rev_mind``) exactly as the reference.
    """
    mind = 0 if cfg.rev_mind else 1
    # NOTE: Fortran cell indices are 1-based; parity of the 1-based index is
    # what the staggering rule uses.  Our i is 0-based -> parity of (i+1).
    par_i = (i + 1) % 2
    par_j = (j + 1) % 2
    is_lo_x = jnp.where(par_i == mind, jnp.where(xi >= 0.5, i, i - 2), i - 1)
    js_lo_y = jnp.where(par_j == mind, jnp.where(yj >= 0.5, j, j - 2), j - 1)
    # clamp node window inside the (halo-padded) array
    is_lo_x = jnp.clip(is_lo_x, -1, grid.nx - 2)
    js_lo_y = jnp.clip(js_lo_y, -1, grid.ny - 2)

    # regular-grid local coords: node span is 2 cells wide, centered at
    # node (is+1, js+1); xloc in [0,1] across the span.
    x_mid = grid.lon0 + (is_lo_x.astype(xi.dtype) + 1.5) * grid.dlon
    y_mid = grid.lat0 + (js_lo_y.astype(yj.dtype) + 1.5) * grid.dlat
    xloc = (lon - x_mid) / (2. * grid.dlon) + 0.5
    yloc = (lat - y_mid) / (2. * grid.dlat) + 0.5
    xloc = xloc * 2. - 1.
    yloc = yloc * 2. - 1.

    xb = jnp.stack([0.5 * xloc * (xloc - 1.),
                    (1. + xloc) * (1. - xloc),
                    0.5 * xloc * (xloc + 1.)], axis=-1)   # (..., 3)
    yb = jnp.stack([0.5 * yloc * (yloc - 1.),
                    (1. + yloc) * (1. - yloc),
                    0.5 * yloc * (yloc + 1.)], axis=-1)

    out = jnp.zeros_like(lon)
    for a in range(3):
        for b in range(3):
            out = out + xb[..., a] * yb[..., b] * fld[is_lo_x + 1 + a,
                                                      js_lo_y + 1 + b]
    return out


def _interp_table(grid: Grid, frc, need_od: bool):
    """((nx+2, ny+2, S) read table, slot map): every field access of
    ``interp_flds`` pre-shifted so ONE row gather per berg serves them
    all.

    Any (N, F<=128) row-gather output tile-pads F -> 128 lanes (512 MB
    at 1M bergs), so the step pays one such buffer no matter how many
    fields it reads — the previous design's five separate packed
    gathers (2x16 corner + 3-4x40 center rows) cost ~2.5 GB of padded
    writes per step (AOT HLO census).  Slot values are the exact same
    array elements the multi-gather design read, so results are
    bitwise identical.
    """
    slots = {}
    views = []

    def center(name, f, di, dj):
        # value at padded cell (I, J) = f[I+di, J+dj], edge-clamped in j
        # exactly like the old 5-wide j-block (i never leaves range for
        # owned cells: I in [1, nx], di in [-2, 1])
        fp = jnp.pad(f, ((2, 2), (2, 2)), mode='edge')
        slots[("c", name, di, dj)] = len(views)
        views.append(fp[2 + di:2 + di + f.shape[0],
                        2 + dj:2 + dj + f.shape[1]])

    def corner(k, f, io, jo):
        # value at padded cell (I, J) = f[I-1+io, J-1+jo] (cell corners)
        fp = jnp.pad(f, ((1, 2), (1, 2)))
        slots[("k", k, io, jo)] = len(views)
        views.append(fp[io:io + f.shape[0] + 1, jo:jo + f.shape[1] + 1])

    for k, f in enumerate([grid.cosc, grid.sinc, frc.uo, frc.vo, frc.ui,
                           frc.vi, frc.ua, frc.va]):
        for io in (0, 1):
            for jo in (0, 1):
                corner(k, f, io, jo)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            center("ssh", frc.ssh, di, dj)
            center("msk", grid.msk, di, dj)
    for di in (-1, 0, 1):
        for dj in (-2, -1, 0, 1):
            center("dx", grid.dx, di, dj)
    for di in (-2, -1, 0, 1):
        for dj in (-1, 0, 1):
            center("dy", grid.dy, di, dj)
    for name, f in (("sst", frc.sst), ("sss", frc.sss), ("cn", frc.cn),
                    ("hi", frc.hi)):
        center(name, f, 0, 0)
    if need_od:
        center("od", grid.ocean_depth, 0, 0)
    # stack on axis 0 (each (nx, ny) view keeps its natural layout) and
    # relayout once: jnp.stack(..., axis=-1) would materialize every
    # view as an (nx, ny, 1) slice whose minor dim pads 1 -> 128 lanes
    # (135 MB each, 28 copies in the AOT HLO census)
    T0 = jnp.stack(views, axis=0)
    return jnp.moveaxis(T0, 0, -1), slots


def interp_flds(grid: Grid, frc, cfg: IcebergsConfig, lon, lat, i, j, xi, yj,
                rx=0., ry=0.) -> Env:
    """Interpolate all forcing fields to berg positions.

    Port of ``interp_flds`` (icebergs.F90:4718-4969): corner-B-grid bilinear
    velocities, PCM A-grid scalars, new-style SSH gradient stencil, optional
    coastal/tidal drift, grid-rotation of vectors, quadratic ocean depth.
    """
    ob = cfg.old_bug_bilin
    I, J = i + 1, j + 1
    need_od = not cfg.mts
    T, S = _interp_table(grid, frc, need_od)
    g = T[I, J]                             # ONE (N, S) row gather

    def kread(k, io, jo):
        return g[..., S[("k", k, io, jo)]]

    def a(name, di, dj):
        return g[..., S[("c", name, di, dj)]]

    vals = []
    for k in range(8):
        f00, f01 = kread(k, 0, 0), kread(k, 0, 1)
        f10, f11 = kread(k, 1, 0), kread(k, 1, 1)
        if ob:
            vals.append((f11 * (1. - xi) + f01 * xi) * (1. - yj)
                        + (f10 * (1. - xi) + f00 * xi) * yj)
        else:
            vals.append((f11 * xi + f01 * (1. - xi)) * yj
                        + (f10 * xi + f00 * (1. - xi)) * (1. - yj))
    cos_rot, sin_rot = vals[0], vals[1]
    uo, vo = vals[2], vals[3]
    ui, vi = vals[4], vals[5]
    ua, va = vals[6], vals[7]

    if cfg.coastal_drift > 0.:
        # accelerate bergs away from coastlines (icebergs.F90:4770-4778)
        du = cfg.coastal_drift * (a("msk", 1, 0) - a("msk", -1, 0)) \
            * a("msk", 0, 0)
        dv = cfg.coastal_drift * (a("msk", 0, 1) - a("msk", 0, -1)) \
            * a("msk", 0, 0)
        uo, ui = uo + du, ui + du
        vo, vi = vo + dv, vi + dv

    if cfg.tidal_drift > 0.:
        # stochastic tidal drift, masked to not push bergs into land
        # (icebergs.F90:4782-4794)
        du = (jnp.minimum(0., rx) * a("msk", -1, 0)
              + jnp.maximum(0., rx) * a("msk", 1, 0)) \
            * (1. - a("msk", 0, -1) * a("msk", 0, 1))
        dv = (jnp.minimum(0., ry) * a("msk", 0, -1)
              + jnp.maximum(0., ry) * a("msk", 0, 1)) \
            * (1. - a("msk", -1, 0) * a("msk", 1, 0))
        du = du * cfg.tidal_drift * a("msk", 0, 0)
        dv = dv * cfg.tidal_drift * a("msk", 0, 0)
        uo, ui = uo + du, ui + du
        vo, vi = vo + dv, vi + dv

    # SSH gradient stencil + A-grid PCM scalars (icebergs.F90:4826-4884)
    # NaN-free stencil: padded halo cells carry dx=dy=0, and the raw
    # 0/0 (or x/0) lanes of the reference formulation — though caught
    # by its post-rotation isnan scrub — are inf/NaN INTERMEDIATES
    # that XLA's select/fusion rewrites can leak into live lanes when
    # this stencil is fused into a larger jit (observed: jit(interp +
    # mts-evolve) NaN'd while the same ops eager or separately jitted
    # were finite).  So each slot divides by a clamped denominator and
    # records ``den == 0`` as its poison flag; the scrub below zeroes
    # ssh_x/ssh_y from the flags of the branch-touched slots — exactly
    # the lanes whose NaN the reference scrub would have caught (a slot
    # value is nonfinite iff its denominator is 0), and exactly the
    # bitmask scheme the kernel table path uses (pallas_interp).
    def ddx(ii_off, jj_off):
        o = (ii_off, jj_off)
        dxp = 0.5 * (a("dx", o[0] + 1, o[1]) + a("dx", o[0] + 1, o[1] - 1))
        dx0 = 0.5 * (a("dx", o[0], o[1]) + a("dx", o[0], o[1] - 1))
        den = dx0 + dxp
        v = 2. * (a("ssh", o[0] + 1, o[1]) - a("ssh", o[0], o[1])) \
            / jnp.maximum(den, 1e-30) \
            * a("msk", o[0] + 1, o[1]) * a("msk", o[0], o[1])
        return v, den == 0.

    def ddy(ii_off, jj_off):
        o = (ii_off, jj_off)
        dyp = 0.5 * (a("dy", o[0], o[1] + 1) + a("dy", o[0] - 1, o[1] + 1))
        dy0 = 0.5 * (a("dy", o[0], o[1]) + a("dy", o[0] - 1, o[1]))
        den = dy0 + dyp
        v = 2. * (a("ssh", o[0], o[1] + 1) - a("ssh", o[0], o[1])) \
            / jnp.maximum(den, 1e-30) \
            * a("msk", o[0], o[1] + 1) * a("msk", o[0], o[1])
        return v, den == 0.

    sst, sss = a("sst", 0, 0), a("sss", 0, 0)
    cn, hi = a("cn", 0, 0), a("hi", 0, 0)

    x01, px01 = ddx(0, 1)
    x00, px00 = ddx(0, 0)
    x0m, px0m = ddx(0, -1)
    xm1, pxm1 = ddx(-1, 1)
    xm0, pxm0 = ddx(-1, 0)
    xmm, pxmm = ddx(-1, -1)
    hxp = jnp.where(yj >= 0.5,
                    (yj - 0.5) * x01 + (1.5 - yj) * x00,
                    (yj + 0.5) * x00 + (0.5 - yj) * x0m)
    hxm = jnp.where(yj >= 0.5,
                    (yj - 0.5) * xm1 + (1.5 - yj) * xm0,
                    (yj + 0.5) * xm0 + (0.5 - yj) * xmm)
    ssh_x = xi * hxp + (1. - xi) * hxm
    poison_x = jnp.where(yj >= 0.5, px01 | px00 | pxm1 | pxm0,
                         px00 | px0m | pxm0 | pxmm)

    y10, py10 = ddy(1, 0)
    y00, py00 = ddy(0, 0)
    ym0, pym0 = ddy(-1, 0)
    y1m, py1m = ddy(1, -1)
    y0m, py0m = ddy(0, -1)
    ymm, pymm = ddy(-1, -1)
    hyp = jnp.where(xi >= 0.5,
                    (xi - 0.5) * y10 + (1.5 - xi) * y00,
                    (xi + 0.5) * y00 + (0.5 - xi) * ym0)
    hym = jnp.where(xi >= 0.5,
                    (xi - 0.5) * y1m + (1.5 - xi) * y0m,
                    (xi + 0.5) * y0m + (0.5 - xi) * ymm)
    ssh_y = yj * hyp + (1. - yj) * hym
    poison_y = jnp.where(xi >= 0.5, py10 | py00 | py1m | py0m,
                         py00 | pym0 | py0m | pymm)

    # rotate vectors from local grid orientation to lat/lon (icebergs.F90:4887)
    def rot(u, v):
        return cos_rot * u + sin_rot * v, cos_rot * v - sin_rot * u

    uo, vo = rot(uo, vo)
    ui, vi = rot(ui, vi)
    ua, va = rot(ua, va)
    ssh_x, ssh_y = rot(ssh_x, ssh_y)

    # scrub SSH slopes whose touched stencil slots divided by zero —
    # exactly the lanes the reference's post-rotation isnan scrub
    # caught (icebergs.F90:4893-4894): a slot is nonfinite iff its
    # denominator is 0, and the rotation mixes x into y and vice versa
    poison = poison_x | poison_y
    ssh_x = jnp.where(poison, 0., ssh_x)
    ssh_y = jnp.where(poison, 0., ssh_y)

    # ocean depth (+ssh): quadratic A-grid in MTS mode, PCM otherwise
    # (icebergs.F90:4930-4950)
    if cfg.mts:
        if cfg.A68_test:
            od = jnp.where((lon > cfg.A68_xdisp + 360.) & (lat > cfg.A68_ydisp),
                           0., 1000.)
        else:
            od = quad_interp_from_agrid(grid, grid.ocean_depth + frc.ssh,
                                        lon, lat, i, j, xi, yj, cfg)
    else:
        od = a("od", 0, 0) + a("ssh", 0, 0)

    return Env(uo=uo, vo=vo, ui=ui, vi=vi, ua=ua, va=va,
               ssh_x=ssh_x, ssh_y=ssh_y, sst=sst, sss=sss, cn=cn, hi=hi,
               od=od)
