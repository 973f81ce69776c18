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


def interp_flds(grid: Grid, frc, cfg: IcebergsConfig, lon, lat, i, j, xi, yj,
                rx=0., ry=0.) -> Env:
    """Interpolate all forcing fields to berg positions.

    Port of ``interp_flds`` (icebergs.F90:4718-4969): corner-B-grid bilinear
    velocities, PCM A-grid scalars, new-style SSH gradient stencil, optional
    coastal/tidal drift, grid-rotation of vectors, quadratic ocean depth.
    """
    ob = cfg.old_bug_bilin
    # pack the 8 corner fields x the (j, j+1) pair: TWO row gathers for
    # all 4 cell corners.  TRANSPOSED (F, nx, ny) tables: the gather
    # outputs are (16, N) with the long dim minor — an (N, 16) output
    # would tile-pad 16 -> 128 lanes (512 MB at 1M bergs)
    cmat = jnp.stack([grid.cosc, grid.sinc, frc.uo, frc.vo, frc.ui, frc.vi,
                      frc.ua, frc.va], axis=0)
    cmat2 = jnp.concatenate([cmat[:, :, :-1], cmat[:, :, 1:]], axis=0)
    g0 = cmat2[:, i, j]       # rows [corner (i, j) | corner (i, j+1)]
    g1 = cmat2[:, i + 1, j]
    f00, f01 = g0[:8], g0[8:]
    f10, f11 = g1[:8], g1[8:]
    xiB, yjB = xi[None, :], yj[None, :]
    if ob:
        vals = ((f11 * (1. - xiB) + f01 * xiB) * (1. - yjB)
                + (f10 * (1. - xiB) + f00 * xiB) * yjB)
    else:
        vals = ((f11 * xiB + f01 * (1. - xiB)) * yjB
                + (f10 * xiB + f00 * (1. - xiB)) * (1. - yjB))
    cos_rot, sin_rot = vals[0], vals[1]
    uo, vo = vals[2], vals[3]
    ui, vi = vals[4], vals[5]
    ua, va = vals[6], vals[7]

    I, J = i + 1, j + 1
    msk = grid.msk
    if cfg.coastal_drift > 0.:
        # accelerate bergs away from coastlines (icebergs.F90:4770-4778)
        du = cfg.coastal_drift * (msk[I + 1, J] - msk[I - 1, J]) * msk[I, J]
        dv = cfg.coastal_drift * (msk[I, J + 1] - msk[I, J - 1]) * msk[I, J]
        uo, ui = uo + du, ui + du
        vo, vi = vo + dv, vi + dv

    if cfg.tidal_drift > 0.:
        # stochastic tidal drift, masked to not push bergs into land
        # (icebergs.F90:4782-4794)
        du = (jnp.minimum(0., rx) * msk[I - 1, J]
              + jnp.maximum(0., rx) * msk[I + 1, J]) \
            * (1. - msk[I, J - 1] * msk[I, J + 1])
        dv = (jnp.minimum(0., ry) * msk[I, J - 1]
              + jnp.maximum(0., ry) * msk[I, J + 1]) \
            * (1. - msk[I - 1, J] * msk[I + 1, J])
        du = du * cfg.tidal_drift * msk[I, J]
        dv = dv * cfg.tidal_drift * msk[I, J]
        uo, ui = uo + du, ui + du
        vo, vi = vo + dv, vi + dv

    # SSH gradient stencil + A-grid PCM scalars (icebergs.F90:4826-4884).
    # All center-field reads go through one packed TRANSPOSED matrix with
    # per-offset row gathers, memoized across the 8 ddx/ddy evaluations.
    smat = jnp.stack([frc.ssh, grid.dx, grid.dy, grid.msk,
                      frc.sst, frc.sss, frc.cn, frc.hi], axis=0)
    # 5-wide j-blocks: ONE row gather per di covers all dj in [-2, 2]
    # (edge padding reproduces jit's clamp-at-boundary indexing)
    ny2 = smat.shape[2]
    smat_pad = jnp.pad(smat, ((0, 0), (0, 0), (2, 2)), mode='edge')
    smat5 = jnp.concatenate([smat_pad[:, :, k:k + ny2] for k in range(5)],
                            axis=0)                      # (40, nx+2, ny+2)
    _rows = {}

    def at(di, dj):
        if di not in _rows:
            _rows[di] = smat5[:, I + di, J]              # (40, N)
        return _rows[di][(dj + 2) * 8:(dj + 3) * 8]

    def ddx(ii_off, jj_off):
        """ddx_ssh at cell (i+ii_off, j+jj_off) via packed rows."""
        o = (ii_off, jj_off)
        dxp = 0.5 * (at(o[0] + 1, o[1])[1] + at(o[0] + 1, o[1] - 1)[1])
        dx0 = 0.5 * (at(o[0], o[1])[1] + at(o[0], o[1] - 1)[1])
        return 2. * (at(o[0] + 1, o[1])[0] - at(o[0], o[1])[0]) \
            / (dx0 + dxp) * at(o[0] + 1, o[1])[3] * at(o[0], o[1])[3]

    def ddy(ii_off, jj_off):
        o = (ii_off, jj_off)
        dyp = 0.5 * (at(o[0], o[1] + 1)[2] + at(o[0] - 1, o[1] + 1)[2])
        dy0 = 0.5 * (at(o[0], o[1])[2] + at(o[0] - 1, o[1])[2])
        return 2. * (at(o[0], o[1] + 1)[0] - at(o[0], o[1])[0]) \
            / (dy0 + dyp) * at(o[0], o[1] + 1)[3] * at(o[0], o[1])[3]

    c00 = at(0, 0)
    sst, sss, cn, hi = c00[4], c00[5], c00[6], c00[7]

    hxp = jnp.where(yj >= 0.5,
                    (yj - 0.5) * ddx(0, 1) + (1.5 - yj) * ddx(0, 0),
                    (yj + 0.5) * ddx(0, 0) + (0.5 - yj) * ddx(0, -1))
    hxm = jnp.where(yj >= 0.5,
                    (yj - 0.5) * ddx(-1, 1) + (1.5 - yj) * ddx(-1, 0),
                    (yj + 0.5) * ddx(-1, 0) + (0.5 - yj) * ddx(-1, -1))
    ssh_x = xi * hxp + (1. - xi) * hxm

    hyp = jnp.where(xi >= 0.5,
                    (xi - 0.5) * ddy(1, 0) + (1.5 - xi) * ddy(0, 0),
                    (xi + 0.5) * ddy(0, 0) + (0.5 - xi) * ddy(-1, 0))
    hym = jnp.where(xi >= 0.5,
                    (xi - 0.5) * ddy(1, -1) + (1.5 - xi) * ddy(0, -1),
                    (xi + 0.5) * ddy(0, -1) + (0.5 - xi) * ddy(-1, -1))
    ssh_y = yj * hyp + (1. - yj) * hym

    # rotate vectors from local grid orientation to lat/lon (icebergs.F90:4887)
    def rot(u, v):
        return cos_rot * u + sin_rot * v, cos_rot * v - sin_rot * u

    uo, vo = rot(uo, vo)
    ui, vi = rot(ui, vi)
    ua, va = rot(ua, va)
    ssh_x, ssh_y = rot(ssh_x, ssh_y)

    # scrub NaN SSH slopes at boundaries (icebergs.F90:4893-4894)
    ssh_x = jnp.where(jnp.isnan(ssh_x), 0., ssh_x)
    ssh_y = jnp.where(jnp.isnan(ssh_y), 0., ssh_y)

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
        od = grid.ocean_depth[I, J] + frc.ssh[I, J]

    return Env(uo=uo, vo=vo, ui=ui, vi=vi, ua=ua, va=va,
               ssh_x=ssh_x, ssh_y=ssh_y, sst=sst, sss=sss, cn=cn, hi=hi,
               od=od)
