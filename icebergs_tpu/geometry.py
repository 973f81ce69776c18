"""Curvilinear-grid geometry kernels (general quad cells).

TPU-native port of the reference's geometry/search layer
(``src/icebergs_framework.F90:5710-6575``): quadrilateral point-in-cell
tests by sign-of-cross-product (``sum_sign_dot_prod4``), the inverse
bilinear map ``calc_xiyj`` (quadratic solve picking the root nearest 0.5),
``pos_within_cell`` and a vectorized local cell search (the jit analog of
``find_cell_by_search``'s expanding neighborhood walk).

All functions are elementwise over particle slabs; the 0-based corner
layout of :mod:`icebergs_tpu.grid` applies (cell (i,j) has corners
C[i..i+1, j..j+1], corner 1=SW, 2=SE, 3=NE, 4=NW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid, apply_modulo_around_point


def sum_sign_dot_prod4(x0, y0, x1, y1, x2, y2, x3, y3, x, y, Lx):
    """Point-in-quadrilateral via consistent edge-cross-product signs
    (icebergs_framework.F90:6166-6229).  South/East edges belong to the
    cell, North/West do not (the reference's half-sign asymmetry)."""
    xx = apply_modulo_around_point(x, x0, Lx)
    xx0 = apply_modulo_around_point(x0, x0, Lx)
    xx1 = apply_modulo_around_point(x1, x0, Lx)
    xx2 = apply_modulo_around_point(x2, x0, Lx)
    xx3 = apply_modulo_around_point(x3, x0, Lx)

    l0 = (xx - xx0) * (y1 - y0) - (y - y0) * (xx1 - xx0)
    l1 = (xx - xx1) * (y2 - y1) - (y - y1) * (xx2 - xx1)
    l2 = (xx - xx2) * (y3 - y2) - (y - y2) * (xx3 - xx2)
    l3 = (xx - xx3) * (y0 - y3) - (y - y3) * (xx0 - xx3)

    def p(l, tie):
        return jnp.where(l == 0., tie, jnp.sign(l))

    p0 = p(l0, -0.5)
    p1 = p(l1, 0.5)
    p2 = p(l2, 0.5)
    p3 = p(l3, -0.5)
    lhs = (jnp.abs(p0) + jnp.abs(p2)) + (jnp.abs(p1) + jnp.abs(p3))
    rhs = jnp.abs((p0 + p2) + (p1 + p3))
    return lhs == rhs


def sum_sign_dot_prod5(x0, y0, x1, y1, x2, y2, x3, y3, x4, y4, x, y, Lx):
    """Point-in-pentagon test for tripolar polar cells
    (sum_sign_dot_prod5, icebergs_framework.F90:6233-6300): cells with a
    corner at the north pole are treated as 5-sided polygons (the polar
    corner split in two)."""
    xx = apply_modulo_around_point(x, x0, Lx)
    xs = [apply_modulo_around_point(v, x0, Lx) for v in (x0, x1, x2, x3, x4)]
    ys = [y0, y1, y2, y3, y4]

    ps = []
    for k in range(5):
        k2 = (k + 1) % 5
        l = (xx - xs[k]) * (ys[k2] - ys[k]) - (y - ys[k]) * (xs[k2] - xs[k])
        ps.append(jnp.where(l == 0., 0., jnp.sign(l)))
    abs_sum = sum(jnp.abs(p) for p in ps)
    sum_abs = jnp.abs(sum(ps))
    return (abs_sum - sum_abs) < 0.5


def cell_corners(grid: Grid, i, j):
    """(x1..x4, y1..y4) for cells (i,j): SW, SE, NE, NW."""
    x1 = grid.lonc[i, j]
    y1 = grid.latc[i, j]
    x2 = grid.lonc[i + 1, j]
    y2 = grid.latc[i + 1, j]
    x3 = grid.lonc[i + 1, j + 1]
    y3 = grid.latc[i + 1, j + 1]
    x4 = grid.lonc[i, j + 1]
    y4 = grid.latc[i, j + 1]
    return x1, x2, x3, x4, y1, y2, y3, y4


def is_point_in_cell(grid: Grid, x, y, i, j, Lx):
    """Quad-cell membership with bounding-box early reject
    (is_point_in_cell, icebergs_framework.F90:6076-6160; the polar
    pentagon cases apply only to tripolar grids)."""
    x1, x2, x3, x4, y1, y2, y3, y4 = cell_corners(grid, i, j)
    ylo = jnp.minimum(jnp.minimum(y1, y2), jnp.minimum(y3, y4))
    yhi = jnp.maximum(jnp.maximum(y1, y2), jnp.maximum(y3, y4))
    in_y = (y >= ylo) & (y <= yhi)
    inside = sum_sign_dot_prod4(x1, y1, x2, y2, x3, y3, x4, y4, x, y, Lx)
    return in_y & inside


def calc_xiyj(x1, x2, x3, x4, y1, y2, y3, y4, x, y, Lx):
    """Inverse bilinear map: non-dimensional (xi, yj) of point (x, y) in
    the quad (calc_xiyj, icebergs_framework.F90:6439-6534): quadratic in
    yj, root nearest 0.5; xi back-substituted with the same fallback
    ladder as the reference."""
    alpha = x2 - x1
    delta = y2 - y1
    beta = x4 - x1
    epsilon = y4 - y1
    gamma = (x3 - x1) - (alpha + beta)
    kappa = (y3 - y1) - (delta + epsilon)

    a = kappa * beta - gamma * epsilon
    dx = apply_modulo_around_point(x, x1, Lx) - x1
    dy = y - y1
    b = (delta * beta - alpha * epsilon) - (kappa * dx - gamma * dy)
    c = alpha * dy - delta * dx

    # stable quadratic roots (float32-safe; reference solves in double,
    # icebergs_framework.F90:6487-6497): q = -(b/2 + sign(b) sqrt(d)),
    # roots q/a and c/q — avoids the catastrophic cancellation of the
    # textbook formula for near-degenerate (parallelogram) cells
    d = 0.25 * b ** 2 - a * c
    sq = jnp.sqrt(jnp.maximum(d, 0.))
    sgn_b = jnp.where(b >= 0., 1., -1.)
    q = -(0.5 * b + sgn_b * sq)
    qsafe = jnp.where(q != 0., q, 1.)
    asafe = jnp.where(jnp.abs(a) > 1.e-12, a, 1.)
    yy1 = q / asafe
    yy2 = jnp.where(q != 0., c / qsafe, yy1)
    yj_quad = jnp.where(jnp.abs(yy1 - 0.5) < jnp.abs(yy2 - 0.5), yy1, yy2)
    yj_lin = jnp.where(b != 0., -c / jnp.where(b != 0., b, 1.), 0.)
    yj = jnp.where(jnp.abs(a) > 1.e-12, yj_quad, yj_lin)

    aa = alpha + gamma * yj
    bb = delta + kappa * yj
    cc = (epsilon * alpha - beta * delta) + (epsilon * gamma
                                             - beta * kappa) * yj
    xi_a = (dx - beta * yj) / jnp.where(aa != 0., aa, 1.)
    xi_b = (dy - epsilon * yj) / jnp.where(bb != 0., bb, 1.)
    xi_c = (epsilon * dx - beta * dy) / jnp.where(cc != 0., cc, 1.)
    xi = jnp.where(aa != 0., xi_a, jnp.where(bb != 0., xi_b, xi_c))
    return xi, yj


def pos_within_cell_curvilinear(grid: Grid, x, y, i, j, Lx):
    """(xi, yj, inside) on a general quad grid (pos_within_cell's
    calc_xiyj path, icebergs_framework.F90:6310-6437)."""
    x1, x2, x3, x4, y1, y2, y3, y4 = cell_corners(grid, i, j)
    xi, yj = calc_xiyj(x1, x2, x3, x4, y1, y2, y3, y4, x, y, Lx)
    inside = (xi >= 0.) & (xi < 1.) & (yj >= 0.) & (yj < 1.)
    return xi, yj, inside


def find_cell_local(grid: Grid, x, y, i0, j0, Lx, radius: int = 2):
    """Vectorized local cell search around prior cells (i0, j0): test the
    (2r+1)^2 neighborhood and return the matching cell (jit analog of
    ``find_cell``'s neighborhood walk, icebergs_framework.F90:5710-...).

    Returns (i, j, found)."""
    best_i = i0
    best_j = j0
    found = jnp.zeros(jnp.shape(x), bool)
    for dj in range(-radius, radius + 1):
        for di in range(-radius, radius + 1):
            ii = jnp.clip(i0 + di, 0, grid.nx - 1)
            jj = jnp.clip(j0 + dj, 0, grid.ny - 1)
            hit = is_point_in_cell(grid, x, y, ii, jj, Lx) & ~found
            best_i = jnp.where(hit, ii, best_i)
            best_j = jnp.where(hit, jj, best_j)
            found = found | hit
    return best_i, best_j, found


def find_cell_by_search_host(grid: Grid, x, y, Lx):
    """Global search (host-side, restart reads): brute-force over all
    cells, minimizing corner-mean distance like ``find_cell_by_search``'s
    cost minimization (icebergs_framework.F90:5760-...).
    x, y are numpy arrays; returns (i, j, found)."""
    lonc = np.asarray(grid.lonc)
    latc = np.asarray(grid.latc)
    cx = 0.25 * (lonc[:-1, :-1] + lonc[1:, :-1] + lonc[:-1, 1:]
                 + lonc[1:, 1:])
    cy = 0.25 * (latc[:-1, :-1] + latc[1:, :-1] + latc[:-1, 1:]
                 + latc[1:, 1:])
    out_i = np.zeros(len(x), np.int32)
    out_j = np.zeros(len(x), np.int32)
    ok = np.zeros(len(x), bool)
    jx = jnp.asarray(x)
    jy = jnp.asarray(y)
    for n in range(len(x)):
        d2 = (cx - x[n]) ** 2 + (cy - y[n]) ** 2
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        # confirm with the exact membership test (search nearby if needed)
        ii, jj, found = jax.tree.map(
            lambda a: np.asarray(a),
            find_cell_local(grid, jx[n], jy[n],
                            jnp.asarray(i), jnp.asarray(j), Lx, radius=1))
        out_i[n], out_j[n], ok[n] = int(ii), int(jj), bool(found)
    return out_i, out_j, ok
