"""Exact hexagon/quadrant intersection areas (vectorized polygon clipping).

Computes the same quantities as the reference's
``Hexagon_into_quadrants_using_triangles`` + triangle helpers
(``src/icebergs.F90:4244-4672``): the areas of a regular hexagon (apothem
``H``, orientation ``theta`` degrees, center ``(x0, y0)``) intersected with
the four plane quadrants.  Instead of the reference's case-heavy
triangle-by-triangle decomposition we clip the convex hexagon against the
half-planes x>=0 / y>=0 with a fixed-size Sutherland-Hodgman pass — exact,
branch-free, and fully vectorized over the berg slab.

Quadrant convention matches the reference: Q1=(+,+), Q2=(-,+), Q3=(-,-),
Q4=(+,-).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _hexagon_vertices(x0, y0, H, theta_deg):
    """Corners of the hexagon (flat-top, circumradius S=2H/sqrt(3)),
    mirroring the vertex layout at icebergs.F90:4592-4607.
    Returns arrays (..., 6) for x and y."""
    S = (2. / math.sqrt(3.)) * H
    hx = H / math.sqrt(3.)
    cx = jnp.stack([S, hx, -hx, -S, -hx, hx], axis=-1)
    cy = jnp.stack([jnp.zeros_like(H), H, H, jnp.zeros_like(H), -H, -H],
                   axis=-1)
    th = jnp.deg2rad(theta_deg)[..., None]
    ct, st = jnp.cos(th), jnp.sin(th)
    rx = cx * ct - cy * st + x0[..., None]
    ry = cx * st + cy * ct + y0[..., None]
    return rx, ry


def _clip_halfplane(px, py, valid, sign_axis):
    """Clip polygon (px, py, valid mask) against a half-plane.

    sign_axis: ('x', +1) keeps x>=0 etc. Implemented for axis-aligned
    half-planes keeping coordinate >= 0; to keep <= 0 negate inputs first.

    Vertices are stored in fixed-width buffers (K slots); ``valid`` marks
    live slots (always a prefix).  Output has K+1 slots.
    """
    K = px.shape[-1]
    n = jnp.sum(valid, axis=-1)                      # live vertex count
    idx = jnp.arange(K)
    nxt = jnp.where(idx + 1 < n[..., None], idx + 1, 0)    # wrap
    qx = jnp.take_along_axis(px, nxt, axis=-1)
    qy = jnp.take_along_axis(py, nxt, axis=-1)

    d_cur = px if sign_axis == 'x' else py
    d_nxt = qx if sign_axis == 'x' else qy
    inside_cur = d_cur >= 0.
    inside_nxt = d_nxt >= 0.
    denom = d_nxt - d_cur
    t = jnp.where(jnp.abs(denom) > 0., -d_cur / jnp.where(denom == 0., 1., denom), 0.)
    ix = px + t * (qx - px)
    iy = py + t * (qy - py)
    if sign_axis == 'x':
        ix = jnp.zeros_like(ix)
    else:
        iy = jnp.zeros_like(iy)

    edge_live = valid
    emit_cur = inside_cur & edge_live
    emit_int = (inside_cur ^ inside_nxt) & edge_live

    # output slot offsets via prefix sums
    counts = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offs = jnp.cumsum(counts, axis=-1) - counts       # start offset per edge
    pos_cur = offs
    pos_int = offs + emit_cur.astype(jnp.int32)

    Ko = K + 1
    out_x = jnp.zeros(px.shape[:-1] + (Ko,), px.dtype)
    out_y = jnp.zeros_like(out_x)
    out_v = jnp.zeros(px.shape[:-1] + (Ko,), bool)

    # scatter via .at[] with batched indices
    batch = px.shape[:-1]
    if batch:
        b = jnp.arange(px.shape[0])[:, None].repeat(K, axis=1)
        p_cur = jnp.where(emit_cur, pos_cur, Ko - 1)
        p_int = jnp.where(emit_int, pos_int, Ko - 1)
        out_x = out_x.at[b, p_cur].add(jnp.where(emit_cur, px, 0.))
        out_y = out_y.at[b, p_cur].add(jnp.where(emit_cur, py, 0.))
        out_v = out_v.at[b, p_cur].max(emit_cur)
        out_x = out_x.at[b, p_int].add(jnp.where(emit_int, ix, 0.))
        out_y = out_y.at[b, p_int].add(jnp.where(emit_int, iy, 0.))
        out_v = out_v.at[b, p_int].max(emit_int)
        # the dump slot may hold garbage sums; recompute it cleanly:
        # a real vertex lands in slot Ko-1 only if total count == Ko.
        total = jnp.sum(counts, axis=-1)
        good_last = total >= Ko
        out_v = out_v.at[:, Ko - 1].set(good_last)
        # if slot Ko-1 is real, it must be written exactly once among the
        # emits with pos == Ko-1 and emit True; masked dumps also landed
        # there, so rebuild it:
        real_cur = emit_cur & (pos_cur == Ko - 1)
        real_int = emit_int & (pos_int == Ko - 1)
        lx = (jnp.sum(jnp.where(real_cur, px, 0.), -1)
              + jnp.sum(jnp.where(real_int, ix, 0.), -1))
        ly = (jnp.sum(jnp.where(real_cur, py, 0.), -1)
              + jnp.sum(jnp.where(real_int, iy, 0.), -1))
        out_x = out_x.at[:, Ko - 1].set(jnp.where(good_last, lx, 0.))
        out_y = out_y.at[:, Ko - 1].set(jnp.where(good_last, ly, 0.))
    else:
        raise NotImplementedError("use batched inputs")
    return out_x, out_y, out_v


def _shoelace(px, py, valid):
    """Signed polygon area over valid prefix slots."""
    K = px.shape[-1]
    n = jnp.sum(valid, axis=-1)
    idx = jnp.arange(K)
    nxt = jnp.where(idx + 1 < n[..., None], idx + 1, 0)
    qx = jnp.take_along_axis(px, nxt, axis=-1)
    qy = jnp.take_along_axis(py, nxt, axis=-1)
    cross = px * qy - qx * py
    return 0.5 * jnp.sum(jnp.where(valid, cross, 0.), axis=-1)


def hexagon_into_quadrants_using_triangles(x0, y0, H, theta_deg):
    """Areas of the hexagon in each quadrant: (A_hex, Q1, Q2, Q3, Q4).

    Drop-in equivalent of the reference routine (icebergs.F90:4562-4670),
    same quadrant convention, computed by exact convex clipping.
    """
    flat = x0.ndim == 0
    if flat:
        x0, y0, H = (jnp.atleast_1d(a) for a in (x0, y0, H))
        theta_deg = jnp.atleast_1d(theta_deg)
    px, py = _hexagon_vertices(x0, y0, H, theta_deg)
    valid = jnp.ones(px.shape, bool)

    A = _shoelace(px, py, valid)
    # clip by x >= 0
    rx, ry, rv = _clip_halfplane(px, py, valid, 'x')
    Ax = _shoelace(rx, ry, rv)
    # clip by y >= 0
    ux, uy, uv = _clip_halfplane(px, py, valid, 'y')
    Ay = _shoelace(ux, uy, uv)
    # clip by x >= 0 then y >= 0
    qx, qy, qv = _clip_halfplane(rx, ry, rv, 'y')
    Axy = _shoelace(qx, qy, qv)

    Q1 = jnp.maximum(Axy, 0.)
    Q2 = jnp.maximum(Ay - Axy, 0.)
    Q4 = jnp.maximum(Ax - Axy, 0.)
    Q3 = jnp.maximum(A - Ax - Ay + Axy, 0.)

    # absorb residual rounding into the largest quadrant
    # (same post-correction as icebergs.F90:4650-4666)
    err = A - (Q1 + Q2 + Q3 + Q4)
    stacked = jnp.stack([Q1, Q2, Q3, Q4])
    biggest = jnp.argmax(stacked, axis=0)
    corr = jnp.arange(4)[:, None] == biggest[None, :]
    stacked = stacked + jnp.where(corr, err[None, :], 0.)
    Q1, Q2, Q3, Q4 = stacked[0], stacked[1], stacked[2], stacked[3]

    if flat:
        return A[0], Q1[0], Q2[0], Q3[0], Q4[0]
    return A, Q1, Q2, Q3, Q4
