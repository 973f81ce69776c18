"""Hexagon/quadrant area identities — the reference's ``hexagon_test``
suite (icebergs.F90:247-354) against our convex-clipping implementation."""

import math

import jax.numpy as jnp
import numpy as np

from icebergs_tpu.ops.hexagon import hexagon_into_quadrants_using_triangles


def hexq(x0, y0, H=1.0, theta=0.0):
    A, q1, q2, q3, q4 = hexagon_into_quadrants_using_triangles(
        jnp.array([x0], jnp.float64 if False else jnp.float32),
        jnp.array([y0]), jnp.array([H]), jnp.array([theta]))
    return (float(A[0]), float(q1[0]), float(q2[0]), float(q3[0]),
            float(q4[0]))


TOL = 2e-6  # float32 geometry; reference uses 1e-10 in double


def test_hexagon_at_origin_equal_quadrants():
    H = 1.0
    S = 2 * H / math.sqrt(3.)
    A, q1, q2, q3, q4 = hexq(0., 0.)
    assert abs(A - (3. * math.sqrt(3.) / 2.) * S * S) < TOL
    for q in (q1, q2, q3, q4):
        assert abs(q - A / 4) < TOL


def test_hexagon_split_between_two_quadrants():
    H = 1.0
    S = 2 * H / math.sqrt(3.)
    A, q1, q2, q3, q4 = hexq(S, 0.)
    assert abs(q1 - A / 2) < TOL and abs(q4 - A / 2) < TOL
    assert q2 < TOL and q3 < TOL

    A, q1, q2, q3, q4 = hexq(-S, 0.)
    assert abs(q2 - A / 2) < TOL and abs(q3 - A / 2) < TOL
    assert q1 < TOL and q4 < TOL

    A, q1, q2, q3, q4 = hexq(0., H)
    assert abs(q1 - A / 2) < TOL and abs(q2 - A / 2) < TOL
    assert q3 < TOL and q4 < TOL

    A, q1, q2, q3, q4 = hexq(0., -H)
    assert abs(q3 - A / 2) < TOL and abs(q4 - A / 2) < TOL
    assert q1 < TOL and q2 < TOL


def test_hexagon_two_corners_on_axis():
    H = 1.0
    S = 2 * H / math.sqrt(3.)
    A, q1, q2, q3, q4 = hexq(S / 2., 0.)
    assert abs(q1 - 2.5 * A / 6.) < TOL
    assert abs(q2 - 0.5 * A / 6.) < TOL
    assert abs(q3 - 0.5 * A / 6.) < TOL
    assert abs(q4 - 2.5 * A / 6.) < TOL

    A, q1, q2, q3, q4 = hexq(-S / 2., 0.)
    assert abs(q2 - 2.5 * A / 6.) < TOL
    assert abs(q1 - 0.5 * A / 6.) < TOL
    assert abs(q4 - 0.5 * A / 6.) < TOL
    assert abs(q3 - 2.5 * A / 6.) < TOL


def test_hexagon_rotated_area_invariant():
    for th in (15., 30., 77., 133.):
        A, q1, q2, q3, q4 = hexq(0.3, -0.2, 0.7, th)
        S = 2 * 0.7 / math.sqrt(3.)
        assert abs(A - (3. * math.sqrt(3.) / 2.) * S * S) < 5e-6
        assert abs((q1 + q2 + q3 + q4) - A) < 5e-6
        assert min(q1, q2, q3, q4) >= -1e-7


def test_hexagon_fully_inside_one_quadrant():
    A, q1, q2, q3, q4 = hexq(5.0, 5.0, 0.5)
    assert abs(q1 - A) < TOL
    assert q2 < TOL and q3 < TOL and q4 < TOL
