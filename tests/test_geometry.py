"""Geometry & id unit tests — the reference's framework unit_tests
(bilinear identities at cell corners, id round trip,
icebergs_framework.F90:7299-7343) plus curvilinear inverse-bilinear checks.
"""

import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import geometry as geo
from icebergs_tpu import ids
from icebergs_tpu.grid import bilin_corner, make_curvilinear_grid


def distorted_grid(nx=6, ny=5):
    """A smoothly distorted quad grid."""
    ii, jj = np.meshgrid(np.arange(nx + 1, dtype=float),
                         np.arange(ny + 1, dtype=float), indexing="ij")
    lon = ii + 0.25 * np.sin(jj * 0.7)
    lat = jj + 0.2 * np.cos(ii * 0.5) + 20.0
    return make_curvilinear_grid(lon, lat)


def test_calc_xiyj_inverts_forward_bilinear():
    grid = distorted_grid()
    rng = np.random.RandomState(1)
    i = jnp.asarray(rng.randint(0, 6, 30))
    j = jnp.asarray(rng.randint(0, 5, 30))
    xi = jnp.asarray(rng.uniform(0.02, 0.98, 30), jnp.float32)
    yj = jnp.asarray(rng.uniform(0.02, 0.98, 30), jnp.float32)
    # forward bilinear position from (xi, yj) with the non-bug weights
    x = bilin_corner(grid.lonc, i, j, xi, yj, old_bug_bilin=False)
    y = bilin_corner(grid.latc, i, j, xi, yj, old_bug_bilin=False)
    xi2, yj2, inside = geo.pos_within_cell_curvilinear(grid, x, y, i, j,
                                                       -1.0)
    # float32 quadratic-root solve: ~1e-2 worst-case roundoff
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-2)
    np.testing.assert_allclose(np.asarray(yj2), np.asarray(yj), atol=1e-2)
    assert bool(jnp.all(inside))


def test_is_point_in_cell_boundaries():
    grid = distorted_grid()
    # cell centers are inside their own cell and no neighbor
    i = jnp.asarray([2]), jnp.asarray([2])
    x = bilin_corner(grid.lonc, i[0], i[1], jnp.asarray([0.5]),
                     jnp.asarray([0.5]), False)
    y = bilin_corner(grid.latc, i[0], i[1], jnp.asarray([0.5]),
                     jnp.asarray([0.5]), False)
    assert bool(geo.is_point_in_cell(grid, x, y, i[0], i[1], -1.0)[0])
    assert not bool(geo.is_point_in_cell(grid, x, y, i[0] + 1, i[1], -1.0)[0])
    assert not bool(geo.is_point_in_cell(grid, x, y, i[0], i[1] + 1, -1.0)[0])


def test_find_cell_local():
    grid = distorted_grid()
    x = bilin_corner(grid.lonc, jnp.asarray([4]), jnp.asarray([3]),
                     jnp.asarray([0.3]), jnp.asarray([0.7]), False)
    y = bilin_corner(grid.latc, jnp.asarray([4]), jnp.asarray([3]),
                     jnp.asarray([0.3]), jnp.asarray([0.7]), False)
    # search starting from a wrong nearby cell
    i, j, found = geo.find_cell_local(grid, x, y, jnp.asarray([3]),
                                      jnp.asarray([2]), -1.0, radius=2)
    assert bool(found[0])
    assert int(i[0]) == 4 and int(j[0]) == 3


def test_id_roundtrip():
    """64-bit id pack/split round trip (unit_tests id check)."""
    for cnt, ij in ((1, 17), (123456, 2 ** 31 - 5), (7, 0)):
        packed = ids.id_from_2_ints(cnt, ij)
        c2, ij2 = ids.split_id(packed)
        assert (int(c2), int(ij2)) == (cnt, ij)
    # hash matches the reference's 1-based formula
    assert ids.ij_component_of_id(0, 0, 360) == 1
    assert ids.ij_component_of_id(4, 2, 360) == 5 + 720


def test_duplicate_id_detection():
    st = ibt.create_bergs(8, lon=[0., 1., 2.], lat=[0., 0., 0.],
                          id_cnt=[1, 2, 1], id_ij=[5, 5, 5])
    dups = ids.check_for_duplicate_ids(st)
    assert len(dups) == 1


def test_bilin_corner_identity():
    """Bilinear interp reproduces corner values at xi,yj in {0,1}
    (the framework's bilin unit test)."""
    grid = distorted_grid()
    i = jnp.asarray([2])
    j = jnp.asarray([3])
    # non-bug weights: (xi=0, yj=0) -> SW corner C[i, j]
    v = bilin_corner(grid.lonc, i, j, jnp.asarray([0.]), jnp.asarray([0.]),
                     False)
    np.testing.assert_allclose(float(v[0]), float(grid.lonc[2, 3]),
                               rtol=1e-6)
    v = bilin_corner(grid.lonc, i, j, jnp.asarray([1.]), jnp.asarray([1.]),
                     False)
    np.testing.assert_allclose(float(v[0]), float(grid.lonc[3, 4]),
                               rtol=1e-6)


def test_sum_sign_dot_prod5_pentagon():
    """Pentagon membership (polar-cell test, sum_sign_dot_prod5)."""
    # regular pentagon around the origin
    th = np.linspace(0, 2 * np.pi, 6)[:-1] + 0.3
    px = np.cos(th)
    py = np.sin(th)
    args = []
    for k in range(5):
        args += [jnp.asarray([px[k]]), jnp.asarray([py[k]])]
    inside = geo.sum_sign_dot_prod5(*args, jnp.asarray([0.05]),
                                    jnp.asarray([-0.02]), -1.0)
    assert bool(inside[0])
    outside = geo.sum_sign_dot_prod5(*args, jnp.asarray([1.5]),
                                     jnp.asarray([0.0]), -1.0)
    assert not bool(outside[0])
