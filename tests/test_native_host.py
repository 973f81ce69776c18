"""Native host kernels (csrc/kidhost.cpp): cell-hashed bond init and
union-find conglomerate labels must reproduce the numpy O(n^2) path."""

import numpy as np
import pytest

import icebergs_tpu as ibt
from icebergs_tpu import native
from icebergs_tpu.ops import forces


@pytest.mark.skipif(not native.available(), reason="no g++ available")
def test_native_bond_init_matches_numpy():
    rng = np.random.RandomState(42)
    n = 700   # > the 512 native threshold
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             iceberg_bonds_on=True, max_bonds=6,
                             manually_initialize_bonds_from_radii=True)
    # clustered population so plenty of bonds form
    centers = rng.uniform(0., 50e3, (30, 2))
    pts = centers[rng.randint(0, 30, n)] + rng.uniform(-900, 900, (n, 2))
    st = ibt.create_bergs(1024, lon=pts[:, 0], lat=pts[:, 1],
                          mass=8.5e8, thickness=100., width=400.,
                          length=400., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1, max_bonds=6)

    st_native = forces.initialize_bonds_host(st, cfg)

    # force the numpy path by building on a small-capacity clone
    import icebergs_tpu.native as nat
    saved = nat.available
    nat.available = lambda: False
    try:
        st_numpy = forces.initialize_bonds_host(st, cfg)
    finally:
        nat.available = saved

    np.testing.assert_array_equal(np.asarray(st_native.bond_idx),
                                  np.asarray(st_numpy.bond_idx))
    np.testing.assert_allclose(np.asarray(st_native.bond_length),
                               np.asarray(st_numpy.bond_length),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(st_native.n_bonds),
                                  np.asarray(st_numpy.n_bonds))
    # conglomerate partitions agree (labels may differ by renaming)
    la = np.asarray(st_native.conglom_id)
    lb = np.asarray(st_numpy.conglom_id)
    import itertools
    pairs_a = {(i, j) for i, j in itertools.combinations(range(n), 2)
               if la[i] == la[j]}
    pairs_b = {(i, j) for i, j in itertools.combinations(range(n), 2)
               if lb[i] == lb[j]}
    assert pairs_a == pairs_b
    assert int(np.asarray(st_native.n_bonds).sum()) > 100


@pytest.mark.skipif(not native.available(), reason="no g++ available")
def test_native_latlon_metric():
    """Lat-lon metric: bond distances use cos(mean lat) scaling."""
    cfg = ibt.IcebergsConfig(grid_is_latlon=True, Lx=360.,
                             iceberg_bonds_on=True, max_bonds=4)
    # two bergs 0.01 deg apart in lon at 60S: ~556 m apart
    n = 600
    rng = np.random.RandomState(1)
    lon = 10. + np.concatenate([[0., 0.01], rng.uniform(5, 8, n - 2)])
    lat = -60. + np.concatenate([[0., 0.], rng.uniform(1, 3, n - 2)])
    st = ibt.create_bergs(1024, lon=lon, lat=lat, mass=8.5e8,
                          thickness=100., width=1000., length=1000.,
                          mass_scaling=1., id_cnt=np.arange(n) + 1,
                          max_bonds=4)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=700.))
    assert int(st.bond_idx[0, 0]) == 1
    got = float(st.bond_length[0, 0])
    expect = (np.pi / 180.) * cfg.Rearth * 0.01 * np.cos(np.radians(-60.))
    # lon is stored f32, so the 0.01-deg difference carries ~1e-4
    # relative cancellation error; the kernel itself computes in f64
    np.testing.assert_allclose(got, expect, rtol=5e-4)
