"""Quadrant neighbor window: the 2x2 candidate block nearest (xi, yj)
must reproduce the full 3x3 stencil whenever the pair cutoff is below
half a cell (can_use_quadrant_window)."""

import jax
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces


def dense_world(n=200, seed=3):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30., dt=60.,
                             Runge_not_Verlet=False,
                             interactive_icebergs_on=True,
                             use_new_predictive_corrective=True)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(seed)
    # crowded mid-domain cluster: many pairs within the ~170 m cutoff
    st = ibt.create_bergs(256,
                          lon=rng.uniform(6e3, 10e3, n),
                          lat=rng.uniform(6e3, 10e3, n),
                          uvel=rng.uniform(-.2, .2, n),
                          vvel=rng.uniform(-.2, .2, n),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    return cfg, grid, st


def test_quadrant_window_precondition():
    cfg, grid, st = dense_world()
    assert forces.can_use_quadrant_window(st, grid, cfg)
    # giant bergs break the precondition
    big = st.replace(width=st.width * 20., length=st.length * 20.)
    assert not forces.can_use_quadrant_window(big, grid, cfg)


def test_quadrant_candidates_cover_all_engaged_pairs():
    cfg, grid, st = dense_world()
    full = forces.build_neighbor_tables(st, grid, cfg, max_per_cell=16)
    quad = forces.build_neighbor_tables(st, grid, cfg, max_per_cell=16,
                                        window="quadrant")
    pd_f = forces.precompute_pair_data(st, cfg, full.cand_idx,
                                       full.cand_valid, bonded=False,
                                       use_c_crit_dist=False)
    pd_q = forces.precompute_pair_data(st, cfg, quad.cand_idx,
                                       quad.cand_valid, bonded=False,
                                       use_c_crit_dist=False)
    # every engaged pair of the full stencil appears in the quadrant set
    def engaged_pairs(nbr, pd):
        act = np.asarray(pd.active)
        ci = np.asarray(nbr.cand_idx)
        me = np.arange(ci.shape[0])[:, None] * np.ones_like(ci)
        return set(zip(me[act].tolist(), ci[act].tolist()))
    ef, eq = engaged_pairs(full, pd_f), engaged_pairs(quad, pd_q)
    assert len(ef) > 20, "test needs a crowded cluster"
    assert ef == eq


def test_quadrant_step_matches_full():
    cfg, grid, st = dense_world()
    frc = ibt.uniform_forcing(16, 16, uo=.1, vo=.05, sst=2.)
    step_f = ibt.make_step(grid, cfg, with_thermo=False, max_per_cell=16)
    step_q = ibt.make_step(grid, cfg, with_thermo=False, max_per_cell=16,
                           neighbor_window="quadrant")
    sf, sq = st, st
    for _ in range(30):
        sf, _ = step_f(sf, frc)
        sq, _ = step_q(sq, frc)
    af = np.asarray(sf.alive)
    np.testing.assert_allclose(np.asarray(sq.lon)[af],
                               np.asarray(sf.lon)[af], rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sq.uvel)[af],
                               np.asarray(sf.uvel)[af], rtol=0, atol=1e-6)


def test_quadrant_plus_compaction_matches_full():
    """The bench configuration: quadrant window + contact compaction must
    track the plain 3x3 full-eval path."""
    cfg, grid, st = dense_world(seed=11)
    frc = ibt.uniform_forcing(16, 16, uo=.1, vo=.05, sst=2.)
    step_f = ibt.make_step(grid, cfg, with_thermo=False, max_per_cell=16)
    step_qc = ibt.make_step(grid, cfg, with_thermo=False, max_per_cell=16,
                            neighbor_window="quadrant", contact_cap=256)
    sf, sq = st, st
    for _ in range(30):
        sf, _ = step_f(sf, frc)
        sq, _ = step_qc(sq, frc)
    af = np.asarray(sf.alive)
    np.testing.assert_allclose(np.asarray(sq.lon)[af],
                               np.asarray(sf.lon)[af], rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sq.uvel)[af],
                               np.asarray(sf.uvel)[af], rtol=0, atol=1e-6)
