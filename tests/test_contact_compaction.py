"""Active-contact compaction must reproduce the full pair path exactly
(when the cap is not exceeded)."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell


def world(n=30, seed=3):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=10., dt=60.0, Runge_not_Verlet=False,
                             interactive_icebergs_on=True,
                             use_new_predictive_corrective=True,
                             spring_coef=1.e-5, allow_bergs_to_roll=False)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, sst=-2.)
    rng = np.random.RandomState(seed)
    st = ibt.create_bergs(64, lon=rng.uniform(3000., 13000., n),
                          lat=rng.uniform(3000., 13000., n),
                          mass=850. * 100 * 500 * 500, thickness=100.,
                          width=500., length=500., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return cfg, grid, frc, st.replace(ine=i, jne=j, xi=xi, yj=yj)


def by_id(st, field):
    alive = np.asarray(st.alive)
    return dict(zip(np.asarray(st.id_cnt)[alive].tolist(),
                    np.asarray(getattr(st, field))[alive].tolist()))


def test_compaction_matches_full_path():
    cfg, grid, frc, st = world()
    step_full = ibt.make_step(grid, cfg, with_thermo=False)
    step_cmp = ibt.make_step(grid, cfg, with_thermo=False, contact_cap=64)
    sf, sc = st, st
    for _ in range(25):
        sf, _ = step_full(sf, frc)
        sc, _ = step_cmp(sc, frc)
    lf, lc = by_id(sf, "lon"), by_id(sc, "lon")
    uf, uc = by_id(sf, "uvel"), by_id(sc, "uvel")
    for k in lf:
        assert lf[k] == lc[k], (k, lf[k], lc[k])     # bitwise identical
        assert uf[k] == uc[k], (k, uf[k], uc[k])
