"""Calving pipeline tests: bucket accumulation, berg spawning, heat
inheritance, and mass conservation (reference: accumulate_calving /
calve_icebergs, icebergs.F90:6153-6402).
"""

import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import calving as cv


def world(lat0=-10.0):
    cfg = ibt.IcebergsConfig(grid_is_latlon=True, Lx=360., dt=3600.0)
    grid = ibt.make_uniform_grid(8, 8, 0.0, lat0, 0.5, 0.5,
                                 grid_is_latlon=True)
    frc = ibt.uniform_forcing(8, 8)
    st = ibt.empty_state(64)
    calv = cv.init_calving_state(grid)
    return cfg, grid, frc, st, calv


def test_accumulate_distribution():
    cfg, grid, frc, st, calv = world()
    calving = jnp.zeros((10, 10)).at[4, 4].set(100.0)   # kg/s in one cell
    hflx = jnp.zeros((10, 10))
    calv, resid, _, used, _ = cv.accumulate_calving(calv, grid, calving,
                                                    hflx, cfg)
    # southern-hemisphere Gladstone distribution sums to 0.99
    total = float(jnp.sum(calv.stored_ice[4, 4]))
    np.testing.assert_allclose(total, 100.0 * 3600 * 0.99, rtol=1e-5)
    np.testing.assert_allclose(float(resid[4, 4]), 1.0, rtol=1e-3)
    np.testing.assert_allclose(float(used), 99.0 * 3600, rtol=1e-5)


def test_spawn_from_full_bucket():
    cfg, grid, frc, st, calv = world()
    # fill class-0 bucket of cell (3,3) past threshold:
    # initial_mass=8.8e7, scaling=2000 -> 1.76e11 kg
    thr = 8.8e7 * 2000.
    stored = calv.stored_ice.at[4, 4, 0].set(1.5 * thr)
    heat = calv.stored_heat.at[4, 4].set(1.5 * thr * 1.0e4)   # J
    calv = calv.replace(stored_ice=stored, stored_heat=heat)

    st2, calv2, d = cv.calve_icebergs(st, calv, grid, frc, cfg,
                                      current_year=2000,
                                      current_yearday=10.0)
    assert int(d["nbergs_calved"]) == 1
    assert int(st2.count()) == 1
    b = int(np.nonzero(np.asarray(st2.alive))[0][0])
    assert float(st2.mass[b]) == 8.8e7
    assert float(st2.mass_scaling[b]) == 2000.
    assert float(st2.thickness[b]) == 40.
    # L/W ratio
    np.testing.assert_allclose(float(st2.length[b] / st2.width[b]),
                               cfg.LoW_ratio, rtol=1e-5)
    # heat density = stored_heat/stored_ice = 1e4 J/kg
    np.testing.assert_allclose(float(st2.heat_density[b]), 1.0e4, rtol=1e-4)
    # bucket decremented by initial_mass*scaling
    np.testing.assert_allclose(float(calv2.stored_ice[4, 4, 0]),
                               0.5 * thr, rtol=1e-5)
    # position: center of cell (3,3)
    assert abs(float(st2.lon[b]) - 1.75) < 1e-3
    assert int(st2.ine[b]) == 3 and int(st2.jne[b]) == 3
    # environment was interpolated onto the newborn
    assert np.isfinite(float(st2.sst[b]))


def test_mass_conservation_through_pipeline():
    cfg, grid, frc, st, calv = world()
    calving = jnp.zeros((10, 10)).at[5, 5].set(5.0e7)   # huge flux
    hflx = jnp.zeros((10, 10))
    total_in = 0.
    for _ in range(4):
        calv, resid, _, used, _ = cv.accumulate_calving(calv, grid, calving,
                                                        hflx, cfg)
        total_in += float(used)
        st, calv, d = cv.calve_icebergs(st, calv, grid, frc, cfg)
    mass_bergs = float(jnp.sum(jnp.where(st.alive, st.mass * st.mass_scaling,
                                         0.)))
    mass_buckets = float(jnp.sum(calv.stored_ice))
    np.testing.assert_allclose(mass_bergs + mass_buckets, total_in,
                               rtol=1e-4)


def test_northern_hemisphere_tables():
    cfg, grid, frc, st, calv = world(lat0=40.0)
    cfg = cfg.replace(separate_distrib_for_n_hemisphere=True)
    thr = 4.58e8 * 200.   # N-hemisphere class-0
    calv = calv.replace(stored_ice=calv.stored_ice.at[4, 4, 0].set(1.2 * thr))
    st2, calv2, d = cv.calve_icebergs(st, calv, grid, frc, cfg)
    assert int(d["nbergs_calved"]) == 1
    b = int(np.nonzero(np.asarray(st2.alive))[0][0])
    assert float(st2.mass[b]) == 4.58e8
    assert float(st2.thickness[b]) == np.float32(80.4)
