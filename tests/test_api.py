"""Full-pipeline API test: IcebergsModel.run executes the complete
icebergs_run sequence (calving -> spawn -> evolve -> footloose -> melt ->
spread) with mass-budget closure."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.api import IcebergsModel, prepare_forcing
from icebergs_tpu.grid import pos_to_cell


def test_full_pipeline_with_calving_and_melt():
    cfg = ibt.IcebergsConfig(grid_is_latlon=True, Lx=360., dt=3600.,
                             footloose=True, fl_style='fl_bits',
                             allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(12, 12, 0., -65., 0.5, 0.5,
                                 grid_is_latlon=True)
    frc = ibt.uniform_forcing(12, 12, uo=0.2, ua=4.0, sst=3.0, sss=34.)
    model = IcebergsModel(grid, cfg)

    st = ibt.empty_state(128)
    state = model.init_state(st, seed=3, year=2001, yearday=5.0)

    # steady calving flux in two coastal cells
    calving = jnp.zeros((14, 14)).at[3, 3].set(4.0e7).at[9, 9].set(2.0e7)
    hflx = jnp.zeros((14, 14))

    total_in = 0.0
    melt_out = 0.0
    for n in range(6):
        state, out = model.run(state, frc, calving, hflx)
        melt_out += float(jnp.sum(out.floating_melt * grid.area)) * cfg.dt

    assert int(out.nbergs) > 0
    b = out.budgets
    # closure: mass in bergs + buckets = calving used - melt
    used = 0.99 * float(jnp.sum(calving)) * cfg.dt * 6   # S-hemisphere 0.99
    lhs = float(b.mass + b.mass_of_bits + b.stored_ice)
    np.testing.assert_allclose(lhs, used - melt_out, rtol=2e-3)

    # spread fields are populated where bergs live
    assert float(jnp.max(out.spread_mass)) > 0.
    assert float(jnp.max(out.ustar_iceberg)) > 0.
    # stocks API
    water, heat = model.stock_pe(state)
    np.testing.assert_allclose(float(water), lhs, rtol=1e-5)
    assert float(heat) < 0.


def test_prepare_forcing_interface():
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.)
    grid = ibt.make_uniform_grid(8, 8, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(8, 8, ua=0.1, va=0.0, sst=278.15)
    out = prepare_forcing(grid, cfg, frc)
    # Kelvin -> Celsius autodetect
    np.testing.assert_allclose(float(out.sst[4, 4]), 5.0, atol=1e-3)
    # wind stress (0.1 Pa) -> speed sqrt(tau/cd), cd=0.0015, NO air
    # density (invert_tau_for_du divides by sqrt(cd*|tau|),
    # icebergs.F90:8281-8292)
    expected = np.sqrt(0.1 / 0.0015)
    np.testing.assert_allclose(float(out.ua[4, 4]), expected, rtol=1e-4)
    # tau_is_velocity passes winds through
    out2 = prepare_forcing(grid, cfg.replace(tau_is_velocity=True), frc)
    np.testing.assert_allclose(float(out2.ua[4, 4]), 0.1, rtol=1e-5)
