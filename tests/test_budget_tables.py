"""Category-resolved budget tables (diag.report_full_budget — the
reference's report_state/report_ibudget block, icebergs.F90:5780-5860):
term-by-term closure of every mass/heat/count table over a run with all
source/sink processes active (VERDICT r3 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import diag
from icebergs_tpu.api import IcebergsModel
from icebergs_tpu.grid import pos_to_cell


def _run_interval(cfg, grid, frc, st, nsteps, calving=None,
                  calving_hflx=None):
    model = IcebergsModel(grid, cfg)
    state = model.init_state(st, seed=3)
    b0 = diag.compute_budgets(state.bergs, state.calving)
    acc = diag.IntervalBudget()
    for _ in range(nsteps):
        state, out = model.run(state, frc, calving, calving_hflx)
        acc.add_step(out, grid, cfg.dt)
    b1 = diag.compute_budgets(state.bergs, state.calving)
    errs = diag.report_full_budget("test", b0, b1, acc)
    return errs, acc, b0, b1


def test_budget_tables_close_melt_and_calving():
    """Bucket calving in + berg spawning + melt + bergy bits: every
    mass table closes term-by-term; the berg-count table is exact."""
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.,
        dt=3600.0, Runge_not_Verlet=False,
        use_new_predictive_corrective=True,
        bergy_bit_erosion_fraction=0.3, allow_bergs_to_roll=True,
        initial_mass=(8.8e7,) * 10, distribution=(1.0,) + (0.0,) * 9,
        mass_scaling=(1.0,) * 10,
        initial_mass_n=(8.8e7,) * 10,
        distribution_n=(1.0,) + (0.0,) * 9,
        mass_scaling_n=(1.0,) * 10)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    # warm water + wind: strong melt and erosion into bits
    frc = ibt.uniform_forcing(16, 16, uo=0.1, ua=12.0, sst=6.0, sss=33.)

    st = ibt.create_bergs(64, lon=[30000., 45000.], lat=[40000., 40000.],
                          thickness=40., width=300., length=400.,
                          mass=850. * 40 * 300 * 400, mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # steady calving flux into a few cells -> buckets fill -> spawns
    # (the module convention is kg/s per cell, calving.py:96)
    calving = jnp.zeros((18, 18), jnp.float32)
    calving = calving.at[5, 5].set(5.e4).at[9, 9].set(1.e5)  # kg/s
    hflx = calving * 1e-4                                    # W/m2

    errs, acc, b0, b1 = _run_interval(cfg, grid, frc, st, 24,
                                      calving=calving, calving_hflx=hflx)

    assert acc.nbergs_calved > 0, "no spawns — scenario too weak"
    assert acc.net_melt > 0, "no melt"
    assert acc.bergy_src > 0, "no bits erosion"
    # mass tables close term-by-term (f32 global sums)
    for row in ("stored mass", "floating mass", "berg mass",
                "bits mass"):
        assert abs(errs[row]) < 5e-5, (row, errs[row])
    # heat tables
    for row in ("stored heat", "flting heat"):
        assert abs(errs[row]) < 1e-3, (row, errs[row])
    # berg count decomposition is exact
    assert errs["berg #"] == 0


def test_budget_tables_close_footloose():
    """Footloose fl-bits shedding: the fl-category table closes (shed
    mass in, fl melt + fl-bergy melt out)."""
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1., use_f_plane=True, lat_ref=0.,
        dt=1800.0, Runge_not_Verlet=False,
        use_new_predictive_corrective=True,
        footloose=True, fl_style='fl_bits', fl_youngs=1.e8,
        fl_strength=250., allow_bergs_to_roll=False,
        bergy_bit_erosion_fraction=0.3)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, uo=0.0, ua=10.0, sst=2.0, sss=33.)
    st = ibt.create_bergs(64, lon=[50000.], lat=[50000.], thickness=250.,
                          width=20000., length=30000.,
                          mass=850. * 250 * 20000. * 30000.,
                          mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    errs, acc, b0, b1 = _run_interval(cfg, grid, frc, st, 200)

    assert acc.fl_bits_src > 0, "no footloose shedding"
    # f32 accumulation floor: the 1.3e15 kg parent's per-step mass
    # updates round at ~1.3e8 kg ulp, so 200 steps of flows measured
    # against state deltas of ~1e11-1e12 kg close to ~1e-3, not 1e-7
    for row in ("floating mass", "berg mass", "bits mass",
                "fl bits mass"):
        assert abs(errs[row]) < 2e-3, (row, errs[row])
    assert errs["berg #"] == 0
