"""End-to-end footloose pipeline (the reference's footloose_tests setup):
wave erosion accumulates the underwater foot on a big tabular berg, which
then sheds mass into footloose bits through the full IcebergsModel.run
sequence."""

import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.api import IcebergsModel
from icebergs_tpu.grid import pos_to_cell


def test_footloose_bits_shed_through_full_pipeline():
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1., use_f_plane=True, lat_ref=0.,
        dt=1800.0, Runge_not_Verlet=False,
        use_new_predictive_corrective=True,
        footloose=True, fl_style='fl_bits', fl_youngs=1.e8,
        fl_strength=250., allow_bergs_to_roll=False)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    # warm water + strong wind: erosion-dominated side melt
    frc = ibt.uniform_forcing(20, 20, uo=0.0, ua=10.0, sst=2.0, sss=33.)

    st = ibt.create_bergs(64, lon=[50000.], lat=[50000.], thickness=250.,
                          width=20000., length=30000.,
                          mass=850. * 250 * 20000. * 30000.,
                          mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    model = IcebergsModel(grid, cfg)
    state = model.init_state(st, seed=1)
    m0 = float(st.mass[0])

    shed = 0.0
    for _ in range(200):   # 100 h
        state, out = model.run(state, frc)
    stf = state.bergs
    alive = np.asarray(stf.alive)
    assert alive.sum() >= 1
    b = int(np.nonzero(alive)[0][0])
    # foot accumulated and/or bits shed
    bits = float(stf.mass_of_fl_bits[b])
    flk = float(stf.fl_k[b])
    assert bits > 0. or flk > 0., (bits, flk)
    # parent shrank
    assert float(stf.mass[b]) < m0
    # with warm water the parent must have shed actual bits eventually
    assert bits > 0., bits


def test_footloose_new_bergs_through_full_pipeline():
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1., use_f_plane=True, lat_ref=0.,
        dt=1800.0, Runge_not_Verlet=False,
        use_new_predictive_corrective=True,
        footloose=True, fl_style='new_bergs', fl_youngs=1.e8,
        fl_strength=250., allow_bergs_to_roll=False,
        interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, ua=12.0, sst=3.0, sss=33.)
    st = ibt.create_bergs(64, lon=[50000.], lat=[50000.], thickness=250.,
                          width=20000., length=30000.,
                          mass=850. * 250 * 20000. * 30000.,
                          mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    model = IcebergsModel(grid, cfg)
    state = model.init_state(st, seed=2)
    nmax = 1
    for _ in range(300):
        state, out = model.run(state, frc)
        nmax = max(nmax, int(out.nbergs))
    # children calved as independent bergs
    assert nmax > 1, nmax
    stf = state.bergs
    alive = np.asarray(stf.alive)
    if alive.sum() > 1:
        # children carry the footloose child marker (-1 or -2)
        ks = np.asarray(stf.fl_k)[alive]
        assert np.any(ks < 0.)
