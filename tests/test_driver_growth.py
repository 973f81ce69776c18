"""Driver-level buffer growth (the increase_ibuffer analog,
icebergs_framework.F90:3710-3747): a footloose spawn burst that exceeds
the slot pool must GROW the capacity and re-run the step — children are
spawned, never silently dropped (VERDICT r3 weak #5)."""

import math

import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import constants as C
from icebergs_tpu import driver as drv
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import restart as rio

NML = """
&icebergs_driver_nml
  ni=20
  nj=20
  ibdt=1800.0
  ibhrs=1
  nmax=2
  gridres=5000.0
/

&icebergs_nml
  grid_is_latlon=.false.
  Lx=-1.
  use_f_plane=.true.
  lat_ref=0.
  Runge_not_Verlet=.false.
  use_new_predictive_corrective=.true.
  footloose=.true.
  fl_style='new_bergs'
  fl_youngs=1.e8
  fl_strength=250.
  allow_bergs_to_roll=.false.
  set_melt_rates_to_zero=.true.
  ignore_traj=.true.
/
"""


def _foot_area(cfg, T):
    """fl foot area per child (footloose._constants arithmetic)."""
    e1 = math.exp(0.25 * math.pi)
    drho = C.RHO_SEAWATER - cfg.rho_bergs
    sigmay = cfg.fl_strength * 1000.
    lfootparam = e1 * C.RHO_SEAWATER * sigmay / (
        6. * cfg.rho_bergs * C.GRAVITY * drho)
    l_c = math.pi / (2. * math.sqrt(2.))
    lw_c = 1. / (C.GRAVITY * C.RHO_SEAWATER)
    B_c = cfg.fl_youngs / (12. * (1. - 0.3 ** 2))
    l_w = (lw_c * B_c * T ** 3) ** 0.25
    l_b = l_c * l_w
    foot_l = lfootparam * T / l_w
    return foot_l * 3. * l_b


def test_driver_grows_capacity_on_fl_spawn_overflow(tmp_path, capsys):
    nml = tmp_path / "input.nml"
    nml.write_text(NML)

    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             footloose=True, fl_style='new_bergs',
                             fl_youngs=1.e8, fl_strength=250.)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    T = 250.
    # 4 primed parents (fl_k = 1.5 foot areas -> each sheds exactly one
    # child on step 1) in a 5-slot pool: 3 spawns find no slot
    fa = _foot_area(cfg, T)
    st = ibt.create_bergs(5, lon=[30000., 50000., 70000., 40000.],
                          lat=[30000., 50000., 70000., 60000.],
                          thickness=T, width=6000., length=8000.,
                          mass=850. * T * 6000. * 8000.,
                          mass_scaling=1., fl_k=1.5 * fa)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"), st, cfg)

    st2 = drv.run(str(nml), input_dir=str(tmp_path),
                  output_dir=str(tmp_path / "out"), capacity=5,
                  verbose=False)

    text = capsys.readouterr().out
    assert "growing capacity" in text, text[-2000:]
    # every child spawned: 4 parents + 4 children, in a grown pool
    assert int(np.asarray(st2.count())) == 8
    assert st2.capacity > 5
    ks = np.asarray(st2.fl_k)[np.asarray(st2.alive)]
    assert (ks < 0.).sum() == 4        # the children carry fl_k=-1/-2


FUSED_NML = """
&icebergs_driver_nml
  ni=16
  nj=16
  ibdt=60.0
  ibhrs=1
  nmax=2
  gridres=1000.0
/

&icebergs_nml
  grid_is_latlon=.false.
  Lx=-1.
  use_f_plane=.true.
  lat_ref=0.
  Runge_not_Verlet=.false.
  interactive_icebergs_on=.true.
  spring_coef=1.e-6
  allow_bergs_to_roll=.false.
  set_melt_rates_to_zero=.true.
  ignore_traj=.true.
/
"""


def test_driver_grows_fused_fallback_cap_on_overflow(tmp_path, capsys):
    """A contact cluster larger than the fused fallback cap must grow
    the cap and RE-RUN the step (exact-search contract; round-5
    driver chain for cfg.fused_fallback_cap)."""
    nml = tmp_path / "input.nml"
    nml.write_text(FUSED_NML)

    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             interactive_icebergs_on=True)
    rng = np.random.RandomState(0)
    n = 40
    # dense knot: everyone within everyone's interaction radius ->
    # every berg has >= 3 engaged contacts -> all are fallback rows
    lon = 7700. + rng.uniform(-150., 150., n)
    lat = 7700. + rng.uniform(-150., 150., n)
    st = ibt.create_bergs(64, lon=lon, lat=lat, thickness=40.,
                          width=400., length=400.,
                          mass=850. * 40. * 400. * 400.,
                          mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"), st, cfg)

    # shrink the default cap below the 40-row fallback population
    st2 = drv.run(str(nml), input_dir=str(tmp_path),
                  output_dir=str(tmp_path / "out"), capacity=64,
                  verbose=False,
                  cfg_overrides={"fused_fallback_cap": 8})

    text = capsys.readouterr().out
    assert "contact fallback cap overran" in text, text[-2000:]
    assert int(np.asarray(st2.count())) == n
    assert np.isfinite(np.asarray(st2.lon)[np.asarray(st2.alive)]).all()
