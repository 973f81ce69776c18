"""End-to-end stand-alone driver test: namelist -> restart read -> time
loop -> budget report -> restart/trajectory write (the reference's
driver/icebergs_driver.F90 flow on a small synthetic case)."""

import os

import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import driver as drv
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import restart as rio

NML = """
&icebergs_driver_nml
  ni=20
  nj=20
  ibdt=600.0
  ibuo=0.2
  ibvo=0.0
  ibhrs=4
  nmax=1000
  saverestart=.true.
  gridres=1000.0
/

&icebergs_nml
  grid_is_latlon=.false.
  Lx=20000.
  use_f_plane=.true.
  lat_ref=0.
  Runge_not_Verlet=.false.
  use_new_predictive_corrective=.true.
  traj_sample_hrs=1.0
  set_melt_rates_to_zero=.false.
/
"""


def test_driver_end_to_end(tmp_path, capsys):
    nml = tmp_path / "input.nml"
    nml.write_text(NML)

    # build an initial restart like the makeberg tooling would
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=20000.)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    st = ibt.create_bergs(64, lon=[5000., 9000., 13000.],
                          lat=[9500., 10500., 9000.],
                          mass=850. * 20 * 100 * 100, thickness=20.,
                          width=100., length=100., mass_scaling=1.)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"), st, cfg)

    out = tmp_path / "out"
    st2 = drv.run(str(nml), input_dir=str(tmp_path), output_dir=str(out),
                  capacity=64, verbose=False)

    # bergs drifted east with the 0.2 m/s current over 4 h
    lon = np.asarray(st2.lon)[np.asarray(st2.alive)]
    assert np.all(lon > np.array([5000., 9000., 13000.]))
    # outputs written
    assert (out / "icebergs.res.nc").exists()
    assert (out / "calving.res.nc").exists()
    assert (out / "iceberg_trajectories.nc").exists()
    cap = capsys.readouterr().out
    assert "bergs_chksum" in cap
    assert "budget" in cap

    # trajectory has 4 hourly samples x 3 bergs
    from scipy.io import netcdf_file
    with netcdf_file(str(out / "iceberg_trajectories.nc"), "r",
                     mmap=False) as f:
        assert np.asarray(f.variables["lon"][:]).shape[0] == 12


def test_driver_transient_a68_branch(tmp_path, monkeypatch, capsys):
    """a68_test + transient_a68_data_start_ind: hourly frame swap with the
    half-hour blend (driver:368-385), through driver.run()."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import run_a68
    import numpy as np
    import icebergs_tpu as ibt
    from icebergs_tpu.io import restart as rio, a68
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import driver

    d = tmp_path / "data"
    d.mkdir()
    run_a68.write_synthetic(str(d), ni=24, nj=16, nt=12)
    (tmp_path / "input.nml").write_text("""
&icebergs_driver_nml
  a68_test=.true.
  transient_a68_data_start_ind=2
  data_dir='%s/'
  ibdt=1800.
  ibhrs=2
  saverestart=.true.
/
&icebergs_nml
  grid_is_latlon=.true.
  grid_is_regular=.true.
  Lx=360.
  set_melt_rates_to_zero=.true.
  verbose_hrs=2
/
""" % d)
    cfg = ibt.IcebergsConfig(grid_is_latlon=True, grid_is_regular=True,
                             Lx=360.)
    data = a68.load_a68(str(d), cfg)
    lon_c = float(np.asarray(data.grid.lon0)) \
        + 0.5 * data.grid.nx * float(np.asarray(data.grid.dlon))
    lat_c = float(np.asarray(data.grid.lat0)) \
        + 0.5 * data.grid.ny * float(np.asarray(data.grid.dlat))
    st = ibt.create_bergs(16, lon=[lon_c], lat=[lat_c], mass=8.5e10,
                          thickness=200., width=2000., length=2000.,
                          mass_scaling=1., id_cnt=[1])
    i, j, xi, yj = pos_to_cell(data.grid, st.lon, st.lat, 360.)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"),
                            st.replace(ine=i, jne=j, xi=xi, yj=yj), cfg)

    out = driver.run(str(tmp_path / "input.nml"), str(tmp_path),
                     str(tmp_path / "out"), capacity=16, verbose=False)
    lon1 = float(np.asarray(out.lon)[0])
    assert np.isfinite(lon1) and lon1 != lon_c   # advected by the jet
    assert (tmp_path / "out" / "icebergs.res.nc").exists()


DEM_NML = """
&icebergs_driver_nml
  ni=24
  nj=24
  ibdt=120.0
  ibuo=0.15
  ibvo=0.05
  ibhrs=1
  nmax=1000
  saverestart=.false.
  gridres=7000.0
/

&icebergs_nml
  grid_is_latlon=.false.
  Lx=-1.
  use_f_plane=.true.
  lat_ref=-55.
  Runge_not_Verlet=.false.
  mts=.true.
  mts_sub_steps=12
  dem=.true.
  explicit_inner_mts=.true.
  dem_spring_coef=5.e6
  dem_damping_coef=1.0
  interactive_icebergs_on=.true.
  iceberg_bonds_on=.true.
  spring_coef=0.00065
  contact_spring_coef=1.e-7
  contact_distance=4.e3
  use_broken_bonds_for_substep_contact=.true.
  break_bonds_on_sub_steps=.true.
  fracture_criterion='stress'
  frac_thres_n=18.e3
  frac_thres_t=100.e3
  constant_interaction_LW=.true.
  manually_initialize_bonds=.true.
  manually_initialize_bonds_from_radii=.true.
  allow_bergs_to_roll=.false.
  max_bonds=6
/
"""


def _dem_world(tmp_path):
    from icebergs_tpu.ops import forces as FO
    import jax.numpy as jnp
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1., iceberg_bonds_on=True, max_bonds=6,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True).normalized(warn=False)
    grid = ibt.make_uniform_grid(24, 24, 0., 0., 7000., 7000.,
                                 grid_is_latlon=False)
    r = 1500.0
    px, py = np.meshgrid(np.arange(4) * 2 * r, np.arange(4) * 2 * r,
                         indexing="ij")
    lon = px.ravel() + 30000.
    lat = py.ravel() + 40000.
    n = lon.size
    st = ibt.create_bergs(64, lon=lon, lat=lat,
                          mass=850. * 200. * (2 * r) ** 2, thickness=200.,
                          width=2 * r, length=2 * r, mass_scaling=1.,
                          id_cnt=np.arange(n) + 1, max_bonds=6)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    conglom_id=jnp.asarray(np.concatenate(
                        [np.ones(n), np.zeros(64 - n)]).astype(np.int32)))
    st = FO.initialize_bonds_host(st, cfg)
    st = FO.count_bonds(st)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"), st, cfg)
    rio.write_restart_bonds(str(tmp_path / "bonds_iceberg.res.nc"), st, cfg)


def test_driver_vmem_substep_kernel(tmp_path):
    """--substep-kernel vmem (interpret on CPU) matches the scan path on
    a bonded conglomerate driven end-to-end through the driver."""
    nml = tmp_path / "input.nml"
    nml.write_text(DEM_NML)
    _dem_world(tmp_path)

    s_scan = drv.run(str(nml), input_dir=str(tmp_path),
                     output_dir=str(tmp_path / "o1"), capacity=64,
                     verbose=False, substep_kernel="scan")
    s_vmem = drv.run(str(nml), input_dir=str(tmp_path),
                     output_dir=str(tmp_path / "o2"), capacity=64,
                     verbose=False, substep_kernel="vmem")
    # the vmem layout rounds the 64-slot capacity up to one 128 block —
    # proof the kernel path actually engaged (no silent fallback)
    assert s_vmem.capacity == 128, s_vmem.capacity
    # vmem packing may permute slots: compare by id
    o1 = np.argsort(np.asarray(s_scan.id_cnt)[np.asarray(s_scan.alive)])
    o2 = np.argsort(np.asarray(s_vmem.id_cnt)[np.asarray(s_vmem.alive)])
    for f in ("lon", "lat", "uvel", "vvel", "mass", "rot"):
        a = np.asarray(getattr(s_scan, f))[np.asarray(s_scan.alive)][o1]
        b = np.asarray(getattr(s_vmem, f))[np.asarray(s_vmem.alive)][o2]
        scale = max(np.max(np.abs(a)), 1.0)
        assert np.max(np.abs(a - b)) / scale < 5e-6, f
