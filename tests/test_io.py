"""I/O tests: restart round trip (bergs/bonds/calving), namelist parsing
of the reference's own input.nml files, trajectory buffer + NetCDF drain.
"""

import os

import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import calving as cv
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import restart as rio
from icebergs_tpu.io import namelist as nml
from icebergs_tpu.io import trajectory as tio
from icebergs_tpu.ops import forces

REF_NML = "/root/reference/tests/collision_tests/input_MTS_KID.nml"


def world():
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, dt=600.,
                             iceberg_bonds_on=True, dem=True, mts=True,
                             footloose=True, max_bonds=4)
    grid = ibt.make_uniform_grid(10, 10, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    st = ibt.create_bergs(32, lon=[2500., 2900., 7700.],
                          lat=[2500., 2500., 7100.],
                          mass=[1e8, 2e8, 3e8], thickness=[10., 20., 30.],
                          width=[30., 40., 50.], length=[60., 70., 80.],
                          uvel=[0.1, 0.2, 0.3], mass_scaling=1.,
                          id_cnt=[1, 2, 3], id_ij=[11, 12, 13],
                          max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=600.))
    return cfg, grid, st


def test_restart_roundtrip_bergs_and_bonds(tmp_path):
    cfg, grid, st = world()
    bpath = str(tmp_path / "icebergs.res.nc")
    kpath = str(tmp_path / "bonds_iceberg.res.nc")
    rio.write_restart_bergs(bpath, st, cfg)
    rio.write_restart_bonds(kpath, st, cfg)

    st2 = rio.read_restart_bergs(bpath, 32, grid, cfg)
    assert int(st2.count()) == 3
    for f in ("lon", "lat", "uvel", "mass", "thickness", "width", "length"):
        np.testing.assert_allclose(np.asarray(getattr(st2, f))[:3],
                                   np.asarray(getattr(st, f))[:3], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(st2.ine)[:3],
                                  np.asarray(st.ine)[:3])

    st2 = rio.read_restart_bonds(kpath, st2, cfg)
    # bergs 0 and 1 are 400m apart -> bonded both ways
    assert int(st2.bond_idx[0, 0]) == 1
    assert int(st2.bond_idx[1, 0]) == 0
    assert int(st2.n_bonds[2]) == 0
    # same conglomerate labels restored
    labs = np.asarray(st2.conglom_id)
    assert labs[0] == labs[1] != labs[2]


def test_restart_roundtrip_calving(tmp_path):
    cfg, grid, st = world()
    calv = cv.init_calving_state(grid)
    calv = calv.replace(
        stored_ice=calv.stored_ice.at[3, 4, 2].set(7.5e9),
        stored_heat=calv.stored_heat.at[3, 4].set(1.0e13),
        id_counter=calv.id_counter.at[3, 4].set(17))
    path = str(tmp_path / "calving.res.nc")
    rio.write_restart_calving(path, calv, grid)
    calv2 = rio.read_restart_calving(path, cv.init_calving_state(grid), grid)
    np.testing.assert_allclose(float(calv2.stored_ice[3, 4, 2]), 7.5e9,
                               rtol=1e-6)
    np.testing.assert_allclose(float(calv2.stored_heat[3, 4]), 1.0e13,
                               rtol=1e-6)
    assert int(calv2.id_counter[3, 4]) == 17


def test_namelist_parses_reference_config():
    cfg, drv = nml.config_from_namelist(REF_NML)
    # values straight from tests/collision_tests/input_MTS_KID.nml
    assert cfg.mts is True
    assert cfg.explicit_inner_mts is True
    assert cfg.mts_sub_steps == 60
    assert cfg.contact_distance == 1.75e3
    assert cfg.contact_spring_coef == 1.e-7
    assert cfg.spring_coef == 1.e-5
    assert cfg.grid_is_latlon is False
    assert cfg.hexagonal_icebergs is True
    assert cfg.Lx == 20000.
    assert cfg.force_convergence is True
    assert cfg.dt == 3600.0           # from ibdt
    assert drv["ni"] == 20 and drv["nj"] == 20
    assert drv["ibuo"] == 0.2


def test_bond_trajectory_buffer_and_write(tmp_path):
    cfg, grid, st = world()
    buf = tio.init_bond_traj_buffer(st.capacity, st.max_bonds, nsamples=2)
    buf = tio.record_bonds(buf, st, cfg, day=1.0)
    path = str(tmp_path / "bond_trajectories.nc")
    n, buf = tio.write_trajectories(path, buf, cfg)
    assert n == 2   # bergs 0<->1 bonded both ways
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as f:
        fc = np.asarray(f.variables["first_id_cnt"][:])
        oc = np.asarray(f.variables["other_id_cnt"][:])
    assert sorted(zip(fc.tolist(), oc.tolist())) == [(1, 2), (2, 1)]


def test_trajectory_buffer_and_write(tmp_path):
    cfg, grid, st = world()
    cfg = cfg.replace(save_short_traj=True)
    buf = tio.init_traj_buffer(st.capacity, nsamples=4, cfg=cfg)
    buf = tio.record_posn(buf, st, cfg, day=1.5, year=2000)
    st = st.replace(lon=st.lon + 100.)
    buf = tio.record_posn(buf, st, cfg, day=2.5, year=2000)
    path = str(tmp_path / "iceberg_trajectories.nc")
    n, buf = tio.write_trajectories(path, buf, cfg)
    assert n == 6    # 3 bergs x 2 samples
    from scipy.io import netcdf_file
    with netcdf_file(path, "r", mmap=False) as f:
        lon = np.asarray(f.variables["lon"][:])
        day = np.asarray(f.variables["day"][:])
    assert lon.shape == (6,)
    assert set(np.round(day, 2)) == {1.5, 2.5}
    # append works
    buf = tio.record_posn(buf, st, cfg, day=3.5, year=2000)
    n, buf = tio.write_trajectories(path, buf, cfg)
    with netcdf_file(path, "r", mmap=False) as f:
        assert np.asarray(f.variables["lon"][:]).shape == (9,)


def test_namelist_parses_dem_cbeam_config():
    cfg, drvp = nml.config_from_namelist(
        "/root/reference/tests/dem_cbeam_test/input.nml")
    assert cfg.dem is True and cfg.mts is True
    assert cfg.dem_beam_test == 2
    assert cfg.dem_spring_coef == 1.e9
    assert cfg.mts_sub_steps == 2000
    assert cfg.only_interactive_forces is True
    assert cfg.orig_dem_moment_of_inertia is True
    assert cfg.max_bonds == 4
    assert drvp["nmax"] == 300 and drvp["gridres"] == 15000
    # normalized() coercions hold
    assert cfg.Runge_not_Verlet is False
    assert cfg.explicit_inner_mts is True


def test_config_normalized_coercions():
    import pytest
    cfg = ibt.IcebergsConfig(mts=True, Runge_not_Verlet=True).normalized(
        warn=False)
    assert cfg.Runge_not_Verlet is False
    cfg = ibt.IcebergsConfig(dem=True).normalized(warn=False)
    assert cfg.explicit_inner_mts and cfg.iceberg_bonds_on
    with pytest.raises(ValueError):
        ibt.IcebergsConfig(use_broken_bonds_for_substep_contact=True
                           ).normalized(warn=False)


def test_bond_reciprocity_check():
    cfg, grid, st = world()
    assert int(forces.check_bond_reciprocity(st)) == 0
    # sever one direction: 0 -> 1 stays, 1 -> 0 removed
    import jax.numpy as jnp
    bad = st.replace(bond_idx=st.bond_idx.at[1, 0].set(-1))
    bad = forces.count_bonds(bad)
    assert int(forces.check_bond_reciprocity(bad)) == 1
    from icebergs_tpu import diag
    probs = diag.check_state(bad, grid, cfg, fatal=False)
    assert any("non-reciprocal" in p for p in probs)


def test_read_ocean_depth(tmp_path):
    """topog.nc bathymetry load (read_ocean_depth,
    icebergs_fms2io.F90:1600-1629): present file updates the grid's
    padded ocean_depth; missing file/variable fall through untouched."""
    cfg, grid, st = world()
    depth = np.linspace(10., 500., 100).reshape(10, 10)
    path = str(tmp_path / "topog.nc")
    from scipy.io import netcdf_file
    with netcdf_file(path, "w") as f:
        f.createDimension("nx", 10)
        f.createDimension("ny", 10)
        f.createVariable("depth", "d", ("nx", "ny"))[:] = depth
    g2 = rio.read_ocean_depth(path, grid)
    np.testing.assert_allclose(np.asarray(g2.ocean_depth)[1:-1, 1:-1],
                               depth, rtol=1e-6)
    assert float(g2.ocean_depth[0, 0]) == 0.     # pad ring
    # missing file: unchanged grid
    g3 = rio.read_ocean_depth(str(tmp_path / "nosuch.nc"), grid)
    np.testing.assert_array_equal(np.asarray(g3.ocean_depth),
                                  np.asarray(grid.ocean_depth))
    # file without a depth variable: unchanged
    with netcdf_file(str(tmp_path / "empty.nc"), "w") as f:
        f.createDimension("nx", 10)
        f.createVariable("other", "d", ("nx",))[:] = np.zeros(10)
    g4 = rio.read_ocean_depth(str(tmp_path / "empty.nc"), grid)
    np.testing.assert_array_equal(np.asarray(g4.ocean_depth),
                                  np.asarray(grid.ocean_depth))


def test_tiled_restart_roundtrip(tmp_path):
    """Distributed (io_layout) restarts: per-tile icebergs.res.nc.NNNN
    written from a sharded state reassemble to the global state."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.io import restart as rio
    from icebergs_tpu.parallel import domain as dd
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 devices")

    NX, NY, DXY = 32, 8, 5000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=600.0,
                             halo=2)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(4)
    n = 17
    st = ibt.create_bergs(64, lon=rng.uniform(2*DXY, (NX-2)*DXY, n),
                          lat=rng.uniform(DXY, (NY-1)*DXY, n),
                          mass=rng.uniform(1e8, 9e8, n), thickness=30.,
                          width=70., length=90., mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    st_s = dd.shard_state(world, st, local_capacity=32)

    base = str(tmp_path / "icebergs.res.nc")
    paths = rio.write_restart_bergs_tiled(base, st_s, cfg)
    assert len(paths) == 4

    back = rio.read_restart_bergs_tiled(base, 64, grid, cfg)
    a = np.asarray(st.alive)
    b = np.asarray(back.alive)
    assert a.sum() == b.sum() == n
    oa = np.argsort(np.asarray(st.id_cnt)[a])
    ob = np.argsort(np.asarray(back.id_cnt)[b])
    for f in ("lon", "lat", "mass", "uvel", "id_cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(st, f))[a][oa],
            np.asarray(getattr(back, f))[b][ob], rtol=1e-6, err_msg=f)


def test_tiled_restart_with_bonds(tmp_path):
    """Tiled save/load round-trips BOND state too: per-tile
    bonds_<name>.NNNN files are written next to the berg tiles and
    re-matched by id on read (a bonded pair split across two tiles must
    survive)."""
    import jax
    from jax.sharding import Mesh
    from icebergs_tpu.parallel import domain as dd
    import pytest
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")

    NX, NY, DXY = 32, 8, 5000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=600.0,
                             halo=2, iceberg_bonds_on=True, dem=True,
                             mts=True, max_bonds=4)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    # 4 bergs: pair (1,2) inside one tile, pair (3,4) straddling the
    # tile boundary at x = 16*DXY (devices split the x axis 4 ways)
    lon = np.array([3.2, 3.3, 15.9, 16.1]) * DXY
    lat = np.array([4.0, 4.0, 4.0, 4.0]) * DXY
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e9, thickness=30.,
                          width=300., length=300., mass_scaling=1.0,
                          id_cnt=np.arange(4) + 1, max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=1.2 * DXY))
    st = st.replace(bond_tangd1=jnp.where(st.bond_idx >= 0, 0.5, 0.),
                    bond_nstress=jnp.where(st.bond_idx >= 0, 7.0, 0.))
    assert int(st.n_bonds[0]) == 1 and int(st.n_bonds[2]) == 1

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    st_s = dd.shard_state(world, st, local_capacity=32)

    base = str(tmp_path / "icebergs.res.nc")
    rio.write_restart_bergs_tiled(base, st_s, cfg)
    assert os.path.exists(str(tmp_path / "bonds_icebergs.res.nc.0000"))

    back = rio.read_restart_bergs_tiled(base, 64, grid, cfg)
    back = rio.read_restart_bonds_tiled(base, back, cfg)
    ids = np.asarray(back.id_cnt)
    bidx = np.asarray(back.bond_idx)
    nb = np.asarray(back.n_bonds)
    alive = np.asarray(back.alive)
    slot = {int(ids[s]): s for s in np.nonzero(alive)[0]}
    # both pairs re-matched by id
    assert int(bidx[slot[1], 0]) == slot[2]
    assert int(bidx[slot[3], 0]) == slot[4]
    assert nb[alive].sum() == 4
    # DEM per-bond state survived
    np.testing.assert_allclose(
        np.asarray(back.bond_tangd1)[slot[1], 0], 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back.bond_nstress)[slot[3], 0], 7.0, rtol=1e-6)
