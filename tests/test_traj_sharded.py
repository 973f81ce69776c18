"""Distributed trajectory recording: per-device ring buffers drained to
per-tile files (io_layout suffixes, icebergs_fms2io.F90:1663-1738) must
record every owned berg exactly once and match the single-device set."""

import numpy as np
import pytest
from scipy.io import netcdf_file

import jax
from jax.sharding import Mesh

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import trajectory as tio
from icebergs_tpu.parallel import domain as dd

NX, NY, DXY = 16, 8, 1000.0


def test_sharded_recording_matches_single_device(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30., dt=600.,
                             Runge_not_Verlet=True, halo=2)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=1.0, sst=2.)
    rng = np.random.RandomState(7)
    n = 12
    st = ibt.create_bergs(64, lon=rng.uniform(1e3, 15e3, n),
                          lat=rng.uniform(1e3, 7e3, n), mass=1e8,
                          thickness=20., width=60., length=60.,
                          mass_scaling=1., id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # single-device reference recording
    step1 = ibt.make_step(grid, cfg, with_thermo=False)
    buf1 = tio.init_traj_buffer(st.capacity, nsamples=4, cfg=cfg)
    s1 = st
    for k in range(3):
        s1, _ = step1(s1, frc)
        buf1 = tio.record_posn(buf1, s1, cfg, day=k + 1., year=0)
    n1, _ = tio.write_trajectories(str(tmp_path / "ref.nc"), buf1, cfg)

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    step4 = dd.make_sharded_step(world, with_thermo=False,
                                 exchange_width=16)
    bufs = tio.init_traj_buffer_tiled((4,), 32, nsamples=4, cfg=cfg)
    for k in range(3):
        st_s, nbergs, _, ov = step4(st_s, frc_s)
        bufs = tio.record_posn_tiled(bufs, st_s, cfg, day=k + 1., year=0)
    assert int(np.asarray(nbergs)) == n
    total, bufs = tio.write_trajectories_tiled(str(tmp_path / "traj.nc"),
                                               bufs, cfg)
    assert total == n1 == 3 * n

    def load(paths):
        rec = []
        for p in paths:
            with netcdf_file(p, "r", mmap=False) as f:
                rec += list(zip(np.asarray(f.variables["id_cnt"][:]),
                                np.round(f.variables["day"][:], 3),
                                np.round(f.variables["lon"][:], 1)))
        return sorted(rec)

    ref = load([str(tmp_path / "ref.nc")])
    got = load([str(tmp_path / f"traj.nc.{k:04d}") for k in range(4)])
    assert [r[:2] for r in ref] == [g[:2] for g in got]  # same (id, day)
    for r, g in zip(ref, got):
        assert abs(r[2] - g[2]) < 2.0, (r, g)
