"""2-D mesh decomposition: diagonal migration across tile corners must
conserve bergs and match the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.parallel import domain as dd

NX = NY = 16
DXY = 4000.0


def world_cfg():
    return ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                              lat_ref=30.0, dt=600.0, Runge_not_Verlet=True,
                              halo=2)


def test_2d_mesh_diagonal_migration():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = world_cfg()
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    # uniform diagonal current: bergs cross tile corners
    frc = ibt.uniform_forcing(NX, NY, uo=1.0, vo=1.0, sst=2.0)
    rng = np.random.RandomState(2)
    n = 6
    st = ibt.create_bergs(64, lon=rng.uniform(2 * DXY, 7 * DXY, n),
                          lat=rng.uniform(2 * DXY, 7 * DXY, n),
                          mass=1e8, thickness=20., width=50., length=60.,
                          mass_scaling=1.0, id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # single-device reference
    step1 = ibt.make_step(grid, cfg, with_thermo=False)
    s1 = st
    for _ in range(40):
        s1, _ = step1(s1, frc)
    ref = np.sort(np.asarray(s1.lon)[np.asarray(s1.alive)])

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                     lat0=0., dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=32)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None, None],
            dd.relocalize(jax.tree.map(lambda x: x[0, 0], s),
                          jax.tree.map(lambda x: x[0, 0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS, dd.AXIS_Y), P(dd.AXIS, dd.AXIS_Y)),
        out_specs=P(dd.AXIS, dd.AXIS_Y)))(world.grids, st_s)

    step4 = dd.make_sharded_step_2d(world, with_thermo=False)
    for _ in range(40):
        st_s, nbergs, total_mass, overflow = step4(st_s, frc_s)

    assert int(np.asarray(nbergs)) == n
    assert int(np.max(np.asarray(overflow))) == 0
    lon_s = np.asarray(jax.device_get(st_s.lon)).reshape(-1)
    alive_s = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo_s = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    got = np.sort(lon_s[alive_s & (halo_s < 0.5)])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2.0)
