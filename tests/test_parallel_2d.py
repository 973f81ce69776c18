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


def test_2d_mesh_fused3_interactive_bitwise():
    """fused3 production contact path on a 2x2 (x, y) mesh == the
    single-device run BITWISE (chksum), colliding pairs straddling both
    the x and y tile boundaries."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from icebergs_tpu import diag
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=60.0,
                             Runge_not_Verlet=False, halo=2,
                             interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.3, vo=0.2, sst=2.0)

    # pairs straddling x=8 and y=8 cell boundaries + a triple cluster
    lon = [8 * DXY - 10., 8 * DXY + 30., 3 * DXY, 3 * DXY,
           5 * DXY, 5 * DXY + 35., 5 * DXY + 17.]
    lat = [4 * DXY, 4 * DXY, 8 * DXY - 10., 8 * DXY + 30.,
           3 * DXY, 3 * DXY, 3 * DXY + 30.]
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    kw = dict(neighbor_mode="fused3", fused_interpret=True,
              fused_window=512, fused_fallback_strip_width=140)
    step1 = ibt.make_step(grid, cfg, with_thermo=True, **kw)
    s1 = st
    for _ in range(10):
        s1, _ = step1(s1, frc)
    cs1, n1 = jax.jit(diag.berg_chksum)(s1)

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
    st_s, _ = dd.make_halo_fill_2d(world)(st_s)
    step4 = dd.make_sharded_step_2d(world, with_thermo=True, **kw)
    for _ in range(10):
        st_s, nbergs, total_mass, overflow = step4(st_s, frc_s)
    assert int(np.max(np.asarray(overflow))) == 0

    import dataclasses
    from icebergs_tpu.state import BergState
    flat = {}
    for f in dataclasses.fields(st):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = jnp.asarray(a.reshape((-1,) + a.shape[3:])
                                   if a.ndim > 2 else a.reshape(-1))
    merged = BergState(**flat)
    cs4, n4 = jax.jit(diag.berg_chksum)(merged)
    assert int(n1) == int(n4)
    assert int(cs1) == int(cs4), (int(cs1), int(cs4))
