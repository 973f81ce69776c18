"""Multi-device bonded dynamics: conglomerate replication (the
transfer_mts_bergs invariant) must make a bonded pair straddling a tile
boundary evolve exactly as on a single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.parallel import domain as dd

NX, NY, DXY = 16, 8, 1000.0


def cfg_bonded():
    return ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                              lat_ref=0., dt=60.0, Runge_not_Verlet=False,
                              interactive_icebergs_on=True,
                              iceberg_bonds_on=True, spring_coef=1.e-5,
                              use_new_predictive_corrective=True, halo=2,
                              max_bonds=4)


def bonded_pair_state(grid, cfg):
    # pair straddles the 2-device boundary at x = 8000 m
    st = ibt.create_bergs(32, lon=[7800., 8200.], lat=[4500., 4500.],
                          mass=850. * 100 * 200 * 200, thickness=100.,
                          width=200., length=200., mass_scaling=1.,
                          id_cnt=[1, 2], id_ij=[10, 11], max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    return forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=500.))


def test_bonded_pair_across_tile_boundary():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = cfg_bonded()
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.2, sst=-2.)

    st = bonded_pair_state(grid, cfg)
    # single-device reference
    step1 = ibt.make_step(grid, cfg, with_thermo=False)
    s1 = st
    for _ in range(60):
        s1, _ = step1(s1, frc)
    ref = {int(c): (float(l), float(u)) for c, l, u in
           zip(np.asarray(s1.id_cnt)[np.asarray(s1.alive)],
               np.asarray(s1.lon)[np.asarray(s1.alive)],
               np.asarray(s1.uvel)[np.asarray(s1.alive)])}

    mesh = Mesh(np.array(jax.devices()[:2]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=16)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)

    # bond partner indices are cleared by distribution; one exchange pass
    # replicates conglomerates and re-connects bonds before stepping
    stamp = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.exchange_particles(jax.tree.map(lambda x: x[0], s),
                                  jax.tree.map(lambda x: x[0], g), cfg,
                                  world.nxl, world.halo, 16)[0]),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))
    st_s = stamp(world.grids, st_s)

    step2 = dd.make_sharded_step(world, with_thermo=False, exchange_width=16)
    for _ in range(60):
        st_s, nbergs, total_mass, overflow = step2(st_s, frc_s)

    assert int(np.asarray(nbergs)) == 2
    assert int(np.max(np.asarray(overflow))) == 0
    lon = np.asarray(jax.device_get(st_s.lon)).reshape(-1)
    uvel = np.asarray(jax.device_get(st_s.uvel)).reshape(-1)
    idc = np.asarray(jax.device_get(st_s.id_cnt)).reshape(-1)
    alive = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    own = alive & (halo < 0.5)
    got = {int(c): (float(l), float(u)) for c, l, u in
           zip(idc[own], lon[own], uvel[own])}
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k][0] - ref[k][0]) < 1.0, (k, got[k], ref[k])
        assert abs(got[k][1] - ref[k][1]) < 1e-4, (k, got[k], ref[k])


def test_bonded_pair_across_2d_tile_corner():
    """Conglomerate replication on the 2-D mesh: a bonded pair placed
    diagonally across the 2x2 tile corner evolves as on one device."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = cfg_bonded()
    nx = ny = 16
    grid = ibt.make_uniform_grid(nx, ny, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(nx, ny, uo=0.2, vo=0.1, sst=-2.)

    # pair diagonal across the corner at (8000, 8000)
    st = ibt.create_bergs(32, lon=[7800., 8200.], lat=[7800., 8200.],
                          mass=850. * 100 * 200 * 200, thickness=100.,
                          width=200., length=200., mass_scaling=1.,
                          id_cnt=[1, 2], id_ij=[10, 11], max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=800.))
    assert int(np.asarray(st.n_bonds)[0]) == 1

    step1 = ibt.make_step(grid, cfg, with_thermo=False)
    s1 = st
    for _ in range(60):
        s1, _ = step1(s1, frc)
    al = np.asarray(s1.alive)
    ref = {int(c): (float(l), float(t), float(u)) for c, l, t, u in
           zip(np.asarray(s1.id_cnt)[al], np.asarray(s1.lon)[al],
               np.asarray(s1.lat)[al], np.asarray(s1.uvel)[al])}

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=nx, ny=ny, lon0=0.,
                                     lat0=0., dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=16)

    # one exchange pass replicates conglomerates and re-connects bonds
    reconnect = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None, None],
            dd.exchange_particles(jax.tree.map(lambda x: x[0, 0], s),
                                  jax.tree.map(lambda x: x[0, 0], g), cfg,
                                  world.nxl, world.halo, 16, nyl=world.nyl,
                                  y_axis=dd.AXIS_Y)[0]),
        mesh=mesh, in_specs=(P(dd.AXIS, dd.AXIS_Y), P(dd.AXIS, dd.AXIS_Y)),
        out_specs=P(dd.AXIS, dd.AXIS_Y)))
    st_s = reconnect(world.grids, st_s)

    step4 = dd.make_sharded_step_2d(world, with_thermo=False,
                                    exchange_width=16)
    for _ in range(60):
        st_s, nbergs, total_mass, overflow = step4(st_s, frc_s)

    assert int(np.asarray(nbergs)) == 2
    assert int(np.max(np.asarray(overflow))) == 0
    flat = lambda f: np.asarray(jax.device_get(getattr(st_s, f))).reshape(-1)
    own = flat("alive") & (flat("halo_berg") < 0.5)
    got = {int(c): (float(l), float(t), float(u)) for c, l, t, u in
           zip(flat("id_cnt")[own], flat("lon")[own], flat("lat")[own],
               flat("uvel")[own])}
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k][0] - ref[k][0]) < 1.0, (k, got[k], ref[k])
        assert abs(got[k][1] - ref[k][1]) < 1.0, (k, got[k], ref[k])
        assert abs(got[k][2] - ref[k][2]) < 1e-4, (k, got[k], ref[k])
