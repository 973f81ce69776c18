"""The FULL coupling sequence inside the sharded step: calving-bucket
spawning, footloose child spawning, thermodynamics and spreading all run
per tile under shard_map (make_sharded_run), matching the single-device
IcebergsModel run — the reference runs this entire sequence under MPI
(icebergs_run, icebergs.F90:5389-5679)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.api import IcebergsModel
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.parallel import domain as dd

NX, NY, DXY = 32, 8, 5000.0


def make_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), (dd.AXIS,))


def merged_owned(st_s):
    """Gather sharded slabs to host, keep owned alive bergs, sort by id."""
    flat = {}
    cap = None
    import icebergs_tpu.state as state_mod
    for f in dataclasses.fields(state_mod.BergState):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = a.reshape((-1,) + a.shape[2:])
    alive = flat["alive"] & (flat["halo_berg"] < 0.5)
    order = np.lexsort((flat["id_ij"][alive], flat["id_cnt"][alive]))
    return {k: v[alive][order] for k, v in flat.items()}


def single_sorted(st):
    flat = {}
    for f in dataclasses.fields(st):
        flat[f.name] = np.asarray(getattr(st, f.name))
    alive = flat["alive"] & (flat["halo_berg"] < 0.5)
    order = np.lexsort((flat["id_ij"][alive], flat["id_cnt"][alive]))
    return {k: v[alive][order] for k, v in flat.items()}


def test_sharded_run_calving_spawn_matches_single():
    """Constant calving flux fills buckets and spawns bergs identically
    (count, ids, positions, masses) on 1 and 4 devices."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=30.0,
        dt=3600.0, Runge_not_Verlet=True, halo=2,
        initial_mass=(8.8e7,) * 10, mass_scaling=(1.,) * 10,
        distribution=(1.,) + (0.,) * 9,
        initial_mass_n=(8.8e7,) * 10, mass_scaling_n=(1.,) * 10,
        distribution_n=(1.,) + (0.,) * 9)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.2, sst=1.0)
    from icebergs_tpu.state import empty_state
    st0 = empty_state(96)   # empty pool

    # calving into two interior cells on different future tiles
    calving = np.zeros((NX + 2, NY + 2), np.float32)
    rate = 8.8e7 / (5 * 3600.0)       # one class-1 bucket every ~5 steps
    calving[3, 4] = rate              # kg/s per cell
    calving[22, 5] = rate
    calving = jnp.asarray(calving)
    hflx = jnp.zeros_like(calving)

    nsteps = 12
    model = IcebergsModel(grid, cfg)
    s1 = model.init_state(st0, seed=3)
    for _ in range(nsteps):
        s1, out1 = model.run(s1, frc, calving, hflx)
    ref = single_sorted(s1.bergs)
    assert ref["lon"].shape[0] > 0, "no bergs calved — test setup broken"

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st0, local_capacity=48)
    ms = dd.init_sharded_model_state(world, st_s, seed=3)
    calv_s = dd.shard_calving_field(world, calving)
    hflx_s = dd.shard_calving_field(world, hflx)
    run = dd.make_sharded_run(world)
    for _ in range(nsteps):
        ms, out4, nbergs, overflow = run(ms, frc_s, calv_s, hflx_s)
        assert int(np.max(np.asarray(overflow))) == 0
    got = merged_owned(ms.bergs)

    assert got["lon"].shape[0] == ref["lon"].shape[0]
    np.testing.assert_array_equal(got["id_cnt"], ref["id_cnt"])
    np.testing.assert_array_equal(got["id_ij"], ref["id_ij"])
    for f in ("lon", "lat", "mass", "thickness", "uvel", "vvel"):
        np.testing.assert_allclose(got[f], ref[f], rtol=2e-6,
                                   err_msg=f)
    # budgets agree with the single-device run
    np.testing.assert_allclose(
        float(jax.device_get(out4.budgets.mass)),
        float(jax.device_get(out1.budgets.mass)), rtol=1e-6)


def test_sharded_run_footloose_matches_single():
    """Footloose child spawning inside the sharded step: a big tabular
    berg sheds a child; 1- and 4-device runs spawn the same child (ids
    and positions — id-derived placement RNG)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=0.,
        dt=1800.0, Runge_not_Verlet=False, halo=2,
        use_new_predictive_corrective=True,
        footloose=True, fl_style='new_bergs', fl_youngs=1.e8,
        fl_strength=250., allow_bergs_to_roll=False,
        displace_fl_bergs=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.0, ua=10.0, sst=2.0, sss=33.)

    st0 = ibt.create_bergs(64, lon=[14. * DXY + 900.], lat=[4. * DXY],
                           thickness=250., width=8000., length=9000.,
                           mass=850. * 250 * 8000. * 9000.,
                           mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st0.lon, st0.lat, -1.0)
    st0 = st0.replace(ine=i, jne=j, xi=xi, yj=yj)

    nsteps = 120
    model = IcebergsModel(grid, cfg)
    s1 = model.init_state(st0, seed=7)
    for _ in range(nsteps):
        s1, _ = model.run(s1, frc)
    ref = single_sorted(s1.bergs)
    assert ref["lon"].shape[0] > 1, "no footloose child spawned"

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st0, local_capacity=32)
    ms = dd.init_sharded_model_state(world, st_s, seed=7)
    zero = jnp.zeros((4, world.nxl + 2 * world.halo + 2, NY + 2),
                     jnp.float32)
    zero = jax.device_put(zero, jax.NamedSharding(mesh, P(dd.AXIS)))
    run = dd.make_sharded_run(world)
    for _ in range(nsteps):
        ms, out4, nbergs, overflow = run(ms, frc_s, zero, zero)
    got = merged_owned(ms.bergs)

    assert got["lon"].shape[0] == ref["lon"].shape[0]
    np.testing.assert_array_equal(got["id_cnt"], ref["id_cnt"])
    for f in ("lon", "lat", "mass", "fl_k"):
        np.testing.assert_allclose(got[f], ref[f], rtol=2e-6, err_msg=f)


def test_sharded_run_fused3_interactive_matches_single():
    """The FULL coupling sequence with the fused3 production contact
    path on 4 devices == the single-device IcebergsModel(fused3) run
    BITWISE (state chksum), with colliding pairs straddling tile
    boundaries and a >=3-contact cluster driving the fallback group."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from icebergs_tpu import diag

    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=30.0,
        dt=60.0, Runge_not_Verlet=False, halo=2,
        interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.4, sst=2.0)

    bx = [8 * DXY, 16 * DXY, 24 * DXY]
    lon, lat = [], []
    for k, x in enumerate(bx):
        lon += [x - 10.0, x + 30.0]
        lat += [4 * DXY + 120.0 * k, 4 * DXY + 120.0 * k]
    lon += [5 * DXY, 5 * DXY + 35.0, 5 * DXY + 17.0, 5 * DXY + 17.0]
    lat += [3 * DXY, 3 * DXY, 3 * DXY + 30.0, 3 * DXY - 30.0]
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    fk = dict(window=512, fallback_strip_width=140)
    nsteps = 10

    model = IcebergsModel(grid, cfg, neighbor_mode="fused3",
                          fused_interpret=True, fused_kw=fk)
    s1 = model.init_state(st, seed=7)
    for _ in range(nsteps):
        s1, out1 = model.run(s1, frc)
    ref = single_sorted(s1.bergs)

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)
    st_s, _ = dd.make_halo_fill(world)(st_s)
    ms = dd.init_sharded_model_state(world, st_s, seed=7)
    calv = dd.shard_calving_field(
        world, jnp.zeros((NX + 2, NY + 2), jnp.float32))
    run = dd.make_sharded_run(world, neighbor_mode="fused3",
                              fused_interpret=True, fused_kw=fk)
    for _ in range(nsteps):
        ms, out4, nbergs, overflow = run(ms, frc_s, calv, calv)
        assert int(np.max(np.asarray(overflow))) == 0
        # honesty counters surfaced through RunOutputs: no fallback-cap
        # drops, and the >=3-contact cluster does route through the
        # exact fallback group
        assert int(np.asarray(out4.contact_overflow)) == 0
    assert int(np.asarray(out4.contact_fallback)) > 0
    got = merged_owned(ms.bergs)

    assert got["lon"].shape[0] == ref["lon"].shape[0]
    for f in ("id_cnt", "id_ij", "lon", "lat", "uvel", "vvel", "mass"):
        np.testing.assert_array_equal(got[f], ref[f], err_msg=f)
    np.testing.assert_allclose(
        float(jax.device_get(out4.budgets.mass)),
        float(jax.device_get(out1.budgets.mass)), rtol=1e-6)


def test_sharded_run_2d_mesh_fused3_matches_single():
    """The FULL coupling sequence (make_sharded_run) on a 2x2 (x, y)
    MESH with the fused3 contact path == single-device
    IcebergsModel(fused3) BITWISE — collision pairs straddle both the x
    and y tile boundaries."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    NX2 = NY2 = 16
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=30.0,
        dt=60.0, Runge_not_Verlet=False, halo=2,
        interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX2, NY2, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX2, NY2, uo=0.3, vo=0.2, sst=2.0)

    lon = [8 * DXY - 10., 8 * DXY + 30., 3 * DXY, 3 * DXY,
           5 * DXY, 5 * DXY + 35., 5 * DXY + 17.]
    lat = [4 * DXY, 4 * DXY, 8 * DXY - 10., 8 * DXY + 30.,
           3 * DXY, 3 * DXY, 3 * DXY + 30.]
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    fk = dict(window=512, fallback_strip_width=140)
    nsteps = 8

    model = IcebergsModel(grid, cfg, neighbor_mode="fused3",
                          fused_interpret=True, fused_kw=fk)
    s1 = model.init_state(st, seed=5)
    for _ in range(nsteps):
        s1, out1 = model.run(s1, frc)
    ref = single_sorted(s1.bergs)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=NX2, ny=NY2, lon0=0.,
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
    ms = dd.init_sharded_model_state(world, st_s, seed=5)
    calv = dd.shard_calving_field(
        world, jnp.zeros((NX2 + 2, NY2 + 2), jnp.float32))
    run = dd.make_sharded_run(world, neighbor_mode="fused3",
                              fused_interpret=True, fused_kw=fk)
    for _ in range(nsteps):
        ms, out4, nbergs, overflow = run(ms, frc_s, calv, calv)
        assert int(np.max(np.asarray(overflow))) == 0
        assert int(np.asarray(out4.contact_overflow)) == 0
    got = merged_owned(ms.bergs)

    assert got["lon"].shape[0] == ref["lon"].shape[0]
    for f in ("id_cnt", "id_ij", "lon", "lat", "uvel", "vvel", "mass"):
        np.testing.assert_array_equal(got[f], ref[f], err_msg=f)
    np.testing.assert_allclose(
        float(jax.device_get(out4.budgets.mass)),
        float(jax.device_get(out1.budgets.mass)), rtol=1e-6)
