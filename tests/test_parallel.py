"""Multi-device domain decomposition tests on the virtual 8-CPU mesh:
sharded-step compilation, particle migration across tiles, and agreement
with the single-device run (the reference's cross-layout reproducibility
contract, parallel_reprod / icebergs_framework.F90:33).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.parallel import domain as dd


def make_mesh(n):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (dd.AXIS,))


NX, NY, DXY = 32, 8, 5000.0


def global_world(**kw):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=30.0, dt=600.0, Runge_not_Verlet=True,
                             halo=2, **kw)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=1.0, sst=2.0)
    return cfg, grid, frc


def bergs_global(grid, cfg, n=6):
    rng = np.random.RandomState(0)
    lon = rng.uniform(3 * DXY, (NX - 3) * DXY, n)
    lat = rng.uniform(2 * DXY, (NY - 2) * DXY, n)
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


@pytest.mark.parametrize("ndev", [2, 4])
def test_sharded_step_migration_and_mass(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    cfg, grid, frc = global_world()
    st = bergs_global(grid, cfg)
    m0 = float(jnp.sum(jnp.where(st.alive, st.mass * st.mass_scaling, 0.)))
    n0 = int(st.count())

    mesh = make_mesh(ndev)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    # recompute local cell indices under shard_map
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)

    step = dd.make_sharded_step(world, with_thermo=False)
    for _ in range(40):   # 1 m/s * 600 s * 40 = 24 km: crosses tiles
        st_s, nbergs, total_mass, overflow = step(st_s, frc_s)
    assert int(np.asarray(nbergs)) == n0
    assert int(np.max(np.asarray(overflow))) == 0
    # bergs all drifted east without loss
    np.testing.assert_allclose(float(np.asarray(total_mass)), m0, rtol=1e-6)


def test_chksum_invariant_across_layouts():
    """Bitwise berg-state checksum equality between 1- and 4-device runs
    (the reference's parallel_reprod contract,
    icebergs_framework.F90:33): per-berg physics is elementwise, so
    non-interactive runs must hash identically on any layout."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from icebergs_tpu import diag
    cfg, grid, frc = global_world()
    st = bergs_global(grid, cfg, n=5)

    import icebergs_tpu.model as model
    step1 = model.make_step(grid, cfg, with_thermo=True)
    s1 = st
    for _ in range(20):
        s1, _ = step1(s1, frc)
    cs1, n1 = jax.jit(diag.berg_chksum)(s1)

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)
    step4 = dd.make_sharded_step(world, with_thermo=True)
    for _ in range(20):
        st_s, *_ = step4(st_s, frc_s)

    # gather the sharded slabs to one host state and hash
    import dataclasses
    import numpy as np
    flat = {}
    for f in dataclasses.fields(st):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    from icebergs_tpu.state import BergState
    merged = BergState(**flat)
    cs4, n4 = jax.jit(diag.berg_chksum)(merged)
    assert int(n1) == int(n4)
    assert int(cs1) == int(cs4), (int(cs1), int(cs4))


def test_sharded_matches_single_device():
    """Trajectories agree with the single-device run (no interactions)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg, grid, frc = global_world()
    st = bergs_global(grid, cfg, n=4)

    # single-device reference run
    import icebergs_tpu.model as model
    step1 = model.make_step(grid, cfg, with_thermo=False)
    st1 = st
    for _ in range(30):
        st1, _ = step1(st1, frc)
    ref = np.sort(np.asarray(st1.lon)[np.asarray(st1.alive)])

    # 4-device run
    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)
    step4 = dd.make_sharded_step(world, with_thermo=False)
    for _ in range(30):
        st_s, nbergs, total_mass, _ = step4(st_s, frc_s)

    lon_s = np.asarray(jax.device_get(st_s.lon)).reshape(-1)
    alive_s = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo_s = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    got = np.sort(lon_s[alive_s & (halo_s < 0.5)])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2.0)  # meters


def test_chksum_invariant_interactive_sorted():
    """Bitwise cross-layout reproducibility WITH interactions on.

    The reference's parallel_reprod contract covers interactive runs
    (icebergs_framework.F90:33): pair forces are summed over id-ordered
    per-cell lists, so the result is independent of the decomposition.
    Here the sorted neighbor path (cell+id lexicographic slab order,
    fixed-width strip windows) plays that role: 1-device and 4-device
    runs of colliding bergs must produce bitwise-identical state hashes.
    """
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from icebergs_tpu import diag
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=30.0, dt=60.0, Runge_not_Verlet=False,
                             halo=2, interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.4, sst=2.0)

    # colliding pairs straddling the 4-way tile boundaries (x = 8, 16, 24
    # cells) plus an interior cluster: interaction radius for 60x50 m
    # bergs is ~31 m, so 40 m pairs are engaged from step 1
    bx = [8 * DXY, 16 * DXY, 24 * DXY]
    lon, lat = [], []
    for k, x in enumerate(bx):
        lon += [x - 10.0, x + 30.0]
        lat += [4 * DXY + 120.0 * k, 4 * DXY + 120.0 * k]
    lon += [5 * DXY, 5 * DXY + 35.0, 5 * DXY + 17.0]
    lat += [3 * DXY, 3 * DXY, 3 * DXY + 30.0]
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    import icebergs_tpu.model as model
    step1 = model.make_step(grid, cfg, with_thermo=True,
                            neighbor_mode="sorted")
    s1 = st
    for _ in range(20):
        s1, _ = step1(s1, frc)
    cs1, n1 = jax.jit(diag.berg_chksum)(s1)

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
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
    step4 = dd.make_sharded_step(world, with_thermo=True,
                                 neighbor_mode="sorted")
    for _ in range(20):
        st_s, *_ = step4(st_s, frc_s)

    import dataclasses
    flat = {}
    for f in dataclasses.fields(st):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    from icebergs_tpu.state import BergState
    merged = BergState(**flat)
    cs4, n4 = jax.jit(diag.berg_chksum)(merged)
    assert int(n1) == int(n4)
    assert int(cs1) == int(cs4), (int(cs1), int(cs4))


def test_forcing_halo_update_on_device():
    """On-device forcing halo refresh (mpp_update_domains analog,
    icebergs.F90:5240-5351): zeroed halo columns are refilled from the
    neighbors bitwise-identically to the host-side global re-slice."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg, grid, _ = global_world()
    rng = np.random.RandomState(11)

    def field(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    frc = ibt.Forcing(
        uo=field((NX + 1, NY + 1)), vo=field((NX + 1, NY + 1)),
        ui=field((NX + 1, NY + 1)), vi=field((NX + 1, NY + 1)),
        ua=field((NX + 1, NY + 1)), va=field((NX + 1, NY + 1)),
        ssh=field((NX + 2, NY + 2)), sst=field((NX + 2, NY + 2)),
        sss=field((NX + 2, NY + 2)), cn=field((NX + 2, NY + 2)),
        hi=field((NX + 2, NY + 2)))

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
    truth = dd.shard_forcing(world, frc)
    nxl, H = world.nxl, world.halo

    # stale: halo columns zeroed on every tile
    def stale_leaf(a, corner):
        a = np.asarray(a).copy()
        if corner:
            a[:, :H] = 0.
            a[:, H + nxl + 1:] = 0.
        else:
            a[:, :H + 1] = 0.
            a[:, H + 1 + nxl:] = 0.
        return jnp.asarray(a)

    import dataclasses as dc
    is_corner = {"uo": True, "vo": True, "ui": True, "vi": True,
                 "ua": True, "va": True, "ssh": False, "sst": False,
                 "sss": False, "cn": False, "hi": False}
    stale = ibt.Forcing(**{
        k: jax.device_put(stale_leaf(getattr(truth, k), c),
                          jax.NamedSharding(mesh, P(dd.AXIS)))
        for k, c in is_corner.items()})

    upd = dd.make_forcing_halo_update(world)(stale)

    for k, corner in is_corner.items():
        got = np.asarray(jax.device_get(getattr(upd, k)))
        want = np.asarray(jax.device_get(getattr(truth, k)))
        w = H if corner else H + 1
        for d in range(4):
            # inner-side halos must match bitwise; outer halos of edge
            # tiles stay stale (the host slice clamps at the domain edge)
            if d > 0:
                assert np.array_equal(got[d][:w], want[d][:w]), (k, d, "W")
            if d < 3:
                assert np.array_equal(got[d][-w:], want[d][-w:]), (k, d, "E")
            # interiors untouched
            assert np.array_equal(got[d][w:-w], want[d][w:-w]), (k, d)


def test_multihost_scaffolding_single_process():
    """Multi-host helpers on the single-process path: init is a no-op,
    the global mesh covers all (virtual) devices in process-contiguous
    order, and the sharded step compiles over it unchanged."""
    from icebergs_tpu.parallel import multihost as mh
    assert mh.initialize_multihost() == 1
    mesh = mh.make_global_mesh()
    assert mesh.devices.size == len(jax.devices())
    lo, hi = mh.local_tile_range(mesh)
    assert (lo, hi) == (0, mesh.devices.size)

    if mesh.devices.size < 4:
        pytest.skip("needs 4 devices")
    mesh4 = mh.make_global_mesh(devices=list(mesh.devices.reshape(-1))[:4])
    cfg, grid, frc = global_world()
    st = bergs_global(grid, cfg)
    world = dd.ShardedWorld(
        mesh=mesh4, grids=dd.make_sharded_world(
            cfg, mesh4, nx=NX, ny=NY, lon0=0., lat0=0., dlon=DXY,
            dlat=DXY).grids, cfg=cfg, nxl=NX // 4, halo=2)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    step = dd.make_sharded_step(world, with_thermo=False)
    st_s, nbergs, total_mass, overflow = step(st_s, frc_s)
    assert int(np.asarray(nbergs)) == int(st.count())


def test_chksum_invariant_interactive_fused3():
    """Cross-layout bitwise reproducibility through the FUSED production
    contact path (Pallas extraction search, interpret mode on CPU).

    Layout invariance holds by construction: the <=2-partner normal
    group's two-term sums are commutative, and the fallback strips
    enumerate each berg's 3x3-cell candidates in (cell, id) order —
    identical content on any decomposition because the halo ring
    replicates the full neighborhood."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from icebergs_tpu import diag
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=30.0, dt=60.0, Runge_not_Verlet=False,
                             halo=2, interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.4, sst=2.0)

    # colliding pairs straddling the tile boundaries + a >=3-contact
    # interior cluster (exercises the exact fallback group)
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

    kw = dict(neighbor_mode="fused3", fused_interpret=True,
              fused_window=512, fused_fallback_strip_width=140)

    import icebergs_tpu.model as model
    step1 = model.make_step(grid, cfg, with_thermo=True, **kw)
    s1 = st
    for _ in range(12):
        s1, _ = step1(s1, frc)
    cs1, n1 = jax.jit(diag.berg_chksum)(s1)

    mesh = make_mesh(4)
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=DXY, dlat=DXY)
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
    step4 = dd.make_sharded_step(world, with_thermo=True, **kw)
    for _ in range(12):
        st_s, *_ = step4(st_s, frc_s)

    import dataclasses
    flat = {}
    for f in dataclasses.fields(st):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    from icebergs_tpu.state import BergState
    merged = BergState(**flat)
    cs4, n4 = jax.jit(diag.berg_chksum)(merged)
    assert int(n1) == int(n4)
    assert int(cs1) == int(cs4), (int(cs1), int(cs4))
