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


# the MTS/DEM ghost-sync tests use the iKID/A68 production parameter
# set (numerically STABLE for a bonded chain).  The previous ad-hoc
# parameters (dem_spring 5e6 on 300 m / 6e9 kg elements) made the
# straight chain an unstable ANGULAR equilibrium: eager arithmetic kept
# the torque exactly zero, but any jitted evaluation seeds it at ulp
# level and the substeps amplify it to NaN — and assert_allclose's
# default equal_nan=True let NaN==NaN pass silently.  Both tests now
# assert finiteness explicitly.
MTS_R = 1500.0
MTS_DXY = 7000.0


def cfg_mts_stable():
    return ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=-55.0,
        dt=120.0, Runge_not_Verlet=False, mts=True, mts_sub_steps=12,
        explicit_inner_mts=True, dem=True, dem_spring_coef=5.e6,
        dem_damping_coef=1.0, poisson=0.3, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=0.00065359477124183,
        contact_spring_coef=1.e-7, contact_distance=4.e3,
        use_broken_bonds_for_substep_contact=True,
        break_bonds_on_sub_steps=True, fracture_criterion="stress",
        frac_thres_scaling=1., frac_thres_n=18.e3, frac_thres_t=100.e3,
        constant_interaction_LW=True, constant_length=2 * MTS_R,
        constant_width=2 * MTS_R, manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, max_bonds=6,
        set_melt_rates_to_zero=True, halo=2).normalized(warn=False)


def mts_chain_state(cfg, x0, y0, ux=1.0, uy=0.0, n=6):
    """n bonded elements along (ux, uy) centered on (x0, y0)."""
    t = (np.arange(n) - (n - 1) / 2.) * 2 * MTS_R
    rng = np.random.RandomState(5)
    st = ibt.create_bergs(32, lon=x0 + t * ux, lat=y0 + t * uy,
                          uvel=rng.uniform(-0.1, 0.1, n),
                          vvel=rng.uniform(-0.1, 0.1, n),
                          mass=850. * 200. * (2 * MTS_R) ** 2,
                          thickness=200., width=2 * MTS_R,
                          length=2 * MTS_R, mass_scaling=1.,
                          id_cnt=np.arange(n) + 1, max_bonds=6)
    return st


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


def test_conglomerate_lands_only_on_overlapped_devices():
    """Overlap-aware replication (transfer_mts_bergs,
    icebergs_framework.F90:2136-2313): a conglomerate straddling the
    tile-0/1 boundary must NOT be replicated onto tiles 2 and 3."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = cfg_bonded()
    NX4 = 32
    grid = ibt.make_uniform_grid(NX4, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    st = ibt.create_bergs(64, lon=[7800., 8200.], lat=[4500., 4500.],
                          mass=850. * 100 * 200 * 200, thickness=100.,
                          width=200., length=200., mass_scaling=1.,
                          id_cnt=[1, 2], id_ij=[10, 11], max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=500.))
    st = forces.compute_conglom_ids_host(st)
    assert int(np.asarray(st.conglom_id)[0]) > 0

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX4, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    st_s = dd.shard_state(world, st, local_capacity=16)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)
    st_s, _ = dd.make_halo_fill(world)(st_s)

    alive = np.asarray(jax.device_get(st_s.alive))
    halo = np.asarray(jax.device_get(st_s.halo_berg))
    # devices 0 and 1 both hold the full pair (owned + replicas)
    for d in (0, 1):
        assert (alive[d].sum()) == 2, f"device {d} misses the pair"
    # devices 2 and 3 hold NOTHING (round 1 all-gather put copies there)
    for d in (2, 3):
        assert alive[d].sum() == 0, \
            f"device {d} received non-overlapping conglomerate copies"


def test_bond_spanning_tripolar_fold():
    """A bonded pair straddling the fold line: the replica of the
    cross-fold partner must arrive fold-imaged (positions reflected
    through (lon_sum - lon, lat_sum - lat), velocities rotated 180
    degrees) so the bond measures its physical length
    (icebergs_framework.F90:2908-2961)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = cfg_bonded()
    NXF, NYF = 16, 8
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=NXF, ny=NYF, lon0=0.,
                                     lat0=0., dlon=DXY, dlat=DXY,
                                     folded_north=True)
    lon_sum, lat_sum = world.fold_lon_sum, world.fold_lat_sum
    # A at (2.5 cells, just below the top edge); B is its physical
    # neighbor across the fold: lon_B = lon_sum - lon_A - 100
    lat_top = NYF * DXY
    lon_a = 2.5 * DXY
    lon_b = lon_sum - lon_a - 100.0
    st = ibt.create_bergs(64, lon=[lon_a, lon_b],
                          lat=[lat_top - 80., lat_top - 120.],
                          mass=850. * 100 * 200 * 200, thickness=100.,
                          width=200., length=200., mass_scaling=1.,
                          id_cnt=[1, 2], id_ij=[10, 11], max_bonds=4)
    gg = ibt.make_uniform_grid(NXF, NYF, 0., 0., DXY, DXY,
                               grid_is_latlon=False)
    i, j, xi, yj = pos_to_cell(gg, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    # bond A-B by id stamps (physical bond across the fold; too far apart
    # in virtual coordinates for distance-based init)
    bic = np.asarray(st.bond_id_cnt).copy()
    bij = np.asarray(st.bond_id_ij).copy()
    bic[0, 0], bij[0, 0] = 2, 11
    bic[1, 0], bij[1, 0] = 1, 10
    st = st.replace(bond_id_cnt=jnp.asarray(bic),
                    bond_id_ij=jnp.asarray(bij))
    bidx = np.full((64, st.max_bonds), -1, np.int32)
    bidx[0, 0] = 1
    bidx[1, 0] = 0
    st = forces.compute_conglom_ids_host(
        st.replace(bond_idx=jnp.asarray(bidx)))

    st_s = dd.shard_state_2d(world, st, local_capacity=16)
    from jax.sharding import PartitionSpec as P2
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None, None],
            dd.relocalize(jax.tree.map(lambda x: x[0, 0], s),
                          jax.tree.map(lambda x: x[0, 0], g), cfg)),
        mesh=mesh, in_specs=(P2(dd.AXIS, dd.AXIS_Y),
                             P2(dd.AXIS, dd.AXIS_Y)),
        out_specs=P2(dd.AXIS, dd.AXIS_Y)))(world.grids, st_s)

    nxl, nyl, H = world.nxl, world.nyl, world.halo

    def fill(grids, s):
        grid = jax.tree.map(lambda x: x[0, 0], grids)
        s = jax.tree.map(lambda x: x[0, 0], s)
        fold = (world.fold_lon_sum, world.fold_lat_sum)
        s, ov = dd.exchange_particles(s, grid, cfg, nxl, H, 16, nyl=nyl,
                                      y_axis=dd.AXIS_Y, fold_north=fold)
        return jax.tree.map(lambda x: x[None, None], s), ov[None, None]

    st_s, _ = jax.jit(jax.shard_map(
        fill, mesh=mesh,
        in_specs=(P2(dd.AXIS, dd.AXIS_Y), P2(dd.AXIS, dd.AXIS_Y)),
        out_specs=(P2(dd.AXIS, dd.AXIS_Y), P2(dd.AXIS, dd.AXIS_Y))))(
        world.grids, st_s)

    alive = np.asarray(jax.device_get(st_s.alive))
    halo = np.asarray(jax.device_get(st_s.halo_berg))
    lon = np.asarray(jax.device_get(st_s.lon))
    lat = np.asarray(jax.device_get(st_s.lat))
    idc = np.asarray(jax.device_get(st_s.id_cnt))
    # owner tile of A is (0, 1) (top-left).  Find B's replica there.
    d = (0, 1)
    rep = alive[d] & (halo[d] >= 0.5) & (idc[d] == 2)
    assert rep.any(), "no replica of the cross-fold partner on A's tile"
    k = int(np.nonzero(rep)[0][0])
    # fold image of B: (lon_sum - lon_b, lat_sum - lat_b)
    np.testing.assert_allclose(lon[d][k], lon_sum - lon_b, atol=1.0)
    np.testing.assert_allclose(lat[d][k], lat_sum - (lat_top - 120.),
                               atol=1.0)
    # distance A <-> replica is the physical bond length (~109 m), far
    # below the untransformed separation (~10 km)
    ka = int(np.nonzero(alive[d] & (halo[d] < 0.5) & (idc[d] == 1))[0][0])
    dist = np.hypot(lon[d][k] - lon[d][ka], lat[d][k] - lat[d][ka])
    assert dist < 300.0, dist


def test_sharded_mts_ring_ghost_sync_matches_single():
    """MTS/DEM substeps with PER-SUBSTEP ghost refresh (the ring-sharded
    aggregate path, SURVEY §2.6 long-context analog): a bonded DEM
    conglomerate straddling a 2-device boundary must evolve as on a
    single device — ghosts are refreshed at each substep top, exactly the
    partner state the single-device substep reads."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = cfg_mts_stable()

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., MTS_DXY, MTS_DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.25, vo=0.05, ua=5.0, sst=-2.)

    # chain of 6 elements straddling the 2-device boundary at x = 8 cells
    n = 6
    st = mts_chain_state(cfg, 8 * MTS_DXY, 4.3 * MTS_DXY)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    st = forces.compute_conglom_ids_host(st)
    assert int(np.asarray(st.n_bonds).sum()) == 2 * (n - 1)

    nsteps = 3
    step1 = ibt.make_step(grid, cfg, with_thermo=False, mts_pair_cap=512,
                          contact_cap=256)
    s1 = st
    for _ in range(nsteps):
        s1, _ = step1(s1, frc)
    a1 = np.asarray(s1.alive)
    o1 = np.argsort(np.asarray(s1.id_cnt)[a1])
    ref_lon = np.asarray(s1.lon)[a1][o1]
    ref_u = np.asarray(s1.uvel)[a1][o1]

    mesh = Mesh(np.array(jax.devices()[:2]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                                  dlon=MTS_DXY, dlat=MTS_DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=16)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)

    # ring ghost-sync (production default) AND the all_gather reference:
    # the ring ships identical source rows for this 2-tile conglomerate,
    # so the two final states must be BITWISE equal
    finals = {}
    for mode in ("ring", "allgather"):
        step2 = dd.make_sharded_mts_step(
            world, pair_cap=512, contact_cap=256, ghost_width=16,
            ghost_slots=16, ghost_sync=mode)
        ss = st_s
        for _ in range(nsteps):
            ss, nbergs, total_mass, ov = step2(ss, frc_s)
            assert int(np.max(np.asarray(ov))) == 0
        assert int(np.asarray(nbergs)) == n
        finals[mode] = ss
    for f in ("lon", "lat", "uvel", "vvel", "rot", "bond_nstress"):
        a = np.asarray(jax.device_get(getattr(finals["ring"], f)))
        b = np.asarray(jax.device_get(getattr(finals["allgather"], f)))
        np.testing.assert_array_equal(a, b, err_msg=f)

    st_s = finals["ring"]
    alive = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    own = alive & (halo < 0.5)
    idc = np.asarray(jax.device_get(st_s.id_cnt)).reshape(-1)[own]
    lon_s = np.asarray(jax.device_get(st_s.lon)).reshape(-1)[own]
    u_s = np.asarray(jax.device_get(st_s.uvel)).reshape(-1)[own]
    o = np.argsort(idc)
    assert np.isfinite(ref_lon).all() and np.isfinite(lon_s).all()
    np.testing.assert_allclose(lon_s[o], ref_lon, rtol=0, atol=0.5)
    np.testing.assert_allclose(u_s[o], ref_u, rtol=2e-4, atol=1e-6)


def test_sharded_mts_2d_mesh_matches_single():
    """MTS/DEM ghost-sync step on a 2x2 (x, y) MESH: a bonded chain
    straddling the tile corner evolves as on a single device — the
    ghost all_gathers and budget psums ride both mesh axes and the
    particle exchange runs its x-then-y passes (the reference runs MTS
    on arbitrary 2-D mpp layouts, icebergs_framework.F90:913-934)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    NX2 = NY2 = 16
    cfg = cfg_mts_stable()

    grid = ibt.make_uniform_grid(NX2, NY2, 0., 0., MTS_DXY, MTS_DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX2, NY2, uo=0.25, vo=0.05, ua=5.0, sst=-2.)

    # diagonal chain of 6 elements through the tile corner at 8x8 cells
    n = 6
    s2 = 1.0 / np.sqrt(2.)
    st = mts_chain_state(cfg, 8 * MTS_DXY, 8 * MTS_DXY, ux=s2, uy=s2)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    st = forces.compute_conglom_ids_host(st)
    assert int(np.asarray(st.n_bonds).sum()) == 2 * (n - 1)

    nsteps = 3
    step1 = ibt.make_step(grid, cfg, with_thermo=False, mts_pair_cap=512,
                          contact_cap=256)
    s1 = st
    for _ in range(nsteps):
        s1, _ = step1(s1, frc)
    a1 = np.asarray(s1.alive)
    o1 = np.argsort(np.asarray(s1.id_cnt)[a1])
    ref_lon = np.asarray(s1.lon)[a1][o1]
    ref_lat = np.asarray(s1.lat)[a1][o1]
    ref_u = np.asarray(s1.uvel)[a1][o1]

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=NX2, ny=NY2, lon0=0.,
                                     lat0=0., dlon=MTS_DXY, dlat=MTS_DXY)
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=16)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None, None],
            dd.relocalize(jax.tree.map(lambda x: x[0, 0], s),
                          jax.tree.map(lambda x: x[0, 0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS, dd.AXIS_Y), P(dd.AXIS, dd.AXIS_Y)),
        out_specs=P(dd.AXIS, dd.AXIS_Y)))(world.grids, st_s)

    step2 = dd.make_sharded_mts_step(world, pair_cap=512, contact_cap=256,
                                     ghost_width=16, ghost_slots=16)
    for _ in range(nsteps):
        st_s, nbergs, total_mass, ov = step2(st_s, frc_s)
        assert int(np.max(np.asarray(ov))) == 0
    assert int(np.asarray(nbergs)) == n

    alive = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    own = alive & (halo < 0.5)
    idc = np.asarray(jax.device_get(st_s.id_cnt)).reshape(-1)[own]
    lon_s = np.asarray(jax.device_get(st_s.lon)).reshape(-1)[own]
    lat_s = np.asarray(jax.device_get(st_s.lat)).reshape(-1)[own]
    u_s = np.asarray(jax.device_get(st_s.uvel)).reshape(-1)[own]
    o = np.argsort(idc)
    assert np.isfinite(ref_lon).all() and np.isfinite(lon_s).all()
    np.testing.assert_allclose(lon_s[o], ref_lon, rtol=0, atol=0.5)
    np.testing.assert_allclose(lat_s[o], ref_lat, rtol=0, atol=0.5)
    np.testing.assert_allclose(u_s[o], ref_u, rtol=2e-4, atol=1e-6)
