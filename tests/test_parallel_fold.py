"""Tripolar folded-north exchange (icebergs_framework.F90:933,
2010-2076): a berg crossing the top edge of a folded grid re-enters at
the x-mirrored longitude heading south; halo replication across the fold
lets bergs interact through it."""

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
LAT_TOP = NY * DXY


def world_cfg(**kw):
    base = dict(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                lat_ref=0.0, dt=600.0, Runge_not_Verlet=True, halo=2)
    base.update(kw)
    return ibt.IcebergsConfig(**base)


def test_fold_state_is_an_involution():
    """fold_state applied twice restores the slab (up to rot += 2*pi)."""
    st = ibt.create_bergs(8, lon=[12123., 40000.], lat=[64500., 63000.],
                          uvel=[0.3, -0.1], vvel=[1.0, 0.5],
                          mass=1e8, thickness=20., width=50., length=60.,
                          mass_scaling=1.0, id_cnt=[1, 2])
    st = st.replace(ine=jnp.array([10, 5] + [0] * 6),
                    jne=jnp.array([10, 7] + [0] * 6),
                    xi=st.xi * 0 + 0.25, yj=st.yj * 0 + 0.75)
    kw = dict(nxl=8, nyl=8, H=2, lon_sum=2. * 0. + NX * DXY,
              lat_sum=2. * LAT_TOP)
    f1 = dd.fold_state(st, **kw)
    # single application: mirrored position, rotated velocity, flipped cell
    np.testing.assert_allclose(np.asarray(f1.lon)[0], 64000. - 12123.)
    np.testing.assert_allclose(np.asarray(f1.lat)[0], 128000. - 64500.)
    np.testing.assert_allclose(np.asarray(f1.uvel)[0], -0.3)
    np.testing.assert_allclose(np.asarray(f1.vvel)[0], -1.0)
    assert int(f1.ine[0]) == (2 * 2 + 8 - 1) - 10
    assert int(f1.jne[0]) == 2 * (2 + 8) - 1 - 10
    np.testing.assert_allclose(float(f1.xi[0]), 0.75)
    np.testing.assert_allclose(float(f1.yj[0]), 0.25)
    f2 = dd.fold_state(f1, **kw)
    for name in ("lon", "lat", "uvel", "vvel", "xi", "yj"):
        np.testing.assert_allclose(np.asarray(getattr(f2, name)),
                                   np.asarray(getattr(st, name)),
                                   rtol=0, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(f2.ine), np.asarray(st.ine))
    np.testing.assert_array_equal(np.asarray(f2.jne), np.asarray(st.jne))


def _folded_world(cfg, ndx=2, ndy=2):
    if len(jax.devices()) < ndx * ndy:
        pytest.skip("needs %d devices" % (ndx * ndy))
    mesh = Mesh(np.array(jax.devices()[:ndx * ndy]).reshape(ndx, ndy),
                (dd.AXIS, dd.AXIS_Y))
    world = dd.make_sharded_world_2d(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                     lat0=0., dlon=DXY, dlat=DXY,
                                     folded_north=True)
    return mesh, world


def _relocalized(world, mesh, st_s, cfg):
    return jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None, None],
            dd.relocalize(jax.tree.map(lambda x: x[0, 0], s),
                          jax.tree.map(lambda x: x[0, 0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS, dd.AXIS_Y), P(dd.AXIS, dd.AXIS_Y)),
        out_specs=P(dd.AXIS, dd.AXIS_Y)))(world.grids, st_s)


def _owned(st_s, field):
    v = np.asarray(jax.device_get(getattr(st_s, field))).reshape(-1)
    alive = np.asarray(jax.device_get(st_s.alive)).reshape(-1)
    halo = np.asarray(jax.device_get(st_s.halo_berg)).reshape(-1)
    return v[alive & (halo < 0.5)]


def test_fold_crossing_re_enters_mirrored():
    cfg = world_cfg()
    mesh, world = _folded_world(cfg)
    frc = ibt.uniform_forcing(NX, NY, sst=2.0)   # quiescent ocean

    lon0b = 12123.0
    st = ibt.create_bergs(64, lon=[lon0b], lat=[LAT_TOP - 100.],
                          vvel=[1.0], mass=1e8, thickness=20., width=50.,
                          length=60., mass_scaling=1.0, id_cnt=[7])
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=32)
    st_s = _relocalized(world, mesh, st_s, cfg)

    step = dd.make_sharded_step_2d(world, with_thermo=False)
    crossed = False
    for _ in range(12):
        st_s, nbergs, total_mass, overflow = step(st_s, frc_s)
        assert int(np.asarray(nbergs)) == 1
        assert int(np.max(np.asarray(overflow))) == 0
        if _owned(st_s, "lon")[0] > 32000.:
            crossed = True
    assert crossed, "berg never crossed the fold"
    # re-entered at the mirrored longitude, heading south of the fold
    np.testing.assert_allclose(_owned(st_s, "lon")[0], NX * DXY - lon0b,
                               rtol=0, atol=1.0)
    assert _owned(st_s, "lat")[0] < LAT_TOP
    assert _owned(st_s, "vvel")[0] < 0.


def test_fold_cross_layout_identity():
    """(2,2) and (4,2) folded layouts produce identical trajectories."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = world_cfg()
    frc = ibt.uniform_forcing(NX, NY, sst=2.0)
    rng = np.random.RandomState(5)
    n = 5
    st = ibt.create_bergs(64, lon=rng.uniform(1 * DXY, 15 * DXY, n),
                          lat=rng.uniform(13 * DXY, 15.9 * DXY, n),
                          vvel=1.0, mass=1e8, thickness=20., width=50.,
                          length=60., mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1)

    results = []
    for ndx, ndy in ((2, 2), (4, 2)):
        mesh, world = _folded_world(cfg, ndx, ndy)
        frc_s = dd.shard_forcing_2d(world, frc)
        st_s = dd.shard_state_2d(world, st, local_capacity=32)
        st_s = _relocalized(world, mesh, st_s, cfg)
        step = dd.make_sharded_step_2d(world, with_thermo=False)
        for _ in range(12):
            st_s, nbergs, _, overflow = step(st_s, frc_s)
        assert int(np.asarray(nbergs)) == n
        ids = _owned(st_s, "id_cnt")
        order = np.argsort(ids)
        results.append((ids[order], _owned(st_s, "lon")[order],
                        _owned(st_s, "lat")[order],
                        _owned(st_s, "vvel")[order]))

    np.testing.assert_array_equal(results[0][0], results[1][0])
    for k in (1, 2, 3):
        np.testing.assert_array_equal(results[0][k], results[1][k])


def test_contact_through_the_fold():
    """Halo replication across the fold lets two bergs approaching the
    glued north edge from mirrored longitudes collide and repel without
    ever meeting in index space (update_halo_icebergs fold branch,
    icebergs_framework.F90:2908-2961)."""
    cfg = world_cfg(dt=60.0, interactive_icebergs_on=True,
                    spring_coef=1.e-5)
    mesh, world = _folded_world(cfg)
    frc = ibt.uniform_forcing(NX, NY, sst=2.0)

    # glued head-on pair: B sits at the fold image column of A
    xa = 12000.0
    st = ibt.create_bergs(64, lon=[xa, NX * DXY - xa],
                          lat=[LAT_TOP - 400., LAT_TOP - 400.],
                          vvel=[0.1, 0.1], mass=850. * 100 * 200 * 200,
                          thickness=100., width=200., length=200.,
                          mass_scaling=1.0, id_cnt=[1, 2])
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=32)
    step = dd.make_sharded_step_2d(world, with_thermo=False)

    min_gap = np.inf
    for _ in range(120):
        st_s, nbergs, _, overflow = step(st_s, frc_s)
        assert int(np.asarray(nbergs)) == 2
        assert int(np.max(np.asarray(overflow))) == 0
        # gap through the fold (glued metric)
        lat = _owned(st_s, "lat")
        gap = float(np.sum(LAT_TOP - lat))
        min_gap = min(min_gap, abs(gap))
    # contact repulsion turned both around before they interpenetrated
    assert min_gap > 100.0, min_gap
    vv = _owned(st_s, "vvel")
    assert (vv < 0).all(), vv
    assert (_owned(st_s, "lat") < LAT_TOP).all()


def test_contact_through_the_fold_fused3():
    """Same fold collision through the fused3 production contact path
    (the halo fold image supplies the partner; the Pallas search runs
    per tile on the local sorted view)."""
    cfg = world_cfg(dt=60.0, interactive_icebergs_on=True,
                    spring_coef=1.e-5)
    mesh, world = _folded_world(cfg)
    frc = ibt.uniform_forcing(NX, NY, sst=2.0)

    xa = 12000.0
    st = ibt.create_bergs(64, lon=[xa, NX * DXY - xa],
                          lat=[LAT_TOP - 400., LAT_TOP - 400.],
                          vvel=[0.1, 0.1], mass=850. * 100 * 200 * 200,
                          thickness=100., width=200., length=200.,
                          mass_scaling=1.0, id_cnt=[1, 2])
    frc_s = dd.shard_forcing_2d(world, frc)
    st_s = dd.shard_state_2d(world, st, local_capacity=32)
    step = dd.make_sharded_step_2d(world, with_thermo=False,
                                   neighbor_mode="fused3",
                                   fused_interpret=True,
                                   fused_window=512)

    min_gap = np.inf
    for _ in range(120):
        st_s, nbergs, _, overflow = step(st_s, frc_s)
        assert int(np.asarray(nbergs)) == 2
        assert int(np.max(np.asarray(overflow))) == 0
        lat = _owned(st_s, "lat")
        gap = float(np.sum(LAT_TOP - lat))
        min_gap = min(min_gap, abs(gap))
    assert min_gap > 100.0, min_gap
    vv = _owned(st_s, "vvel")
    assert (vv < 0).all(), vv
    assert (_owned(st_s, "lat") < LAT_TOP).all()
