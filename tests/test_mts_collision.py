"""MTS-KID collision test: two bonded conglomerates collide in the
converging jet under the multiple-time-stepping scheme — the reference's
tests/collision_tests/input_MTS_KID.nml configuration (mts, 60 substeps,
contact_distance, separate contact spring, force_convergence)."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.model import make_multi_step


def mts_kid_config():
    """input_MTS_KID.nml values."""
    return ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=20000., use_f_plane=True, lat_ref=0.,
        dt=3600.0, Runge_not_Verlet=False,
        mts=True, mts_sub_steps=60, explicit_inner_mts=True,
        force_convergence=True, convergence_tolerance=1e-8,
        contact_distance=1.75e3, contact_spring_coef=1.e-7,
        hexagonal_icebergs=True, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=1.e-5,
        critical_interaction_damping_on=True, allow_bergs_to_roll=False,
        set_melt_rates_to_zero=True, max_bonds=6)


def test_mts_conglomerate_collision():
    cfg = mts_kid_config()
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    # converging jet (driver:313-327)
    frc = ibt.uniform_forcing(20, 20, sst=-2.0)
    xc = 1000. * np.arange(21)[:, None] * np.ones((1, 21))
    yc = 1000. * np.arange(21)[None, :] * np.ones((21, 1))
    mid = 10.e3
    vo = np.where((xc > mid) | (xc <= 0.) | (yc == mid), 0.,
                  np.where(yc > mid, -0.2, 0.2))
    frc = frc.replace(vo=jnp.asarray(vo, jnp.float32))

    side = 400.0
    lon, lat = [], []
    for (cx, cy) in ((5000., 8000.), (5000., 12000.)):
        for dx in (-side / 2, side / 2):
            for dy in (-side / 2, side / 2):
                lon.append(cx + dx)
                lat.append(cy + dy)
    n = len(lon)
    st = ibt.create_bergs(32, lon=lon, lat=lat,
                          mass=850. * 100 * side * side, thickness=100.,
                          width=side, length=side, mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=side * 1.2))
    assert int(jnp.sum((st.bond_idx >= 0).astype(jnp.int32))) == 16

    multi = make_multi_step(grid, cfg, 12, with_thermo=False)
    for _ in range(4):   # 48 h at dt=3600
        st = jax.block_until_ready(multi(st, frc))

    lon1 = np.asarray(st.lon)[:n]
    lat1 = np.asarray(st.lat)[:n]
    assert np.all(np.isfinite(lon1)) and np.all(np.isfinite(lat1))
    # conglomerates approached the midline but did not interpenetrate
    # deeper than the contact distance allows
    dmin = np.inf
    for a in range(4):
        for b in range(4, 8):
            dmin = min(dmin, np.hypot(lon1[a] - lon1[b], lat1[a] - lat1[b]))
    # hexagonal radii: R = sqrt(A/(2 sqrt 3)) ~ 215 m; crit = max(R1+R2,
    # contact_distance) = 1750 m
    assert dmin > 800., dmin
    # bonds survive the collision: nearest same-conglomerate neighbor
    # stays near the bond equilibrium
    d01 = np.hypot(lon1[0] - lon1[1], lat1[0] - lat1[1])
    assert 200. < d01 < 700., d01
    # conglomerates were pushed toward the midline by the jet
    assert np.mean(lat1[:4]) > 8000.
    assert np.mean(lat1[4:]) < 12000.


def test_mts_implicit_inner_substeps():
    """Default (non-explicit) MTS inner substeps: bonded pair evolves via
    the implicit accel_mts path and stays cohesive/finite."""
    cfg = mts_kid_config().replace(explicit_inner_mts=False,
                                   force_convergence=True,
                                   mts_sub_steps=20, dt=600.)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, uo=0.2, sst=-2.0)
    side = 400.0
    st = ibt.create_bergs(16, lon=[9800., 10200.], lat=[10500., 10500.],
                          mass=850. * 100 * side * side, thickness=100.,
                          width=side, length=side, mass_scaling=1.,
                          id_cnt=[1, 2])
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=side * 1.2))
    assert int(st.n_bonds[0]) == 1

    multi = make_multi_step(grid, cfg, 24, with_thermo=False)
    st = jax.block_until_ready(multi(st, frc))
    lon1 = np.asarray(st.lon)[:2]
    assert np.all(np.isfinite(lon1))
    # drifted with the current and stayed within bond reach
    assert np.all(lon1 > np.asarray([9800., 10200.]) + 500.)
    d = abs(lon1[1] - lon1[0])
    assert 100. < d < 900., d


def test_mts_pair_compaction_matches_dense():
    """pair_cap substep contact (frozen pair list) must track the dense
    (N, M) path: same candidate set, scatter-add accumulation order."""
    cfg = mts_kid_config().replace(dem=True, explicit_inner_mts=True,
                                   dem_spring_coef=5.e6,
                                   dem_damping_coef=1.0).normalized(
        warn=False)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, sst=-2.0, vo=0.05)
    side = 400.0
    lon, lat = [], []
    for (cx, cy) in ((5000., 8000.), (5000., 9200.)):
        for dx in (-side / 2, side / 2):
            for dy in (-side / 2, side / 2):
                lon.append(cx + dx)
                lat.append(cy + dy)
    n = len(lon)
    st = ibt.create_bergs(32, lon=lon, lat=lat,
                          mass=850. * 100 * side * side, thickness=100.,
                          width=side, length=side, mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=side * 1.2))
    st = forces.compute_conglom_ids_host(st)

    step_d = ibt.make_step(grid, cfg, with_thermo=False)
    step_p = ibt.make_step(grid, cfg, with_thermo=False, mts_pair_cap=256)
    sd, sp = st, st
    for _ in range(6):
        sd, _ = step_d(sd, frc)
        sp, _ = step_p(sp, frc)
    np.testing.assert_allclose(np.asarray(sp.lon)[:n],
                               np.asarray(sd.lon)[:n], rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(sp.uvel)[:n],
                               np.asarray(sd.uvel)[:n], rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.ang_vel)[:n],
                               np.asarray(sd.ang_vel)[:n], rtol=0,
                               atol=1e-7)


def test_auto_pair_cap_and_overflow_counter():
    """auto_pair_cap sizes the frozen substep pair list from the concrete
    ICs (PLAN round-3 gap 2); an undersized cap surfaces a nonzero
    StepDiags.contact_overflow instead of silently missing contacts."""
    from icebergs_tpu.mts import auto_pair_cap, compact_conglom_pairs
    cfg = mts_kid_config().replace(dem=True, explicit_inner_mts=True,
                                   dem_spring_coef=5.e6,
                                   dem_damping_coef=1.0).normalized(
        warn=False)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, sst=-2.0, vo=0.05)
    side = 400.0
    lon, lat = [], []
    for (cx, cy) in ((5000., 8000.), (5000., 9200.)):
        for dx in (-side / 2, side / 2):
            for dy in (-side / 2, side / 2):
                lon.append(cx + dx)
                lat.append(cy + dy)
    n = len(lon)
    st = ibt.create_bergs(32, lon=lon, lat=lat,
                          mass=850. * 100 * side * side, thickness=100.,
                          width=side, length=side, mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=side * 1.2))
    st = forces.compute_conglom_ids_host(st)

    nbr = forces.build_neighbor_tables(
        st, grid, cfg, max_per_cell=16,
        ncells_radius=forces.neighbor_radius(grid, cfg))
    cap = auto_pair_cap(st, nbr, cfg)
    assert cap % 1024 == 0 and cap >= 2048
    # the sized cap holds every candidate: zero overflow
    *_, ov, _sd = compact_conglom_pairs(st, nbr, cap, cfg=cfg, dt=cfg.dt)
    assert int(ov) == 0
    # a cap of 2 cannot (each 2x2 square has >= 2 same-conglom pairs per
    # row alone): overflow must be counted and surfaced by the step
    *_, ov2, _ = compact_conglom_pairs(st, nbr, 2, cfg=cfg, dt=cfg.dt)
    assert int(ov2) > 0
    step = ibt.make_step(grid, cfg, with_thermo=False, mts_pair_cap=2)
    _, d = step(st, frc)
    assert d.contact_overflow is not None and int(d.contact_overflow) > 0
    step_ok = ibt.make_step(grid, cfg, with_thermo=False, mts_pair_cap=cap)
    _, d_ok = step_ok(st, frc)
    assert int(d_ok.contact_overflow) == 0
