"""DEM bonded-particle validation: the cantilever beam test of Wang 2020
section 3.2, as configured by the reference's tests/dem_cbeam_test
(90 elements in 3 rows, clamped first column, end load 1.5e10 N).

The beam must bend toward the analytic Euler-Bernoulli deflection
w(x) = P x^2 (3l - x) / (6 E I) with E = dem_spring_coef = 1e9 Pa,
l = 29*5000 m, I = (3*5000)^3/12 (tests/dem_cbeam_test/animate_trajectories.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.model import make_multi_step


def cbeam_config(substeps=200):
    """tests/dem_cbeam_test/input.nml (mts_sub_steps reduced: stability
    requires dtf < 0.3/sqrt(kn/m) ~ 1.4 s; 0.5 s keeps the same physics)."""
    return ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=300.e3, use_f_plane=True, lat_ref=0.,
        dt=100.0, Runge_not_Verlet=False,
        dem=True, mts=True, mts_sub_steps=substeps,
        dem_beam_test=2, poisson=0.3, dem_damping_coef=0.7,
        rho_bergs=900., dem_spring_coef=1.e9,
        force_convergence=True, convergence_tolerance=1e-8,
        contact_distance=2000.0, contact_spring_coef=1.e-8,
        cdrag_grounding=3.16e6, h_to_init_grounding=200.0,
        fracture_criterion='none', spring_coef=1.e-5,
        radial_damping_coef=0., tangental_damping_coef=0.,
        scale_damping_by_pmag=False, critical_interaction_damping_on=False,
        tang_crit_int_damp_on=False,
        iceberg_bonds_on=True, interactive_icebergs_on=True,
        only_interactive_forces=True, max_bonds=4,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        explicit_inner_mts=True, orig_dem_moment_of_inertia=True,
        hexagonal_icebergs=False)


def build_beam(cfg):
    """90-element beam: 3 rows x 30, spacing 2r=5000 m, first column static
    (dem_cbeam_test/makeberg/makeberg.py)."""
    r = 2500.0
    xs, ys = 101.e3, 151.e3
    h = 1.0
    rho = 900.0
    area = (2 * r) ** 2
    lon, lat, static = [], [], []
    for row in range(3):
        for col in range(30):
            lon.append(xs + col * 2 * r)
            lat.append(ys + row * 2 * r)
            static.append(1.0 if col == 0 else 0.0)
    n = len(lon)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 15000., 15000.,
                                 grid_is_latlon=False)
    st = ibt.create_bergs(128, lon=lon, lat=lat, thickness=h,
                          width=np.sqrt(area), length=np.sqrt(area),
                          mass=h * rho * area, mass_scaling=1.0,
                          static_berg=static, max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    return grid, st, n


def test_beam_bond_count():
    cfg = cbeam_config()
    grid, st, n = build_beam(cfg)
    # 294 directed bonds (dem_cbeam_test/input.nml header comment)
    assert int(jnp.sum((st.bond_idx >= 0).astype(jnp.int32))) == 294
    # single conglomerate
    labs = np.asarray(st.conglom_id)[:n]
    assert len(set(labs.tolist())) == 1


def test_cantilever_beam_deflection():
    cfg = cbeam_config(substeps=200)
    grid, st, n = build_beam(cfg)
    frc = ibt.uniform_forcing(20, 20, sst=-2.)

    nsteps = 300   # nmax=300 at ibdt=100 s
    multi = make_multi_step(grid, cfg, 50, with_thermo=False)
    for _ in range(nsteps // 50):
        st = jax.block_until_ready(multi(st, frc))

    lon1 = np.asarray(st.lon)[:n]
    lat1 = np.asarray(st.lat)[:n]
    assert np.all(np.isfinite(lon1)) and np.all(np.isfinite(lat1))

    # analytic deflection at the tip
    E = 1.e9
    P = 1.5e10
    l = 29 * 5000.
    h = 3 * 5000.
    I = (h ** 3) / 12.
    w_tip = -P * (l ** 2) * (3 * l - l) / (6 * E * I)   # = -P l^3/(3EI)

    # middle-row tip element index: row 1 (0-based), col 29
    tip = 1 * 30 + 29
    defl = lat1[tip] - 156.e3
    assert defl < 0., defl                     # bends downward
    assert abs(defl - w_tip) < 0.4 * abs(w_tip), (defl, w_tip)

    # clamped wall did not move
    wall = [0, 30, 60]
    for wdx in wall:
        assert abs(lon1[wdx] - 101.e3) < 1.0
    # beam stays cohesive: first mobile element still ~5000m from wall
    d = np.hypot(lon1[1] - lon1[0], lat1[1] - lat1[0])
    assert 2500. < d < 7500., d


def test_broken_bond_contact_shared_gather():
    """dem_contact_forces fed from the shared bond_partner_fields table
    must be bitwise the standalone-gather kernel (the per-substep
    broken-bond contact path, icebergs.F90:806-956 called from 1838)."""
    from icebergs_tpu.ops import dem as dem_ops
    cfg = cbeam_config()
    grid, st, n = build_beam(cfg)
    # age the state a little so *_old fields and velocities are nontrivial
    rng = np.random.RandomState(3)
    st = st.replace(
        lon=st.lon + rng.uniform(-200., 200., st.capacity),
        lat=st.lat + rng.uniform(-200., 200., st.capacity),
        uvel=st.uvel + rng.uniform(-.1, .1, st.capacity),
        vvel=st.vvel + rng.uniform(-.1, .1, st.capacity),
        ang_vel=st.ang_vel + rng.uniform(-1e-4, 1e-4, st.capacity))
    st = st.replace(lon_old=st.lon, lat_old=st.lat,
                    uvel_old=st.uvel, vvel_old=st.vvel)
    # break ~half the bonds
    has = np.asarray(st.bond_idx) >= 0
    brk = (rng.uniform(size=st.bond_idx.shape) < 0.5) & has
    st = st.replace(bond_broken=jnp.where(jnp.asarray(brk), 1,
                                          st.bond_broken))

    bo = jnp.maximum(st.bond_idx, 0)
    bm = (st.bond_idx >= 0) & (st.bond_broken == 1) \
        & st.alive[:, None] & st.alive[bo]
    ref = dem_ops.dem_contact_forces(st, cfg, bo, bm)
    part = dem_ops.bond_partner_fields(st)
    out = dem_ops.dem_contact_forces(st, cfg, bo, bm, part=part)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.any(bm)), "no broken-bond pairs exercised"
    assert any(float(jnp.max(jnp.abs(x))) > 0. for x in out)
