"""Single-berg dynamics validation: drift relaxation, inertial circles,
slope-driven acceleration, coast bounce.

These are the analytic anchors the reference validates by eye with its
stand-alone driver (driver/icebergs_driver.F90 constant-forcing modes).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import icebergs_tpu as ibt
from icebergs_tpu import constants as C
from icebergs_tpu.grid import pos_to_cell


def make_world(nx=20, ny=20, dxy=5000.0, latlon=False, **cfg_kw):
    cfg = ibt.IcebergsConfig(grid_is_latlon=latlon, Lx=-1.0 if not latlon else 360.,
                             **cfg_kw)
    grid = ibt.make_uniform_grid(nx, ny, 0.0, 0.0, dxy, dxy,
                                 grid_is_latlon=latlon, Rearth=cfg.Rearth)
    return cfg, grid


def place(grid, cfg, lon, lat, capacity=8, **kw):
    st = ibt.create_bergs(capacity, lon=np.atleast_1d(lon),
                          lat=np.atleast_1d(lat), **kw)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat,
                               cfg.Lx if cfg.grid_is_latlon else -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


def run_steps(st, grid, frc, cfg, n):
    import jax
    step = jax.jit(lambda s: ibt.step_dynamics(s, grid, frc, cfg).state)
    for _ in range(n):
        st = step(st)
    return st


@pytest.mark.parametrize("runge", [True, False])
def test_relaxation_to_ocean_velocity(runge):
    """A berg in a uniform current relaxes toward the water velocity."""
    cfg, grid = make_world(latlon=False, Runge_not_Verlet=runge,
                           use_f_plane=True, lat_ref=0.0, dt=600.0)
    frc = ibt.uniform_forcing(grid.nx, grid.ny, uo=0.5, vo=0.0)
    st = place(grid, cfg, 50000.0, 50000.0, mass=1e8, thickness=10.,
               width=30., length=30.)
    st = run_steps(st, grid, frc, cfg, 400)
    u = float(st.uvel[0])
    assert 0.3 < u <= 0.55, u
    # still inside the domain
    assert 0.0 < float(st.lon[0]) < 20 * 5000.0


@pytest.mark.parametrize("runge", [True, False])
def test_inertial_rotation(runge):
    """On an f-plane with no forcing, the velocity vector rotates clockwise
    (NH) at the inertial frequency."""
    lat0 = 45.0
    f = 2 * C.OMEGA * math.sin(math.radians(lat0))
    cfg, grid = make_world(nx=40, ny=40, dxy=2000.0, latlon=False,
                           Runge_not_Verlet=runge, use_f_plane=True,
                           lat_ref=lat0, dt=120.0)
    frc = ibt.uniform_forcing(grid.nx, grid.ny)
    # huge berg => negligible drag
    st = place(grid, cfg, 40000.0, 40000.0, uvel=0.2, vvel=0.0,
               mass=1e12, thickness=200., width=800., length=800.)
    # integrate a quarter inertial period
    T4 = (2 * math.pi / f) / 4.0
    n = int(round(T4 / cfg.dt))
    st = run_steps(st, grid, frc, cfg, n)
    u, v = float(st.uvel[0]), float(st.vvel[0])
    ang = math.degrees(math.atan2(v, u))
    # expected: rotated from 0 deg to about -90 deg
    assert -110.0 < ang < -70.0, ang
    speed = math.hypot(u, v)
    assert 0.1 < speed <= 0.25, speed


def test_ssh_slope_acceleration():
    """-g grad(ssh) drives the berg downslope (plus Coriolis deflection)."""
    cfg, grid = make_world(nx=20, ny=20, dxy=5000.0, latlon=False,
                           use_f_plane=True, lat_ref=0.0, dt=60.0,
                           Runge_not_Verlet=True)
    # ssh sloping down to the east: eta = -s * x
    s = 1e-6
    x_centers = (np.arange(22) - 0.5) * 5000.0
    ssh = np.tile((-s * x_centers)[:, None], (1, 22)).astype(np.float32)
    frc = ibt.uniform_forcing(grid.nx, grid.ny)
    frc = frc.replace(ssh=jnp.asarray(ssh))
    st = place(grid, cfg, 50000.0, 50000.0, mass=1e9, thickness=50.,
               width=100., length=100.)
    st = run_steps(st, grid, frc, cfg, 5)
    # du/dt ~ g*s => after 5 steps u ~ 5*60*9.8*1e-6 = 2.9e-3 (minus drag)
    u = float(st.uvel[0])
    assert u > 1e-3, u


def test_coast_bounce():
    """A berg pushed at a land cell bounces instead of entering it."""
    nx = ny = 10
    msk = np.ones((nx, ny))
    msk[6, :] = 0.0   # wall of land at i=6
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=0.0, dt=600.0, Runge_not_Verlet=True)
    grid = ibt.make_uniform_grid(nx, ny, 0.0, 0.0, 1000.0, 1000.0,
                                 grid_is_latlon=False, msk=msk)
    frc = ibt.uniform_forcing(nx, ny, uo=1.0)
    st = place(grid, cfg, 5200.0, 5500.0, mass=1e7, thickness=10.,
               width=20., length=20.)
    st = run_steps(st, grid, frc, cfg, 50)
    # berg must stay west of the wall
    assert float(st.lon[0]) < 6000.0
    assert int(st.ine[0]) <= 5


def test_walk_matches_scalar_reference():
    """adjust_index_and_ground (5x5 packed-bit, 2-gather walk) must
    match a direct per-berg transcription of the reference walk
    (icebergs.F90:7941-8056) bit for bit, including coast bounces and
    multi-cell walks near land."""
    from icebergs_tpu.dynamics import adjust_index_and_ground, POSN_EPS

    nx = ny = 12
    rng = np.random.RandomState(7)
    msk = (rng.uniform(size=(nx, ny)) > 0.3).astype(float)
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0)
    grid = ibt.make_uniform_grid(nx, ny, 0.0, 0.0, 1000.0, 1000.0,
                                 grid_is_latlon=False, msk=msk)

    n = 4000
    i0 = rng.randint(0, nx, n)
    j0 = rng.randint(0, ny, n)
    # positions up to ~3.5 cells away drive 1-4 iteration walks
    lon = (i0 + 0.5 + rng.uniform(-3.5, 3.5, n)) * 1000.0
    lat = (j0 + 0.5 + rng.uniform(-3.5, 3.5, n)) * 1000.0

    lon2, lat2, i2, j2, xi2, yj2, b2 = adjust_index_and_ground(
        grid, cfg, jnp.asarray(lon, jnp.float32),
        jnp.asarray(lat, jnp.float32),
        jnp.asarray(i0, jnp.int32), jnp.asarray(j0, jnp.int32))

    def ref_walk(lon, lat, i, j):
        lon, lat = np.float32(lon), np.float32(lat)
        fx = np.float32(lon / np.float32(1000.0))
        fy = np.float32(lat / np.float32(1000.0))
        bounced = False
        ocean = lambda p, q: (0 <= p < nx and 0 <= q < ny
                              and msk[p, q] > 0.)
        for _ in range(4):
            xi = np.float32(fx - np.float32(i))
            yj = np.float32(fy - np.float32(j))
            in_cell = (xi >= 0.) and (xi < 1.) and (yj >= 0.) and (yj < 1.)
            ti = int(np.clip(i - (xi < 0.) + (xi >= 1.), 0, nx - 1))
            b_x = (not in_cell) and (xi < 0. or xi >= 1.) \
                and ((not ocean(ti, j)) or ti == i)
            if (not in_cell) and (xi < 0. or xi >= 1.) and ocean(ti, j) \
                    and ti != i:
                i = ti
            tj = int(np.clip(j - (yj < 0.) + (yj >= 1.), 0, ny - 1))
            b_y = (not in_cell) and (yj < 0. or yj >= 1.) \
                and ((not ocean(i, tj)) or tj == j)
            if (not in_cell) and (yj < 0. or yj >= 1.) and ocean(i, tj) \
                    and tj != j:
                j = tj
            nb = b_x or b_y
            bounced = bounced or nb
            xi = np.float32(fx - np.float32(i))
            yj = np.float32(fy - np.float32(j))
            xi_c = np.float32(np.clip(xi, POSN_EPS, 1. - POSN_EPS))
            yj_c = np.float32(np.clip(yj, POSN_EPS, 1. - POSN_EPS))
            if nb:
                lon = np.float32((np.float32(i) + xi_c)
                                 * np.float32(1000.0))
                lat = np.float32((np.float32(j) + yj_c)
                                 * np.float32(1000.0))
                fx = np.float32(np.float32(i) + xi_c)
                fy = np.float32(np.float32(j) + yj_c)
        xi = np.float32(fx - np.float32(i))
        yj = np.float32(fy - np.float32(j))
        bad = (xi < 0.) or (xi >= 1.) or (yj <= 0.) or (yj > 1.)
        xi_c = np.float32(np.clip(xi, POSN_EPS, 1. - POSN_EPS))
        yj_c = np.float32(np.clip(yj, POSN_EPS, 1. - POSN_EPS))
        if bad:
            lon = np.float32((np.float32(i) + xi_c) * np.float32(1000.0))
            lat = np.float32((np.float32(j) + yj_c) * np.float32(1000.0))
            xi, yj = xi_c, yj_c
        return lon, lat, i, j, xi, yj, bounced

    lon2 = np.asarray(lon2)
    lat2 = np.asarray(lat2)
    i2 = np.asarray(i2)
    j2 = np.asarray(j2)
    b2 = np.asarray(b2)
    for k in range(n):
        rl, rt, ri, rj, rxi, ryj, rb = ref_walk(lon[k], lat[k],
                                                int(i0[k]), int(j0[k]))
        assert (ri, rj) == (i2[k], j2[k]), \
            (k, i0[k], j0[k], lon[k], lat[k], ri, rj, i2[k], j2[k])
        assert rb == bool(b2[k]), (k, rb, b2[k])
        np.testing.assert_array_equal(np.float32(rl), lon2[k],
                                      err_msg=str(k))
        np.testing.assert_array_equal(np.float32(rt), lat2[k],
                                      err_msg=str(k))


def test_latlon_metric():
    """Motion in degrees uses the spherical metric."""
    cfg, grid = make_world(nx=20, ny=20, dxy=0.5, latlon=True, dt=3600.0,
                           Runge_not_Verlet=True)
    frc = ibt.uniform_forcing(grid.nx, grid.ny, uo=1.0)
    st = place(grid, cfg, 5.0, 5.0, uvel=1.0, mass=1e7, thickness=10.,
               width=20., length=20.)
    lon_before = float(st.lon[0])
    st = run_steps(st, grid, frc, cfg, 10)
    dlon = float(st.lon[0]) - lon_before
    # ~1 m/s for 10h at 5N: ddeg = 36000 / (pi/180*Re*cos(5deg))
    expected = 36000.0 / (C.PI_180 * cfg.Rearth * math.cos(math.radians(5.0)))
    assert abs(dlon - expected) / expected < 0.15, (dlon, expected)


def test_grow_capacity_preserves_state_and_bonds():
    """grow_capacity keeps slots (and bond partner indices) stable and
    leaves new slots dead; the grown state steps identically."""
    import icebergs_tpu as ibt
    from icebergs_tpu import grow_capacity
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces

    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30., dt=60.,
                             interactive_icebergs_on=True,
                             iceberg_bonds_on=True, spring_coef=1.e-5,
                             max_bonds=4)
    grid = ibt.make_uniform_grid(10, 10, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(10, 10, uo=0.1, sst=-2.)
    st = ibt.create_bergs(8, lon=[2500., 2800.], lat=[2500., 2500.],
                          mass=8.5e8, thickness=100., width=100.,
                          length=100., mass_scaling=1., id_cnt=[1, 2],
                          max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=400.))
    assert int(st.n_bonds[0]) == 1

    big = grow_capacity(st, 32)
    assert big.capacity == 32
    assert int(np.asarray(big.alive).sum()) == 2
    assert int(big.bond_idx[0, 0]) == 1          # slots preserved
    assert int(np.asarray(big.bond_idx)[8:].max()) == -1

    step_s = ibt.make_step(grid, cfg, with_thermo=False)
    step_b = ibt.make_step(grid, cfg, with_thermo=False)
    s1, _ = step_s(st, frc)
    s2, _ = step_b(big, frc)
    np.testing.assert_array_equal(np.asarray(s1.lon)[:2],
                                  np.asarray(s2.lon)[:2])
    np.testing.assert_array_equal(np.asarray(s1.uvel)[:2],
                                  np.asarray(s2.uvel)[:2])


def test_walk_compact_matches_dense(monkeypatch):
    """Mover-compacted adjust_index_and_ground == dense walk bitwise,
    including land bounces, and the cap-overflow lax.cond falls back to
    the dense path (same results)."""
    from icebergs_tpu import dynamics

    nx = ny = 24
    dxy = 1000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0)
    grid = ibt.make_uniform_grid(nx, ny, 0., 0., dxy, dxy,
                                 grid_is_latlon=False)
    # land strip so some movers bounce
    msk = np.asarray(grid.msk).copy()
    msk[10:13, :] = 0.
    grid = grid.replace(msk=jnp.asarray(msk))

    rng = np.random.RandomState(3)
    N = 4096
    lon0 = rng.uniform(1.5 * dxy, (nx - 1.5) * dxy, N)
    lat0 = rng.uniform(1.5 * dxy, (ny - 1.5) * dxy, N)
    i0 = np.clip((lon0 // dxy).astype(np.int32), 0, nx - 1)
    j0 = np.clip((lat0 // dxy).astype(np.int32), 0, ny - 1)
    # move ~30% of bergs 1-3 cells (some into the land strip)
    mv = rng.rand(N) < 0.3
    lon = lon0 + np.where(mv, rng.uniform(-3., 3., N) * dxy, 0.)
    lat = lat0 + np.where(mv, rng.uniform(-3., 3., N) * dxy, 0.)
    lon = np.clip(lon, 0.6 * dxy, (nx - 0.6) * dxy)
    lat = np.clip(lat, 0.6 * dxy, (ny - 0.6) * dxy)
    args = (jnp.asarray(lon, jnp.float32), jnp.asarray(lat, jnp.float32),
            jnp.asarray(i0), jnp.asarray(j0))

    dense = dynamics.adjust_index_and_ground(grid, cfg, *args)

    monkeypatch.setattr(dynamics, "WALK_COMPACT_MIN_N", 64)
    comp = dynamics.adjust_index_and_ground(grid, cfg, *args)
    assert int(jnp.sum(comp[6])) > 0        # some bounces exercised
    for a, b in zip(dense, comp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # overflow: cap forced below the mover count -> the lax.cond takes
    # the dense-fallback branch; results unchanged
    monkeypatch.setattr(dynamics, "WALK_COMPACT_CAP_FLOOR", 8)
    monkeypatch.setattr(dynamics, "WALK_COMPACT_FRAC", N)
    over = dynamics.adjust_index_and_ground(grid, cfg, *args)
    for a, b in zip(dense, over):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
