"""Berg-berg interaction tests: spring repulsion, bond cohesion, and a
two-conglomerate collision in a converging jet (the reference's
collision_tests configuration, tests/collision_tests/input_KID.nml).
"""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces


def kid_config(**kw):
    """KID collision-test configuration (input_KID.nml)."""
    base = dict(grid_is_latlon=False, Lx=20000., use_f_plane=True, lat_ref=0.,
                dt=3600.0, Runge_not_Verlet=False, hexagonal_icebergs=True,
                interactive_icebergs_on=True, iceberg_bonds_on=True,
                spring_coef=1.e-5, critical_interaction_damping_on=True,
                use_new_predictive_corrective=True, allow_bergs_to_roll=False)
    base.update(kw)
    return ibt.IcebergsConfig(**base)


def make_world(cfg, nx=20, ny=20, dxy=1000.0):
    grid = ibt.make_uniform_grid(nx, ny, 0.0, 0.0, dxy, dxy,
                                 grid_is_latlon=False)
    return grid


def converging_jet(nx, ny, dxy, vo0=0.2):
    """vo converges toward y=mid for 0<x<=mid (driver:313-327)."""
    frc = ibt.uniform_forcing(nx, ny, sst=-2.0)
    xc = dxy * np.arange(nx + 1)[:, None] * np.ones((1, ny + 1))
    yc = dxy * np.arange(ny + 1)[None, :] * np.ones((nx + 1, 1))
    mid = 10.e3
    vo = np.where((xc > mid) | (xc <= 0.) | (yc == mid), 0.,
                  np.where(yc > mid, -vo0, vo0))
    return frc.replace(vo=jnp.asarray(vo, jnp.float32))


def setup_bergs(grid, cfg, lon, lat, capacity=32, **kw):
    lon = np.asarray(lon, float)
    st = ibt.create_bergs(capacity, lon=lon, lat=np.asarray(lat, float),
                          max_bonds=6, **kw)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    conglom_id=jnp.arange(capacity, dtype=jnp.int32) + 1)
    return st


def run(st, grid, frc, cfg, n):
    from icebergs_tpu.model import make_multi_step
    multi = make_multi_step(grid, cfg, n, with_thermo=False)
    return jax.block_until_ready(multi(st, frc))


def test_two_bergs_repel_on_contact():
    """Unbonded bergs closer than the critical distance push apart."""
    cfg = kid_config(iceberg_bonds_on=False, hexagonal_icebergs=False)
    grid = make_world(cfg)
    frc = ibt.uniform_forcing(20, 20, sst=-2.)
    # two bergs 300 m apart with crit = R1+R2 = 2*sqrt(A/pi) ~ 451 m
    st = setup_bergs(grid, cfg, [9850., 10150.], [10500., 10500.],
                     mass=850. * 100 * 400 * 400, thickness=100.,
                     width=400., length=400., mass_scaling=1.0)
    d0 = float(st.lon[1] - st.lon[0])
    st = run(st, grid, frc, cfg, 24)
    d1 = float(st.lon[1] - st.lon[0])
    assert d1 > d0, (d0, d1)   # pushed apart
    assert np.isfinite(float(st.uvel[0]))


def test_bonded_pair_stays_together():
    """A bonded pair in a uniform flow stays near its rest length.
    The reference runs the interactive KID scheme at dt=60 s
    (tests/collision_tests/input_KID.nml ibdt=60) — the spring is unstable
    at coupling-scale dt."""
    cfg = kid_config(dt=60.0)
    grid = make_world(cfg)
    frc = ibt.uniform_forcing(20, 20, uo=0.2, sst=-2.)
    st = setup_bergs(grid, cfg, [9800., 10200.], [10500., 10500.],
                     mass=3.4e9, thickness=100., width=200., length=200.,
                     mass_scaling=1.0)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=500.0))
    assert int(st.n_bonds[0]) == 1 and int(st.n_bonds[1]) == 1
    st = run(st, grid, frc, cfg, 600)
    dx = float(st.lon[1] - st.lon[0])
    dy = float(st.lat[1] - st.lat[0])
    r = np.hypot(dx, dy)
    # in the legacy KID scheme the bond spring's rest separation is
    # crit_dist = R1+R2 (icebergs.F90:692-703), here 2*0.5*sqrt(A) = 200 m
    crit = 2 * 0.5 * np.sqrt(200. * 200.)
    assert abs(r - crit) < 0.25 * crit, (r, crit)
    # pair drifted with the flow
    assert float(st.lon[0]) > 9800.


def test_conglomerate_collision_converging_jet():
    """Two 4-element bonded conglomerates collide in the converging jet;
    they must repel (no deep interpenetration) and stay bonded."""
    cfg = kid_config(dt=60.0)
    grid = make_world(cfg)
    frc = converging_jet(20, 20, 1000.0)
    # squares of 4 elements, 400 m side, in the jet's two halves
    side = 400.0
    cA = (5000.0, 7500.0)   # lower half, moving +y
    cB = (5000.0, 12500.0)  # upper half, moving -y
    lon, lat = [], []
    for (cx, cy) in (cA, cB):
        for dx in (-side / 2, side / 2):
            for dy in (-side / 2, side / 2):
                lon.append(cx + dx)
                lat.append(cy + dy)
    st = setup_bergs(grid, cfg, lon, lat, mass=850. * 100 * side * side,
                     thickness=100., width=side, length=side,
                     mass_scaling=1.0)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=side * 1.2))
    # each element bonds to its 2 edge-neighbors
    assert int(st.n_bonds[0]) == 2
    # conglomerate labels: first 4 share one, last 4 another
    labs = np.asarray(st.conglom_id)[:8]
    assert len(set(labs[:4])) == 1 and len(set(labs[4:])) == 1
    assert labs[0] != labs[4]

    st = run(st, grid, frc, cfg, 2880)   # 48 h at dt=60 (RUN_KID)
    lon1 = np.asarray(st.lon)[:8]
    lat1 = np.asarray(st.lat)[:8]
    assert np.all(np.isfinite(lon1)) and np.all(np.isfinite(lat1))
    # conglomerates approached but did not interpenetrate: the minimum
    # distance between elements of different conglomerates stays above
    # ~half the contact distance (R1+R2 = 2*sqrt(A/(2 sqrt 3)))
    R = np.sqrt(side * side / (2 * np.sqrt(3.)))
    dmin = np.inf
    for a in range(4):
        for b in range(4, 8):
            dmin = min(dmin, np.hypot(lon1[a] - lon1[b], lat1[a] - lat1[b]))
    assert dmin > 1.0 * R, (dmin, R)
    # bonds intact: neighbors still ~side apart
    d01 = np.hypot(lon1[0] - lon1[1], lat1[0] - lat1[1])
    assert abs(d01 - side) < 0.5 * side, d01
