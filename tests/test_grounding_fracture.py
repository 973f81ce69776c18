"""Grounding drag and DEM stress fracture — the physics exercised by the
reference's dem_ground_frac_test (berg grounds on a Gaussian seamount and
the conglomerate fractures; tests/dem_ground_frac_test/README).
"""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces, dem


def test_grounding_drag_stops_berg():
    """A berg drifting over a shoal (draught > depth + margin) is slowed
    by the grounding drag ramp (accel c_gnd, icebergs.F90:2075-2093)."""
    nx = ny = 30
    dxy = 1000.0
    # seamount: shallow (40 m) in the east half, deep in the west
    depth = np.full((nx, ny), 1000.0)
    depth[15:, :] = 40.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             lat_ref=0., dt=600., Runge_not_Verlet=False,
                             use_new_predictive_corrective=True,
                             cdrag_grounding=3.16e6, h_to_init_grounding=20.,
                             allow_bergs_to_roll=False)
    grid = ibt.make_uniform_grid(nx, ny, 0., 0., dxy, dxy,
                                 grid_is_latlon=False, ocean_depth=depth)
    frc = ibt.uniform_forcing(nx, ny, uo=0.5, sst=-2.)
    # thick berg: draught = 850/1025*100 = 83 m >> 40 m shoal
    st = ibt.create_bergs(8, lon=[5000.], lat=[15000.], thickness=100.,
                          width=200., length=200., mass=850. * 100 * 4e4,
                          mass_scaling=1.)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    step = ibt.make_step(grid, cfg, with_thermo=False)
    for _ in range(200):
        st, _ = step(st, frc)
    lon_grounded = float(st.lon[0])
    # the berg entered the shoal but the grounding drag pinned it there
    assert lon_grounded > 15000., lon_grounded
    assert lon_grounded < 19000., lon_grounded
    assert abs(float(st.uvel[0])) < 0.02

    # control: without grounding drag it sails across
    cfg2 = cfg.replace(cdrag_grounding=0.0)
    st2 = ibt.create_bergs(8, lon=[5000.], lat=[15000.], thickness=100.,
                           width=200., length=200., mass=850. * 100 * 4e4,
                           mass_scaling=1.)
    i, j, xi, yj = pos_to_cell(grid, st2.lon, st2.lat, -1.0)
    st2 = st2.replace(ine=i, jne=j, xi=xi, yj=yj)
    step2 = ibt.make_step(grid, cfg2, with_thermo=False)
    for _ in range(200):
        st2, _ = step2(st2, frc)
    assert float(st2.lon[0]) > lon_grounded + 5000.


def test_dem_stress_fracture_breaks_bond():
    """A bonded pair pulled apart exceeds frac_thres_n and breaks
    (break_bonds_dem stress criterion)."""
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., dem=True,
                             mts=True, iceberg_bonds_on=True,
                             interactive_icebergs_on=True,
                             only_interactive_forces=True,
                             dem_spring_coef=1.e9, poisson=0.3,
                             dem_damping_coef=0.7, max_bonds=4,
                             fracture_criterion='stress',
                             frac_thres_n=1.e4, frac_thres_t=1.e20,
                             mts_sub_steps=1, dt=1.0, use_f_plane=True,
                             explicit_inner_mts=True,
                             manually_initialize_bonds=True,
                             manually_initialize_bonds_from_radii=True)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    # pair stretched beyond rest length: l0 = R1+R2 = 5000, actual = 5500
    st = ibt.create_bergs(8, lon=[40000., 45500.], lat=[40000., 40000.],
                          thickness=1., width=5000., length=5000.,
                          mass=900. * 25e6, mass_scaling=1.,
                          id_cnt=[1, 2])
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    lon_old=st.lon, lat_old=st.lat)
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=6000.))
    assert int(st.n_bonds[0]) == 1

    # evaluate bond forces once to populate stresses, then fracture:
    # nstress = (k/l0)(-2 half_delta) = (1e9/5000)(500) = 1e8 >> 1e4
    out = dem.dem_bond_forces(st, cfg, 1.0)
    st = st.replace(bond_nstress=out.nstress, bond_sstress=out.sstress)
    st2, nbroken = dem.break_bonds_dem(st, cfg)
    assert int(nbroken) == 2          # both directed bonds
    assert int(st2.n_bonds[0]) == 0
    assert int(st2.bond_broken[0, 0]) == 1
    # tension pulls the bergs together before breaking (force sign)
    assert float(out.F_x[0]) > 0. or float(out.F_x[1]) < 0.

    # compressed pair: nstress negative -> no fracture
    st3 = st.replace(lat=st.lat, lon=jnp.asarray([40000., 44500., 0., 0.,
                                                  0., 0., 0., 0.],
                                                 st.dtype))
    st3 = st3.replace(lon_old=st3.lon, bond_broken=jnp.zeros_like(
        st3.bond_broken))
    out3 = dem.dem_bond_forces(st3, cfg, 1.0)
    st3 = st3.replace(bond_nstress=out3.nstress, bond_sstress=out3.sstress)
    _, nb3 = dem.break_bonds_dem(st3, cfg)
    assert int(nb3) == 0
