"""Footloose calving tests (Huth et al 2022a): child spawning geometry,
parent shrink, fl_bits binning, promotion, and the fl_k state machine.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import constants as C
from icebergs_tpu import footloose as fl
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces


def world(fl_style='new_bergs', **kw):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             dt=1800.0, footloose=True, fl_style=fl_style,
                             fl_youngs=1.e8, fl_strength=250., **kw)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 5000., 5000.,
                                 grid_is_latlon=False)
    return cfg, grid


def parent(grid, cfg, fl_k=0.0, T=250., L=8000., W=6000.):
    st = ibt.create_bergs(16, lon=[50000.], lat=[50000.], thickness=T,
                          width=W, length=L, mass=850. * T * L * W,
                          mass_scaling=1.0, fl_k=fl_k)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


def expected_lb(cfg, T):
    l_c = math.pi / (2. * math.sqrt(2.))
    lw_c = 1. / (C.GRAVITY * C.RHO_SEAWATER)
    B_c = cfg.fl_youngs / (12. * (1. - 0.09))
    l_w = (lw_c * B_c * T ** 3) ** 0.25
    return l_c * l_w, l_w


def test_no_calving_without_foot():
    cfg, grid = world()
    st = parent(grid, cfg, fl_k=0.0)
    st2, d = fl.footloose_calving(st, grid, cfg, jax.random.PRNGKey(0))
    assert int(d.nbergs_calved_fl) == 0
    assert int(st2.count()) == 1


def test_child_spawn_geometry():
    cfg, grid = world()
    T = 250.
    l_b, l_w = expected_lb(cfg, T)
    # foot area needed for one child (icebergs.F90:2603-2608)
    e1 = math.exp(0.25 * math.pi)
    drho = C.RHO_SEAWATER - cfg.rho_bergs
    sigmay = cfg.fl_strength * 1000.
    lfoot = e1 * C.RHO_SEAWATER * sigmay / (6. * cfg.rho_bergs
                                            * C.GRAVITY * drho)
    foot_area = (lfoot * T / l_w) * (3. * l_b)

    st = parent(grid, cfg, fl_k=1.5 * foot_area, T=T)
    m0 = float(st.mass[0])
    st2, d = fl.footloose_calving(st, grid, cfg, jax.random.PRNGKey(1))
    assert int(d.nbergs_calved_fl) == 1
    assert int(st2.count()) == 2
    child = int(np.nonzero(np.asarray(st2.alive))[0][1])
    # child dims: W=l_b, L=3*l_b, T=parent T
    np.testing.assert_allclose(float(st2.width[child]), l_b, rtol=1e-3)
    np.testing.assert_allclose(float(st2.length[child]), 3 * l_b, rtol=1e-3)
    assert float(st2.thickness[child]) == T
    # newborn child is non-interactive
    assert float(st2.fl_k[child]) == -1.
    # scaling = parent_scaling * k = 1
    np.testing.assert_allclose(float(st2.mass_scaling[child]), 1., rtol=1e-6)
    # parent lost mass, foot counter decremented below one more child
    assert float(st2.mass[0]) < m0
    assert float(st2.fl_k[0]) < foot_area


def test_fl_bits_binning():
    cfg, grid = world(fl_style='fl_bits')
    T = 250.
    l_b, l_w = expected_lb(cfg, T)
    e1 = math.exp(0.25 * math.pi)
    lfoot = e1 * C.RHO_SEAWATER * (cfg.fl_strength * 1000.) / (
        6. * cfg.rho_bergs * C.GRAVITY * (C.RHO_SEAWATER - cfg.rho_bergs))
    foot_area = (lfoot * T / l_w) * (3. * l_b)
    st = parent(grid, cfg, fl_k=1.2 * foot_area, T=T)
    m0 = float(st.mass[0])
    st2, d = fl.footloose_calving(st, grid, cfg, jax.random.PRNGKey(2))
    # no new berg; mass binned into mass_of_fl_bits
    assert int(st2.count()) == 1
    bits = float(st2.mass_of_fl_bits[0])
    assert bits > 0.
    # parent mass loss equals binned mass
    np.testing.assert_allclose(m0 - float(st2.mass[0]), bits, rtol=1e-3)
    # source diagnostic recorded
    assert float(jnp.sum(d.fl_bits_src)) > 0.


def test_interactivity_promotion():
    cfg, grid = world(interactive_icebergs_on=True)
    st = parent(grid, cfg)
    # add a lone child far away, fl_k=-1
    st = st.replace(
        alive=st.alive.at[5].set(True),
        lon=st.lon.at[5].set(20000.), lat=st.lat.at[5].set(20000.),
        length=st.length.at[5].set(500.), width=st.width.at[5].set(200.),
        mass=st.mass.at[5].set(1e8), fl_k=st.fl_k.at[5].set(-1.))
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    nbr = forces.build_neighbor_tables(st, grid, cfg)
    st2 = fl.adjust_fl_berg_interactivity(st, nbr, cfg)
    assert float(st2.fl_k[5]) == -2.   # far from everything -> interactive

    # now put the child right next to the parent -> stays -1
    st3 = st.replace(lon=st.lon.at[5].set(50500.),
                     lat=st.lat.at[5].set(50000.))
    i, j, xi, yj = pos_to_cell(grid, st3.lon, st3.lat, -1.0)
    st3 = st3.replace(ine=i, jne=j, xi=xi, yj=yj)
    nbr = forces.build_neighbor_tables(st3, grid, cfg)
    st4 = fl.adjust_fl_berg_interactivity(st3, nbr, cfg)
    assert float(st4.fl_k[5]) == -1.
