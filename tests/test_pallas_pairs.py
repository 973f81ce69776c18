"""Pallas pair-evaluation kernel matches the reference jnp implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.ops.pallas_pairs import eval_pair_ia_pallas


def test_pallas_matches_jnp_eval():
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             interactive_icebergs_on=True, dt=60.,
                             Runge_not_Verlet=False)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(0)
    n = 40
    st = ibt.create_bergs(256, lon=rng.uniform(2000., 14000., n),
                          lat=rng.uniform(2000., 14000., n),
                          mass=850. * 100 * 400 * 400, thickness=100.,
                          width=400., length=400., mass_scaling=1.,
                          uvel=rng.randn(n) * 0.1, vvel=rng.randn(n) * 0.1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj, lon_old=st.lon,
                    lat_old=st.lat, uvel_old=st.uvel, vvel_old=st.vvel)

    nbr = forces.build_neighbor_tables(st, grid, cfg, max_per_cell=8)
    pd = forces.precompute_pair_data(st, cfg, nbr.cand_idx, nbr.cand_valid,
                                     bonded=False, use_c_crit_dist=False)
    u0, v0 = st.uvel, st.vvel
    u1 = st.uvel + 0.05
    v1 = st.vvel - 0.02

    ref = forces.eval_pair_ia(pd, cfg, u0, v0, u1, v1)
    got = eval_pair_ia_pallas(pd, cfg, u0, v0, u1, v1, interpret=True)

    for f in ("P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(ref, f)),
                                   rtol=1e-5, atol=1e-10, err_msg=f)
    # spring terms pass through unchanged
    np.testing.assert_array_equal(np.asarray(got.IA_x), np.asarray(ref.IA_x))
