"""Fused sorted-slab neighbor kernel (interpret mode): IA sums must match
the XLA 3x3-window path when the cutoff fits inside one cell."""

import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.ops.sorted import sort_state_by_cell
from icebergs_tpu.ops.pallas_neighbors import fused_pair_ia_sorted


def test_fused_kernel_matches_xla_path():
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30., dt=60.,
                             interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(9)
    n = 400
    st = ibt.create_bergs(512,
                          lon=rng.uniform(4e3, 12e3, n),
                          lat=rng.uniform(4e3, 12e3, n),
                          uvel=rng.uniform(-.3, .3, n),
                          vvel=rng.uniform(-.3, .3, n),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    ss, starts = sort_state_by_cell(st, grid)

    # XLA reference on the sorted state (same berg order as the kernel)
    nbr = forces.build_neighbor_tables(ss, grid, cfg, max_per_cell=16)
    ia_ref = forces.pair_forces(ss, cfg, nbr.cand_idx, nbr.cand_valid,
                                bonded=False, use_c_crit_dist=False,
                                u0=ss.uvel, v0=ss.vvel,
                                u1=ss.uvel, v1=ss.vvel)

    ia, overflow = fused_pair_ia_sorted(ss, starts, grid, cfg,
                                        ss.uvel, ss.vvel, ss.uvel,
                                        ss.vvel, block_n=64, window=512)
    assert int(overflow) == 0
    alive = np.asarray(ss.alive)
    assert np.abs(np.asarray(ia_ref.IA_x)[alive]).max() > 0, \
        "test needs engaged contacts"
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia_ref, f))[alive],
            rtol=0, atol=1e-10, err_msg=f)
