"""Exact-restart equivalence: save -> reload -> continue must reproduce
the uninterrupted run bit-for-bit (the property implied by the reference's
chksum logging at restart read & write, icebergs.F90:144, 8145)."""

import jax
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu import diag
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import restart as rio


def test_exact_restart_equivalence(tmp_path):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             lat_ref=30., dt=600., Runge_not_Verlet=False,
                             use_new_predictive_corrective=True,
                             interactive_icebergs_on=True, spring_coef=1e-5)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(16, 16, uo=0.2, ua=4., sst=3., sss=33.)
    rng = np.random.RandomState(9)
    n = 6
    st = ibt.create_bergs(32, lon=rng.uniform(3000., 13000., n),
                          lat=rng.uniform(3000., 13000., n),
                          mass=850. * 50 * 200 * 200, thickness=50.,
                          width=200., length=200., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    step = ibt.make_step(grid, cfg, with_thermo=True)

    # uninterrupted: 10 steps
    s_ref = st
    for _ in range(10):
        s_ref, _ = step(s_ref, frc)
    cs_ref, n_ref = jax.jit(diag.berg_chksum)(s_ref)

    # interrupted: 5 steps, save, reload, 5 more
    s = st
    for _ in range(5):
        s, _ = step(s, frc)
    path = str(tmp_path / "icebergs.res.nc")
    rio.write_restart_bergs(path, s, cfg)
    s2 = rio.read_restart_bergs(path, 32, grid, cfg)
    for _ in range(5):
        s2, _ = step(s2, frc)
    cs2, n2 = jax.jit(diag.berg_chksum)(s2)

    assert int(n_ref) == int(n2)
    assert int(cs_ref) == int(cs2), (int(cs_ref), int(cs2))
