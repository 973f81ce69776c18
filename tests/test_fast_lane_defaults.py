"""The fast lane IS the product (VERDICT r4 #3): a default-constructed
IcebergsConfig must route make_step / make_multi_step / the driver
through the production backends — no bench-style flag mutation
anywhere.  These tests pin the ROUTING (which implementations a default
config selects), not the numerics (covered by the bitwise A/B tests).
"""

import numpy as np
import jax.numpy as jnp

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell


def test_default_config_is_the_p3tabk_set():
    cfg = ibt.IcebergsConfig()
    assert cfg.contact_mode == "auto"
    assert cfg.sort_packed_permute and cfg.pack_kernel
    assert cfg.interp_mode == "table"
    assert cfg.slot_sum_method == "pallas"
    assert cfg.extract_impl == "gathered"
    assert cfg.fused_window == 160
    # growable on evidence (driver/bench), exact-search contract
    assert cfg.fused_fallback_cap >= 1024
    # the negative-result lever stays off
    assert cfg.contact_epilogue is False


def test_resolved_contact_mode():
    cfg = ibt.IcebergsConfig(interactive_icebergs_on=True)
    assert cfg.resolved_contact_mode() == "fused3"
    # modern dispatch (contact_distance) is outside the legacy fused
    # search -> bucket tables
    assert cfg.replace(contact_distance=2000.).resolved_contact_mode() \
        == "buckets"
    assert cfg.replace(contact_mode="sorted").resolved_contact_mode() \
        == "sorted"


def test_make_multi_step_auto_routes_persistent():
    """An eligible interactive config must ride the persistent factory
    (the bench's p3tabk frame): the returned slab comes back CELL-SORTED
    — the per-step path preserves slot order instead."""
    from icebergs_tpu.model import make_multi_step
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             use_f_plane=True, lat_ref=45., dt=600.,
                             Runge_not_Verlet=False,
                             interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(12, 12, 0., 0., 2000., 2000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(12, 12, uo=0.1, sst=2., sss=33.)
    rng = np.random.RandomState(3)
    n = 64
    st = ibt.create_bergs(n, lon=rng.uniform(4e3, 20e3, n),
                          lat=rng.uniform(4e3, 20e3, n), mass=1e9,
                          thickness=40., width=150., length=150.,
                          mass_scaling=1.,
                          id_cnt=rng.permutation(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    out = make_multi_step(grid, cfg, 2)(st, frc)
    s1 = out if not isinstance(out, tuple) else out[0]
    key = np.asarray(jnp.where(s1.alive, s1.jne * 12 + s1.ine, 12 * 12))
    assert np.all(np.diff(key) >= 0), "persistent frame is cell-sorted"

    out2 = make_multi_step(grid, cfg, 2, persistent=False)(st, frc)
    s2 = out2 if not isinstance(out2, tuple) else out2[0]
    # per-step path: original slot order (ids where they started)
    np.testing.assert_array_equal(np.asarray(s2.id_cnt),
                                  np.asarray(st.id_cnt))
