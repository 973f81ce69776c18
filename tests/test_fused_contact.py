"""Fused contact path (Pallas prepass + compact XLA eval, interpret mode):
must match the XLA 3x3-window path exactly, including through the >= 3
contact fallback."""

import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.ops.sorted import sort_state_by_cell
from icebergs_tpu.ops.fused_contact import make_ia_fn_fused


def _world(n, seed, cluster=False):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30., dt=60.,
                             interactive_icebergs_on=True,
                             slot_sum_method="scatter",
                             sort_packed_permute=False,
                             pack_kernel=False, interp_mode="xla",
                             extract_impl="manual")
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(seed)
    lon = rng.uniform(4e3, 12e3, n)
    lat = rng.uniform(4e3, 12e3, n)
    if cluster:
        # pile a dense knot into one cell so several bergs have >= 3
        # engaged contacts (exercises the exact fallback)
        k = n // 4
        lon[:k] = 7.5e3 + rng.uniform(-120., 120., k)
        lat[:k] = 7.5e3 + rng.uniform(-120., 120., k)
    st = ibt.create_bergs(512, lon=lon, lat=lat,
                          uvel=rng.uniform(-.3, .3, n),
                          vvel=rng.uniform(-.3, .3, n),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    return cfg, grid, st


def _check(cfg, grid, st, **kw):
    ss, starts = sort_state_by_cell(st, grid)
    nbr = forces.build_neighbor_tables(ss, grid, cfg, max_per_cell=140)
    ia_fn_ref = forces.make_ia_fn(ss, nbr, cfg)
    ia_ref = ia_fn_ref(ss.uvel, ss.vvel)

    ia_fn, stats = make_ia_fn_fused(ss, starts, grid, cfg,
                                    interpret=True, **kw)
    ia = ia_fn(ss.uvel, ss.vvel)
    assert int(stats.overflow) == 0
    alive = np.asarray(ss.alive)
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia_ref, f))[alive],
            rtol=0, atol=1e-9, err_msg=f)
    return stats


def test_fused_matches_xla_sparse():
    cfg, grid, st = _world(400, seed=9)
    stats = _check(cfg, grid, st, block_n=64, window=512)


def test_fused_matches_xla_clustered_fallback():
    cfg, grid, st = _world(400, seed=3, cluster=True)
    stats = _check(cfg, grid, st, block_n=64, window=512,
                   fallback_strip_width=140)
    assert int(stats.n_fallback) > 0, \
        "cluster case must exercise the >=3-contact fallback"


def test_fused_window_overflow_goes_to_fallback():
    # tiny window forces every block into the exact fallback path
    cfg, grid, st = _world(300, seed=5)
    stats = _check(cfg, grid, st, block_n=64, window=128,
                   fallback_cap=512, fallback_strip_width=140)
    assert int(stats.n_fallback) > 0


def _check_v2(cfg, grid, st, **kw):
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
    nbr = forces.build_neighbor_tables(st, grid, cfg, max_per_cell=140)
    ia_fn_ref = forces.make_ia_fn(st, nbr, cfg)
    ia_ref = ia_fn_ref(st.uvel, st.vvel)

    ia_fn, stats = make_ia_fn_fused2(st, grid, cfg, interpret=True, **kw)
    ia = ia_fn(st.uvel, st.vvel)
    assert int(stats.overflow) == 0
    alive = np.asarray(st.alive)
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia_ref, f))[alive],
            rtol=0, atol=1e-9, err_msg=f)
    return stats


def test_fused2_sortless_matches_xla_sparse():
    """v2 (no state reorder): results come back in ORIGINAL slot order."""
    cfg, grid, st = _world(400, seed=9)
    _check_v2(cfg, grid, st, block_n=64, window=512)


def test_fused2_sortless_clustered_fallback():
    cfg, grid, st = _world(400, seed=3, cluster=True)
    stats = _check_v2(cfg, grid, st, block_n=64, window=512,
                      fallback_strip_width=140)
    assert int(stats.n_fallback) > 0


def test_fused2_step_runs_and_conserves():
    """make_step(neighbor_mode='fused') end-to-end (interpret mode)."""
    import jax.numpy as jnp
    import icebergs_tpu.model as model
    cfg, grid, st = _world(300, seed=7, cluster=True)
    step = model.make_step(grid, cfg, with_thermo=False,
                           neighbor_mode="fused", fused_block_n=64,
                           fused_window=512, fused_interpret=True)
    m0 = float(jnp.sum(jnp.where(st.alive, st.mass * st.mass_scaling, 0.)))
    for _ in range(5):
        st, d = step(st, None if False else ibt.uniform_forcing(
            16, 16, uo=0.1, sst=2.0))
    m1 = float(jnp.sum(jnp.where(st.alive, st.mass * st.mass_scaling, 0.)))
    np.testing.assert_allclose(m1, m0, rtol=1e-6)


def _check_v3(cfg, grid, st, **kw):
    from icebergs_tpu.ops.fused_contact import (make_ia_fn_fused2,
                                                make_ia_fn_fused3)
    nbr = forces.build_neighbor_tables(st, grid, cfg, max_per_cell=140)
    ia_ref = forces.make_ia_fn(st, nbr, cfg)(st.uvel, st.vvel)

    ia_fn, stats = make_ia_fn_fused3(st, grid, cfg, interpret=True, **kw)
    ia = ia_fn(st.uvel, st.vvel)
    assert int(stats.overflow) == 0
    alive = np.asarray(st.alive)
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia_ref, f))[alive],
            rtol=0, atol=1e-9, err_msg=f)

    # the extraction kernel must reproduce make_ia_fn_fused2 BITWISE:
    # same partner selection (min/max engaged sorted slot), exact
    # feature extraction, identical downstream math
    ia_fn2, _ = make_ia_fn_fused2(st, grid, cfg, interpret=True, **kw)
    ia2 = ia_fn2(st.uvel, st.vvel)
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia2, f))[alive], err_msg=f)
    return stats


def test_fused3_extract_matches_xla_sparse():
    cfg, grid, st = _world(400, seed=9)
    _check_v3(cfg, grid, st, block_n=64, window=512)


def test_fused3_extract_clustered_fallback():
    cfg, grid, st = _world(400, seed=3, cluster=True)
    stats = _check_v3(cfg, grid, st, block_n=64, window=512,
                      fallback_strip_width=140)
    assert int(stats.n_fallback) > 0


def test_fused3_window_overflow_goes_to_fallback():
    # tiny window forces every block into the exact fallback path
    cfg, grid, st = _world(300, seed=5)
    stats = _check_v3(cfg, grid, st, block_n=64, window=128,
                      fallback_cap=512, fallback_strip_width=140)
    assert int(stats.n_fallback) > 0


def test_fused3_dead_rows_and_empty():
    """Dead slots and an empty world must not corrupt the extraction."""
    import jax.numpy as jnp
    cfg, grid, st = _world(400, seed=9)
    # kill half the bergs incl. some engaged ones
    kill = np.zeros(512, bool)
    kill[::2] = True
    st2 = st.replace(alive=st.alive & ~jnp.asarray(kill))
    _check_v3(cfg, grid, st2, block_n=64, window=512)

    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
    st0 = st.replace(alive=jnp.zeros_like(st.alive))
    ia_fn, stats = make_ia_fn_fused3(st0, grid, cfg, block_n=64,
                                     window=512, interpret=True)
    ia = ia_fn(st0.uvel, st0.vvel)
    for f in ia._fields:
        assert not np.any(np.asarray(getattr(ia, f))), f


def test_fused3_extract_gathered_matches_default():
    """contact_extract_sorted_g (tile-gathered windows, standard block
    pipeline) must be BITWISE equal to the default manual-DMA kernel —
    same body, exact tile-granular gather feeding it."""
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
    for seed, cluster in ((9, False), (3, True)):
        cfg, grid, st = _world(400, seed=seed, cluster=cluster)
        kw = dict(block_n=64, window=512, interpret=True,
                  fallback_strip_width=140)
        ia_ref = make_ia_fn_fused3(st, grid, cfg, **kw)[0](
            st.uvel, st.vvel)
        ia_fn, stats = make_ia_fn_fused3(
            st, grid, cfg.replace(extract_impl="gathered"), **kw)
        ia = ia_fn(st.uvel, st.vvel)
        assert int(stats.overflow) == 0
        alive = np.asarray(st.alive)
        for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ia, f))[alive],
                np.asarray(getattr(ia_ref, f))[alive], err_msg=f)


def _state_by_id(st):
    """Alive rows of every per-berg leaf, ordered by id (layout-free)."""
    import numpy as np
    alive = np.asarray(st.alive)
    idc = np.asarray(st.id_cnt)[alive]
    idj = np.asarray(st.id_ij)[alive]
    order = np.lexsort((idj, idc))
    out = {}
    for f in ("lon", "lat", "uvel", "vvel", "mass", "thickness",
              "width", "length", "ine", "jne", "xi", "yj"):
        out[f] = np.asarray(getattr(st, f))[alive][order]
    return out


def test_persistent_layout_matches_per_step_fused():
    """make_persistent_multi_step == make_multi_step(fused) per berg id
    (interactions + thermo + melt death over several steps).

    Equality is bitwise EXCEPT on exact-fallback rows: the two step
    graphs surround the fallback eval with different consumers, and
    since the scatter fold (round 4) the optimization barrier pins its
    rounding only WITHIN each graph — across two different step
    implementations the fallback rows may differ by ~1 ulp.  The
    reference contract (parallel_reprod: same implementation, any
    layout, bitwise) is asserted in tests/test_parallel.py."""
    import icebergs_tpu.model as model
    cfg, grid, st = _world(300, seed=11, cluster=True)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, vo=0.05, ua=4.0,
                              sst=6.0, sss=33.0)
    kw = dict(fused_block_n=64, fused_window=512, fused_interpret=True,
              fused_fallback_strip_width=140)
    multi_ref = model.make_multi_step(grid, cfg, 4, with_stats=True,
                                      persistent=False,
                                      neighbor_mode="fused", **kw)
    multi_per = model.make_persistent_multi_step(grid, cfg, 4,
                                                 with_stats=True,
                                                 neighbor_mode="fused",
                                                 **kw)
    st_ref, ov_r, fb_r, _acc = multi_ref(st, frc)
    st_per, ov_p, fb_p, _accp = multi_per(st, frc)
    assert int(ov_r) == 0 and int(ov_p) == 0
    a, b = _state_by_id(st_ref), _state_by_id(st_per)
    for f, va in a.items():
        if va.dtype.kind == "f":
            np.testing.assert_allclose(va, b[f], rtol=5e-7, atol=1e-12,
                                       err_msg=f)
        else:
            np.testing.assert_array_equal(va, b[f], err_msg=f)


def test_persistent_fused3_pallas_matches_per_step():
    """Persistent layout with the presorted fused3 search (no sort, no
    inverse map) + pallas spreading == make_multi_step(fused3) bitwise
    per berg id; coupler accumulators agree to tolerance (the spread
    kernel's MXU association differs from the slot tree)."""
    import icebergs_tpu.model as model
    cfg, grid, st = _world(300, seed=11, cluster=True)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, vo=0.05, ua=4.0,
                              sst=6.0, sss=33.0)
    kw = dict(fused_block_n=64, fused_window=512, fused_interpret=True,
              fused_fallback_strip_width=140)
    multi_ref = model.make_multi_step(grid, cfg, 4, with_stats=True,
                                      persistent=False,
                                      neighbor_mode="fused3", **kw)
    st_ref, ov_r, fb_r, acc_r = multi_ref(st, frc)
    multi_per = model.make_persistent_multi_step(
        grid, cfg.replace(slot_sum_method="pallas"), 4,
        with_stats=True, neighbor_mode="fused3", **kw)
    st_per, ov_p, fb_p, acc_p = multi_per(st, frc)
    assert int(ov_r) == 0 and int(ov_p) == 0
    a, b = _state_by_id(st_ref), _state_by_id(st_per)
    for f, va in a.items():
        np.testing.assert_array_equal(va, b[f], err_msg=f)
    ar, ap = np.asarray(acc_r), np.asarray(acc_p)
    # acc_r sums 8 coupler fields, acc_p 5 — compare only that both
    # spread passes produced finite, same-order mass fields via the
    # state equality above; here just sanity the accumulator is live
    assert np.isfinite(ap).all() and np.abs(ap).max() > 0.


def _mts_world(seed=4):
    """Two bonded conglomerates + free elements, modern (MTS) config."""
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=30.,
        dt=600., mts=True, mts_sub_steps=10, explicit_inner_mts=True,
        interactive_icebergs_on=True, iceberg_bonds_on=True,
        contact_distance=1500., contact_spring_coef=1.e-7,
        spring_coef=1.e-5, manually_initialize_bonds=True,
        length_for_manually_initialize_bonds=700., max_bonds=6)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(seed)
    lon, lat = [], []
    for (cx, cy) in ((5000., 5000.), (7500., 6000.), (11000., 11000.)):
        for dx in (-600., 0., 600.):
            for dy in (-600., 0., 600.):
                lon.append(cx + dx + rng.uniform(-30., 30.))
                lat.append(cy + dy + rng.uniform(-30., 30.))
    st = ibt.create_bergs(64, lon=lon, lat=lat,
                          uvel=rng.uniform(-.2, .2, len(lon)),
                          vvel=rng.uniform(-.2, .2, len(lon)),
                          mass=850. * 50. * 500. * 500., thickness=50.,
                          width=500., length=500., mass_scaling=1.,
                          id_cnt=np.arange(len(lon)) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    st = forces.compute_conglom_ids_host(st)
    return cfg, grid, st


def test_fused_mts1_matches_xla_part1():
    """make_ia_fn_fused_mts1 == the XLA Part-1 cross-conglomerate group
    (interpret mode), including through the >= 3-partner fallback."""
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused_mts1
    cfg, grid, st = _mts_world()
    r = forces.neighbor_radius(grid, cfg)
    nbr = forces.build_neighbor_tables(st, grid, cfg, ncells_radius=r,
                                       max_per_cell=64)
    ia_ref = forces.make_ia_fn(st, nbr, cfg, mts_part=1)(st.uvel, st.vvel)

    refresh, stats = make_ia_fn_fused_mts1(
        st, grid, cfg, block_n=64, window=512, fallback_cap=64,
        fallback_strip_width=96, interpret=True)
    assert int(stats.overflow) == 0
    # clustered conglomerates guarantee >= 3 cross-group partners
    assert int(stats.n_fallback) > 0
    ia = refresh(st)(st.uvel, st.vvel)
    alive = np.asarray(st.alive)
    for f in ("IA_x", "IA_y", "P11", "P12", "P22", "Pu_x", "Pu_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ia, f))[alive],
            np.asarray(getattr(ia_ref, f))[alive],
            rtol=0, atol=1e-9, err_msg=f)


def test_mts_evolve_fused_part1_matches_tables():
    """evolve_icebergs_mts(neighbor_mode='fused') == the table path
    bitwise over full outer steps."""
    from icebergs_tpu.mts import evolve_icebergs_mts
    cfg, grid, st = _mts_world()
    frc = ibt.uniform_forcing(16, 16, uo=0.1, vo=0.05, sst=-1.)
    st = ibt.interp_to_bergs(st, grid, frc, cfg)

    def run(mode):
        s = st
        for _ in range(3):
            s, d = jax.jit(lambda x: evolve_icebergs_mts(
                x, grid, frc, cfg, neighbor_mode=mode,
                fused_kw=dict(block_n=64, window=512, fallback_cap=64,
                              fallback_strip_width=96, interpret=True)
                if mode == "fused" else None))(s)
        return s

    import jax
    a, b = run("tables"), run("fused")
    alive = np.asarray(st.alive)
    for f in ("lon", "lat", "uvel", "vvel", "axn", "ayn"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f))[alive],
            np.asarray(getattr(b, f))[alive], rtol=0, atol=1e-7,
            err_msg=f)


def test_fused3_footloose_minus1_excluded():
    """fl_k == -1 bergs (non-interactive footloose children,
    icebergs.F90:514, 652) interact with NOTHING through fused3 — the
    masking now lives entirely in the extraction kernel's engagement
    test (PT layout v2 dropped the fl_k2 partner rows)."""
    import jax.numpy as jnp
    cfg, grid, st = _world(60, seed=21, cluster=True)
    # mark several clustered bergs (guaranteed contacts) non-interactive
    fl = np.asarray(st.fl_k).copy()
    fl[3] = -1.0
    fl[7] = -1.0
    st = st.replace(fl_k=jnp.asarray(fl))
    stats = _check_v3(cfg, grid, st, block_n=64, window=512,
                      fallback_strip_width=140)
    # and the -1 rows themselves got zero interaction force
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
    ia_fn, _ = make_ia_fn_fused3(st, grid, cfg, interpret=True,
                                 block_n=64, window=512,
                                 fallback_strip_width=140)
    ia = ia_fn(st.uvel, st.vvel)
    for f in ("IA_x", "IA_y", "P11", "Pu_x"):
        v = np.asarray(getattr(ia, f))
        assert v[3] == 0.0 and v[7] == 0.0, f


def test_persistent_all_kernels_matches_per_step():
    """Persistent step with EVERY kernel flag on (pipelined extraction +
    pipelined pallas spreading + sorted-frame interp kernel) vs
    make_multi_step(fused3): per-berg state equal to <= 2-ulp relative
    (the interp kernel's interpret-mode body FMA-contracts on CPU; on
    TPU it is bitwise — see tests/test_pallas_interp.py)."""
    import icebergs_tpu.model as model
    cfg, grid, st = _world(300, seed=11, cluster=True)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, vo=0.05, ua=4.0,
                              sst=6.0, sss=33.0)
    kw = dict(fused_block_n=64, fused_window=512, fused_interpret=True,
              fused_fallback_strip_width=140)
    multi_ref = model.make_multi_step(grid, cfg, 4, with_stats=True,
                                      persistent=False,
                                      neighbor_mode="fused3", **kw)
    st_ref, ov_r, fb_r, acc_r = multi_ref(st, frc)
    multi_per = model.make_persistent_multi_step(
        grid, cfg.replace(slot_sum_method="pallas",
                          extract_impl="pipelined",
                          spread_impl="pipelined",
                          interp_mode="kernel"),
        4, with_stats=True, neighbor_mode="fused3", **kw)
    st_per, ov_p, fb_p, acc_p = multi_per(st, frc)
    assert int(ov_r) == 0 and int(ov_p) == 0
    a, b = _state_by_id(st_ref), _state_by_id(st_per)
    for f, va in a.items():
        if f in ("ine", "jne"):
            np.testing.assert_array_equal(va, b[f], err_msg=f)
        else:
            np.testing.assert_allclose(va, b[f], rtol=3e-6, atol=1e-9,
                                       err_msg=f)
    assert np.isfinite(np.asarray(acc_p)).all()


def test_persistent_gpack_matches_per_step():
    """The production combination (bench mode "p3gpack"/"p3pack"):
    packed-permute re-sort + GATHERED extraction/spread windows +
    sorted-frame interp kernel, vs make_multi_step(fused3).  Bitwise
    except the interp kernel's interpret-mode FMA contraction on CPU
    (<= 2-ulp; bitwise on TPU, see tests/test_pallas_interp.py)."""
    import icebergs_tpu.model as model
    cfg, grid, st = _world(300, seed=11, cluster=True)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, vo=0.05, ua=4.0,
                              sst=6.0, sss=33.0)
    kw = dict(fused_block_n=64, fused_window=512, fused_interpret=True,
              fused_fallback_strip_width=140)
    multi_ref = model.make_multi_step(grid, cfg, 4, with_stats=True,
                                      persistent=False,
                                      neighbor_mode="fused3", **kw)
    st_ref, ov_r, fb_r, acc_r = multi_ref(st, frc)
    multi_per = model.make_persistent_multi_step(
        grid, cfg.replace(sort_packed_permute=True,
                          slot_sum_method="pallas",
                          extract_impl="gathered",
                          spread_impl="gathered",
                          interp_mode="kernel", interp_gathered=True),
        4, with_stats=True, neighbor_mode="fused3", **kw)
    st_per, ov_p, fb_p, acc_p = multi_per(st, frc)
    assert int(ov_r) == 0 and int(ov_p) == 0
    a, b = _state_by_id(st_ref), _state_by_id(st_per)
    for f, va in a.items():
        if f in ("ine", "jne"):
            np.testing.assert_array_equal(va, b[f], err_msg=f)
        else:
            np.testing.assert_allclose(va, b[f], rtol=3e-6, atol=1e-9,
                                       err_msg=f)
    assert np.isfinite(np.asarray(acc_p)).all()
