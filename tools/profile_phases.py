"""Scan-batched phase breakdown at 1M bergs on the real device.

Each phase runs inside one jitted lax.scan of INNER iterations with the
state chained through, so per-dispatch overhead (~0.3 s on the tunneled
dev TPU) and caching cannot skew the numbers; reported time is per
iteration.

CRITICAL (discovered round 3): probes that do not write a field back to
the scan carry leave it LOOP-INVARIANT, and XLA hoists everything that
depends only on invariant fields out of the while loop — a probe like
``s.replace(uvel=...)`` measures the contact-search setup (sort,
prepass, pair geometry: all functions of lon_old/ine/jne) exactly ONCE
across all INNER iterations.  In the real step every such field changes
each iteration.  ``_inject`` adds a data-dependent zero to every field a
setup might read, so nothing can be hoisted and probe numbers match the
production step's per-iteration cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# ~22 ms dispatch floor at INNER=16 (was ~90 at 4); the "null" probe
# in main() measures the exact floor to subtract from every number
INNER = 16

_DEP_F32 = ("lon", "lat", "lon_old", "lat_old", "uvel", "vvel",
            "uvel_old", "vvel_old", "length", "width")
_DEP_I32 = ("ine", "jne")


def _inject(s):
    import jax.numpy as jnp
    e = jnp.sum(s.uvel[:8]) * 1e-38          # data-dependent ~0 scalar
    di = (e * 0.).astype(jnp.int32)          # data-dependent int 0
    reps = {f: getattr(s, f) + e for f in _DEP_F32 if hasattr(s, f)}
    reps.update({f: getattr(s, f) + di for f in _DEP_I32 if hasattr(s, f)})
    return s.replace(**reps)


def scan_timeit(fn, arg, reps=2):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(_inject(c)), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out

    import numpy as _np
    out = many(arg)   # compile
    _ = _np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]   # real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = _np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * INNER)


def main():
    import os
    import jax
    # persistent compile cache (same dir as bench.py): repeat sweeps of
    # the same probe skip the multi-minute tunneled TPU compile
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model, dynamics
    from icebergs_tpu.ops import thermo as _thermo
    from icebergs_tpu.ops import spread as _spread
    from icebergs_tpu.ops import forces as _forces
    from icebergs_tpu.ops.sorted import sort_state_by_cell

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.swirl_forcing(NX, NY, DXY, uo=0.3, ua=5.0, sst=4.0,
                              sss=33.0)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    print("device:", jax.devices()[0], flush=True)

    def f_interp(s):
        s2 = model.interp_to_bergs(s, grid, frc, cfg)
        return s.replace(lon=s.lon + 1e-12 * s2.uo, uo=s2.uo, vo=s2.vo)

    def f_evolve(s):
        out = dynamics.evolve_icebergs(s, grid, frc, cfg)
        return out.state

    def f_evolve_ia(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg,
                                         block_n=256, window=512,
                                         contact_cap=131072,
                                         fallback_cap=16384)
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state

    def f_walk(s):
        lon2, lat2, i2, j2, xi2, yj2, b = dynamics.adjust_index_and_ground(
            grid, cfg, s.lon, s.lat, s.ine, s.jne)
        return s.replace(lon=s.lon + 1e-12 * xi2)

    def f_walk_dense(s):
        # force the pre-compaction dense walk for A/B
        orig = dynamics.WALK_COMPACT_MIN_N
        dynamics.WALK_COMPACT_MIN_N = 1 << 60
        try:
            lon2, lat2, i2, j2, xi2, yj2, b = \
                dynamics.adjust_index_and_ground(grid, cfg, s.lon, s.lat,
                                                 s.ine, s.jne)
        finally:
            dynamics.WALK_COMPACT_MIN_N = orig
        return s.replace(lon=s.lon + 1e-12 * xi2)

    def f_sort(s):
        ss, starts = sort_state_by_cell(s, grid)
        return ss

    def f_thermo(s):
        s2, d = _thermo.thermodynamics(s, grid, frc, cfg)
        return s2

    def f_spread(s):
        sp = _spread.create_gridded_icebergs_fields(s, grid, frc, cfg)
        return s.replace(lon=s.lon + 1e-12 * sp.spread_mass[0, 0])

    def f_ia_quadrant(s):
        nbr = _forces.build_neighbor_tables(s, grid, cfg, ncells_radius=1,
                                            max_per_cell=6,
                                            window="quadrant")
        ia_fn = _forces.make_ia_fn(s, nbr, cfg, contact_cap=131072)
        ia = ia_fn(s.uvel, s.vvel)
        return s.replace(uvel=s.uvel + 1e-12 * ia.IA_x,
                         vvel=s.vvel + 1e-12 * ia.IA_y)

    import dataclasses as _dc
    cfg_noreprod = _dc.replace(cfg, parallel_reprod=False)

    def f_sort_plain(s):
        ss, starts = sort_state_by_cell(s, grid, id_tiebreak=False)
        return ss

    def f_prepass(s):
        from icebergs_tpu.ops.pallas_prepass import contact_prepass_sorted
        ss, starts = sort_state_by_cell(s, grid)
        cnt, pmin, pmax, bad = contact_prepass_sorted(ss, starts, grid, cfg,
                                                      block_n=256,
                                                      window=512)
        return ss.replace(uvel=ss.uvel + 1e-12 * cnt.astype(ss.dtype))

    def f_ia_fused(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg,
                                         block_n=256, window=512,
                                         contact_cap=131072,
                                         fallback_cap=16384)
        ia = ia_fn(s.uvel, s.vvel)
        return s.replace(uvel=s.uvel + 1e-12 * ia.IA_x,
                         vvel=s.vvel + 1e-12 * ia.IA_y)

    def f_ia_fused_2evals(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg,
                                         block_n=256, window=512,
                                         contact_cap=131072,
                                         fallback_cap=16384)
        ia = ia_fn(s.uvel, s.vvel)
        ia2 = ia_fn(s.uvel + 1e-12 * ia.IA_x, s.vvel)
        return s.replace(uvel=s.uvel + 1e-12 * ia2.IA_x,
                         vvel=s.vvel + 1e-12 * ia2.IA_y)

    def _use_all(s, ia):
        acc = 0.
        for f in ia:
            acc = acc + f
        return s.replace(uvel=s.uvel + 1e-12 * acc)

    def f_ia_fused_full(s):
        # ALL 8 IA outputs consumed (defeats DCE of the projection sums)
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg, block_n=256,
                                         window=512, contact_cap=131072,
                                         fallback_cap=16384)
        return _use_all(s, ia_fn(s.uvel, s.vvel))

    def f_ia_fused_full_2evals(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg, block_n=256,
                                         window=512, contact_cap=131072,
                                         fallback_cap=16384)
        ia = ia_fn(s.uvel, s.vvel)
        s = _use_all(s, ia)
        return _use_all(s, ia_fn(s.uvel, s.vvel))

    def f_evolve_ia_1eval(s):
        # trace-time cache: accel's itloop-2 re-eval returns eval 1's
        # traced value -> the graph contains ONE pair eval (attribution
        # probe only; the reference recomputes at itloop 2)
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg, block_n=256,
                                         window=512, contact_cap=131072,
                                         fallback_cap=16384)
        store = {}

        def once(u, v):
            if "ia" not in store:
                store["ia"] = ia_fn(u, v)
            return store["ia"]
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=once)
        return out.state

    def f_evolve_ia_zero2(s):
        # eval 1 real, eval 2 zero: isolates the serialized second eval
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
        from icebergs_tpu.ops.accel import zero_ia
        ia_fn, stats = make_ia_fn_fused2(s, grid, cfg, block_n=256,
                                         window=512, contact_cap=131072,
                                         fallback_cap=16384)
        calls = {"n": 0}

        def first_only(u, v):
            calls["n"] += 1
            if calls["n"] == 1:
                return ia_fn(u, v)
            return zero_ia(s.lon.shape, s.dtype)
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=first_only)
        return out.state

    def f_evolve_ia3(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
        ia_fn, stats = make_ia_fn_fused3(s, grid, cfg, block_n=256,
                                         window=512, fallback_cap=4096)
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state

    def f_ia3_full_2evals(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
        ia_fn, stats = make_ia_fn_fused3(s, grid, cfg, block_n=256,
                                         window=512, fallback_cap=4096)
        ia = ia_fn(s.uvel, s.vvel)
        s = _use_all(s, ia)
        return _use_all(s, ia_fn(s.uvel, s.vvel))

    def _extract_parts(s, upto):
        """fused3 attribution: the extraction chain cut at ``upto``:
        'kernel' = sort + feature stack + Pallas extract, results
        consumed in the SORTED frame (no inverse mapping);
        'invmap' = + the ~19 origin-frame inverse-permutation gathers;
        'pd'     = + precompute_pair_data_T (geometry, no eval)."""
        from icebergs_tpu.ops.pallas_prepass import (
            contact_extract_sorted, EX_CNT, EX_F1, EX_F2, PT_NF,
            PT_NEVAL, PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
            PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)
        N = s.capacity
        key = jnp.where(s.alive, s.jne * NX + s.ine, ncells)
        idx = jnp.arange(N, dtype=jnp.int32)
        A = s.length * s.width
        R = _forces._interaction_radius(cfg, A)
        alive_f = s.alive.astype(s.dtype)
        feats = [s.lon_old, s.lat_old, s.uvel_old, s.vvel_old, A,
                 s.mass, R, alive_f, key.astype(s.dtype), s.fl_k]
        slots = (PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
                 PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)
        _, _, _, order = jax.lax.sort(
            (key, s.id_cnt, s.id_ij, idx), num_keys=3)
        feats_s = [f[order] for f in feats]
        _, inv = jax.lax.sort((order, idx), num_keys=1)
        key_s = key[order]
        starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(
            jnp.int32)
        prows = [jnp.zeros((N,), s.dtype)] * PT_NF
        for r, f in zip(slots, feats_s):
            prows[r] = f
        PT = jnp.stack(prows, axis=0)
        out, bad_block = contact_extract_sorted(
            PT, key_s, starts, grid, cfg, block_n=128, window=288)
        if upto == "kernel":
            acc = out[EX_CNT] + out[EX_F1] + out[EX_F2]
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        rows = [out[EX_F1 + k][inv] for k in range(PT_NEVAL)] \
            + [out[EX_F2 + k][inv] for k in range(PT_NEVAL)]
        cnt_o = out[EX_CNT].astype(jnp.int32)[inv]
        if upto == "invmap":
            acc = cnt_o.astype(s.dtype)
            for r in rows:
                acc = acc + r
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        # same mask as production (_origin_frame_groups_extract):
        # bad blocks and dead slots excluded
        cnt_sv = out[EX_CNT].astype(jnp.int32)
        normal_s = (cnt_sv > 0) & ~bad_block & (cnt_sv <= 2) \
            & (key_s < ncells)
        normal_o = normal_s[inv]
        m_n = jnp.stack([normal_o, normal_o & (cnt_o >= 2)], axis=0)
        names = ("lon2", "lat2", "u2", "v2", "A2g", "M2g")
        pf = {nm: jnp.stack([rows[k], rows[PT_NEVAL + k]], axis=0)
              for k, nm in enumerate(names)}
        pd = _forces.precompute_pair_data_T(
            s, cfg, None, m_n, bonded=False, use_c_crit_dist=False,
            partner_fields=pf)
        acc = pd.IA_x + pd.IA_y + jnp.sum(pd.P11 + pd.P12 + pd.P22, 0)
        return s.replace(uvel=s.uvel + 1e-30 * acc)

    def _evolve_ia3_cfg(bn, w):
        def f(s):
            from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
            ia_fn, stats = make_ia_fn_fused3(s, grid, cfg, block_n=bn,
                                             window=w, fallback_cap=4096)
            out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=ia_fn)
            return out.state
        return f

    def f_ia3_kernel_only(s):
        return _extract_parts(s, "kernel")

    def f_ia3_invmap(s):
        return _extract_parts(s, "invmap")

    def f_ia3_pd(s):
        return _extract_parts(s, "pd")

    def f_evolve_ia3_sortpay(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
        ia_fn, stats = make_ia_fn_fused3(s, grid, cfg, block_n=256,
                                         window=512, fallback_cap=4096,
                                         pt_via_sort_payloads=True)
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state

    def _full_step(mode, fb, spread_method="scatter"):
        def f(s):
            step = model.make_step(
                grid, cfg.replace(slot_sum_method=spread_method),
                with_thermo=True, neighbor_mode=mode,
                fused_block_n=128, fused_window=288,
                contact_cap=131072, fused_fallback_cap=fb)
            s2, d = step(s, frc)
            # keep the coupler fields alive (a state-only consumer lets
            # XLA dead-code the whole spreading/diagnostic subgraph)
            acc = (d.spread_mass + d.spread_area + d.ustar_iceberg
                   + d.mass_on_ocean + d.floating_melt + d.calving_hflx)
            return s2.replace(lon=s2.lon + 1e-30 * acc[0, 0])
        return f

    f_step_fused = _full_step("fused", 16384)
    f_step_fused3 = _full_step("fused3", 4096)
    f_step_fused3_pallas = _full_step("fused3", 4096, "pallas")

    def _spread_method(m):
        def f(s):
            sp = _spread.create_gridded_icebergs_fields(
                s, grid, frc, cfg.replace(slot_sum_method=m))
            return s.replace(lon=s.lon + 1e-12 * sp.spread_mass[0, 0])
        return f

    f_spread_gather = _spread_method("gather")
    f_spread_scatter_t = _spread_method("scatter_t")
    f_spread_gather_raw = _spread_method("gather_raw")
    f_spread_gather_mm = _spread_method("gather_mm")
    f_spread_pallas = _spread_method("pallas")

    def f_spread_pallas_x21(s):
        # kernel path with 21 extra pass-through columns (the deferred
        # melt load of the production step)
        extras = [s.mass * (0.01 * k) for k in range(14)]
        sp, ef = _spread.create_gridded_icebergs_fields(
            s, grid, frc, cfg.replace(slot_sum_method="pallas"),
            extra_cell_cols=extras)
        acc = sp.spread_mass[0, 0]
        for f in ef:
            acc = acc + f[0, 0]
        return s.replace(lon=s.lon + 1e-12 * acc)

    def f_spread_noreprod(s):
        sp = _spread.create_gridded_icebergs_fields(s, grid, frc,
                                                    cfg_noreprod)
        return s.replace(lon=s.lon + 1e-12 * sp.spread_mass[0, 0])

    # --- finer fused-path attribution (round 3) ------------------------
    ncells = NX * NY

    def f_lexsort(s):
        from icebergs_tpu.ops.sorted import lex_cell_id_order
        key = jnp.where(s.alive, s.jne * NX + s.ine, ncells)
        order = lex_cell_id_order(key, s.id_cnt, s.id_ij)
        return s.replace(uvel=s.uvel + 1e-12 * order[:1].astype(s.dtype))

    def f_lexsort_pack_starts(s):
        # full fused2 setup minus the kernel: order + (N,14) gather + starts
        from icebergs_tpu.ops.sorted import lex_cell_id_order
        key = jnp.where(s.alive, s.jne * NX + s.ine, ncells)
        order = lex_cell_id_order(key, s.id_cnt, s.id_ij)
        key_s = key[order]
        starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(
            jnp.int32)
        A = s.length * s.width
        R = _forces._interaction_radius(cfg, A)
        alive_f = s.alive.astype(s.dtype)
        M = jnp.stack([s.lon_old, s.lat_old, R, s.fl_k, alive_f,
                       key.astype(s.dtype), s.uvel_old, s.vvel_old,
                       s.thickness, s.length, s.width, s.mass,
                       jnp.zeros_like(alive_f), jnp.zeros_like(alive_f)],
                      axis=-1)
        Ms = M[order]
        return s.replace(uvel=s.uvel + 1e-12 * (Ms[0, 0] + starts[0]))

    def _ia_cfg(bn, w):
        def f(s):
            from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
            ia_fn, stats = make_ia_fn_fused2(s, grid, cfg, block_n=bn,
                                             window=w, contact_cap=131072,
                                             fallback_cap=16384)
            ia = ia_fn(s.uvel, s.vvel)
            return s.replace(uvel=s.uvel + 1e-12 * ia.IA_x,
                             vvel=s.vvel + 1e-12 * ia.IA_y)
        return f

    def f_evolve_zeroia(s):
        # isolates the interactive accel plumbing from the ia compute:
        # all IA code paths active, ia values free
        from icebergs_tpu.ops.accel import zero_ia
        out = dynamics.evolve_icebergs(
            s, grid, frc, cfg,
            ia_fn=lambda u, v: zero_ia(s.lon.shape, s.dtype))
        return out.state

    def f_spread_scatter(s):
        from icebergs_tpu.ops import spread as _sp
        sp = _sp.create_gridded_icebergs_fields(
            s, grid, frc, cfg.replace(slot_sum_method="scatter"))
        return s.replace(lon=s.lon + 1e-12 * sp.spread_mass[0, 0])

    def f_scatter9_only(s):
        # the 9-slot deterministic scatter alone (spread minus weights)
        w, I_frac = _spread.spread_weights(s, grid, cfg)
        vals = [s.mass * s.mass_scaling, s.length * s.width]
        out = _spread.scatter9_slots(grid, s, w, I_frac, vals, s.alive)
        lead = jax.tree.leaves(out)[0]
        return s.replace(lon=s.lon + 1e-12 * lead.ravel()[0])

    def f_spread_weights_only(s):
        w, I_frac = _spread.spread_weights(s, grid, cfg)
        return s.replace(lon=s.lon + 1e-12 * w[0, 0])

    def f_thermo_noreprod(s):
        s2, d = _thermo.thermodynamics(s, grid, frc, cfg_noreprod)
        return s2

    st_i = jax.block_until_ready(jax.jit(
        lambda s: model.interp_to_bergs(s, grid, frc, cfg))(st))

    import sys
    only = sys.argv[1:] if len(sys.argv) > 1 else None

    def time_persistent(spread_method):
        # make_persistent_multi_step is its own jitted scan: time it
        # like bench.py (the INNER-step program includes ONE entry sort
        # of an already-sorted slab, ~15 ms/INNER overhead)
        multi = model.make_persistent_multi_step(
            grid, cfg.replace(slot_sum_method=spread_method), INNER,
            with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=128,
            fused_window=288, contact_cap=131072,
            fused_fallback_cap=4096)
        out = multi(st, frc)
        _ = np.asarray(out[3]).ravel()[:1]
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = multi(out[0], frc)
            _ = np.asarray(out[3]).ravel()[:1]
        return (time.perf_counter() - t0) / (reps * INNER)

    for pname, meth in (("step_fused3p", "scatter"),
                        ("step_fused3p_pallas", "pallas")):
        if only and pname not in only:
            continue
        try:
            t = time_persistent(meth)
            print(f"{pname}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{pname}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    for name, fn, arg in (
            # dispatch-floor calibration: pure tunnel overhead / INNER,
            # runs unconditionally (probe selection never filters it)
            ("null", lambda s: s.replace(uvel=s.uvel + 1e-30), st),
            ("lexsort", f_lexsort, st),
            ("lexsort_pack_starts", f_lexsort_pack_starts, st_i),
            ("ia_fused_total", f_ia_fused, st_i),
            ("ia_fused_bn128_w288", _ia_cfg(128, 288), st_i),
            ("ia_fused_bn128_w160", _ia_cfg(128, 160), st_i),
            ("ia_fused_2evals", f_ia_fused_2evals, st_i),
            ("ia_fused_full", f_ia_fused_full, st_i),
            ("ia_fused_full_2evals", f_ia_fused_full_2evals, st_i),
            ("evolve_with_fused_ia", f_evolve_ia, st_i),
            ("evolve_with_ia3", f_evolve_ia3, st_i),
            ("evolve_with_ia3_sortpay", f_evolve_ia3_sortpay, st_i),
            ("ia3_full_2evals", f_ia3_full_2evals, st_i),
            ("ia3_kernel_only", f_ia3_kernel_only, st_i),
            ("ia3_invmap", f_ia3_invmap, st_i),
            ("ia3_pd", f_ia3_pd, st_i),
            ("evolve_ia3_bn128_w160", _evolve_ia3_cfg(128, 160), st_i),
            ("evolve_ia3_bn128_w288", _evolve_ia3_cfg(128, 288), st_i),
            ("evolve_ia3_bn256_w512", _evolve_ia3_cfg(256, 512), st_i),
            ("spread_gather", f_spread_gather, st_i),
            ("spread_scatter_t", f_spread_scatter_t, st_i),
            ("spread_gather_raw", f_spread_gather_raw, st_i),
            ("spread_gather_mm", f_spread_gather_mm, st_i),
            ("spread_pallas", f_spread_pallas, st_i),
            ("spread_pallas_x21", f_spread_pallas_x21, st_i),
            ("step_fused", f_step_fused, st_i),
            ("step_fused3", f_step_fused3, st_i),
            ("step_fused3_pallas", f_step_fused3_pallas, st_i),
            ("evolve_ia_1eval", f_evolve_ia_1eval, st_i),
            ("evolve_ia_zero2", f_evolve_ia_zero2, st_i),
            ("evolve_noia", f_evolve, st_i),
            ("interp", f_interp, st),
            ("index_walk", f_walk, st_i),
            ("index_walk_dense", f_walk_dense, st_i),
            ("thermo_reprod", f_thermo, st_i),
            ("thermo_plain", f_thermo_noreprod, st_i),
            ("spread_reprod", f_spread, st_i),
            ("spread_reprod_scatter", f_spread_scatter, st_i),
            ("evolve_zeroia", f_evolve_zeroia, st_i),
            ("spread_plain", f_spread_noreprod, st_i),
            ("spread_weights_only", f_spread_weights_only, st_i),
            ("scatter9_only", f_scatter9_only, st_i),
            ("sort_by_cell_id", f_sort, st),
    ):
        if only and name not in only and name != "null":
            continue
        try:
            t = scan_timeit(fn, arg)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
