"""Compare the persistent-sorted-layout multi-step against the round-2
sortless fused path at 1M bergs on the live chip.

Usage: python tools/bench_persistent.py [persistent|fused2|both]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.model import make_multi_step, make_persistent_multi_step

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    BN = int(os.environ.get("KID_P3_BN", 128))
    W = int(os.environ.get("KID_P3_W", 288))
    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    # 24: the tunnel's dispatch+readback cycle drifts 0.3-3.5 s between
    # windows; the null calibration in run() subtracts the residue
    INNER = int(os.environ.get("KID_P3_INNER", 24))

    # base = the SLOW set (scatter slots, variadic payload sort, XLA
    # interp); each mode block opts into its fast-lane fields explicitly
    # via cfg.replace (the flags used to be module globals)
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False,
        interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True,
        slot_sum_method="scatter", sort_packed_permute=False,
        pack_kernel=False, interp_mode="xla", extract_impl="gathered",
        spread_impl="manual")
    c_pal = cfg.replace(slot_sum_method="pallas")
    c_pack = c_pal.replace(sort_packed_permute=True)

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    # steady swirl (see bench.py): uniform drift piles bergs on the wall
    frc = ibt.swirl_forcing(NX, NY, DXY, uo=0.3, ua=5.0, sst=4.0,
                            sss=33.0)

    rng = np.random.RandomState(0)
    lon = rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS)
    lat = rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS)
    st = ibt.create_bergs(NBERGS, lon=lon, lat=lat,
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    print("device:", jax.devices()[0], flush=True)

    def _floor():
        """Identity-scan dispatch floor with the same call/sync shape."""
        import jax
        import jax.numpy as jnp

        @jax.jit
        def null_multi(s):
            def body(c, _):
                return c.replace(uvel=c.uvel + 1e-30), None
            o, _ = jax.lax.scan(body, s, None, length=INNER)
            return o

        o = null_multi(st)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(2):
            o = null_multi(o)
            _sync(o)
        return (time.perf_counter() - t0) / (2 * INNER)

    def run(name, multi):
        t0 = time.perf_counter()
        out = multi(st, frc)
        _sync(out)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = multi(out[0], frc)
            _sync(out)
        dt = (time.perf_counter() - t0) / (reps * INNER)
        fl = _floor()
        dev = max(dt - fl, 0.2 * dt)
        print(f"{name}: {dt*1e3:.1f} ms/step raw, floor {fl*1e3:.1f} "
              f"-> {dev*1e3:.1f} ms/step = "
              f"{NBERGS/dev/1e6:.2f} M berg-steps/s  "
              f"dropped={int(np.asarray(out[1]))} "
              f"fallback={int(np.asarray(out[2]))}", flush=True)

    if which in ("fused2", "both"):
        run("fused2_per_step", make_multi_step(
            grid, cfg, INNER, with_stats=True, with_thermo=True,
            persistent=False,
            neighbor_mode="fused", fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=16384))
    if which in ("persistent", "both"):
        run("persistent", make_persistent_multi_step(
            grid, cfg, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused",
            fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=16384))
    if which in ("fused3p", "p3", "both3"):
        # the headline config: per-step fused3 search + pallas spreading
        run("fused3p_per_step", make_multi_step(
            grid, c_pal, INNER, with_stats=True, with_thermo=True,
            persistent=False,
            neighbor_mode="fused3", fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=4096))
    if which in ("persistent3", "p3", "both3"):
        # persistent sorted slab: one variadic re-sort per step serves the
        # fused3 presorted search (no payload sort, no inv gathers) AND
        # the presorted pallas spread kernel
        run("persistent3", make_persistent_multi_step(
            grid, c_pal, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=4096))
    if which in ("persistent3pack", "p3pack"):
        # persistent3 with the packed-permute re-sort backend: key-only
        # lax.sort (4 operands) + <=2 packed u32 row gathers instead of
        # the ~50-operand variadic payload sort — both a runtime A/B and
        # a compile-time probe (the giant payload-sort program is the
        # prime suspect in persistent3's >40-min remote compiles)
        run("persistent3pack", make_persistent_multi_step(
            grid, c_pack, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=4096))
    if which in ("persistent3k", "p3k"):
        # + every round-3 session-6 kernel: pipelined extraction,
        # pipelined spreading, sorted-frame interp kernel
        run("persistent3k", make_persistent_multi_step(
            grid, c_pal.replace(extract_impl="pipelined",
                                spread_impl="pipelined",
                                interp_mode="kernel"),
            INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN, fused_window=W,
            contact_cap=131072, fused_fallback_cap=4096))
    if which in ("persistent3gpack", "p3gpack"):
        # packed-permute re-sort + ALL gathered-window kernels: the
        # expected production combination if the session-10 kernel A/Bs
        # confirm the gathered variants (extraction already defaulted)
        run("persistent3gpack", make_persistent_multi_step(
            grid, c_pack.replace(extract_impl="gathered",
                                 spread_impl="gathered",
                                 interp_mode="kernel",
                                 interp_gathered=True),
            INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W, contact_cap=131072,
            fused_fallback_cap=4096))
    if which in ("p3tab", "p3tabk", "p3pack_gfold"):
        # p3tab: the round-4 candidate production mode — persistent
        # packed-permute re-sort + single-gather TABLE interp +
        # fallback cap 1024 + window 160 + scatter fold.
        # p3pack_gfold: baseline p3pack with the old rank-table gather
        # fold (A/B for the scatter fold, which is now the default).
        c2 = c_pack
        if which in ("p3tab", "p3tabk"):
            c2 = c_pack.replace(interp_mode="table",
                                pack_kernel=which == "p3tabk")
            kw = dict(fused_window=int(os.environ.get("KID_P3TAB_W",
                                                      160)),
                      fused_fallback_cap=int(os.environ.get(
                          "KID_P3TAB_FB", 1024)))
        else:
            kw = dict(fused_window=W, fused_fallback_cap=4096,
                      fused_fallback_mode="gather_fold")
        run(which, make_persistent_multi_step(
            grid, c2, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            contact_cap=131072, **kw))
    if which in ("p3pack_fboff", "p3pack_fbbuild"):
        # fallback decomposition (MEASUREMENT ONLY, physics dropped for
        # >=3-partner rows): off = no build/eval/fold (XLA DCEs the
        # whole group); build = build+eval live, fold gathers skipped
        run(which, make_persistent_multi_step(
            grid, c_pack, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W, contact_cap=131072,
            fused_fallback_cap=4096,
            fused_fallback_mode=("off" if which == "p3pack_fboff"
                                 else "build_only")))
    if which == "sortparts":
        # decompose the 74.6 ms re-sort (session-13 sortprobe): the
        # 4-operand key sort alone, and the packed-permute transport
        # alone (pack + one (N,128)-lane u32 row gather + unpack) with
        # a fixed permutation
        import jax.numpy as jnp
        import dataclasses
        from icebergs_tpu.ops.sorted import (uniform_state_fields,
                                             stack_cols)
        uni = set(uniform_state_fields(cfg)) | {"id_cnt", "id_ij",
                                                "alive"}
        ncells = NX * NY
        perm = jnp.asarray(np.random.RandomState(1).permutation(
            st.capacity).astype(np.int32))

        @jax.jit
        def keys_only(s):
            def body(c, _):
                s = c
                e = jnp.sum(s.uvel[:8]) * 1e-38
                key = jnp.where(s.alive, s.jne * NX + s.ine, ncells) \
                    + (e * 0.).astype(jnp.int32)
                idx = jnp.arange(s.capacity, dtype=jnp.int32)
                out = jax.lax.sort((key, s.id_cnt, s.id_ij, idx),
                                   num_keys=3)
                s = s.replace(uvel=s.uvel
                              + 1e-38 * out[3][:1].astype(s.dtype))
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=INNER)
            return s, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

        @jax.jit
        def perm_only(s):
            names = [f.name for f in dataclasses.fields(s)
                     if hasattr(getattr(s, f.name), "ndim")
                     and f.name not in uni]

            def body(c, _):
                s = c
                e = jnp.sum(s.uvel[:8]) * 1e-38
                s = s.replace(uvel=s.uvel + e)
                lanes = []
                cols = []
                for nm in names:
                    leaf = getattr(s, nm)
                    sub = ([(None, leaf)] if leaf.ndim == 1 else
                           [(b, leaf[:, b])
                            for b in range(leaf.shape[1])])
                    for b, col in sub:
                        if col.dtype == jnp.bool_:
                            lanes.append(col.astype(jnp.uint32))
                        else:
                            lanes.append(jax.lax.bitcast_convert_type(
                                col, jnp.uint32))
                        cols.append((nm, b, col.dtype))
                P = stack_cols(lanes)
                S = jnp.take(P, perm, axis=0)
                new = {}
                packs = {}
                for k, (nm, b, dt) in enumerate(cols):
                    col = S[:, k]
                    col = (col > 0) if dt == jnp.bool_ else \
                        jax.lax.bitcast_convert_type(col, dt)
                    if b is None:
                        new[nm] = col
                    else:
                        packs.setdefault(nm, {})[b] = col
                for nm, cm in packs.items():
                    new[nm] = stack_cols([cm[b] for b in range(len(cm))])
                return s.replace(**new), None
            s, _ = jax.lax.scan(body, s, None, length=INNER)
            return s, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

        @jax.jit
        def gather_only(s):
            # the pure (N, 128-lane) u32 row gather, packed ONCE
            # outside the loop: transport - gather = pack/unpack cost
            cols128 = []
            for nm in ("lon", "lat", "uvel", "vvel"):
                cols128 += [jax.lax.bitcast_convert_type(
                    getattr(s, nm), jnp.uint32)] * 32
            P0 = stack_cols(cols128[:128])

            def body(c, _):
                P = c
                P = jnp.take(P, perm, axis=0)
                return P, None
            P, _ = jax.lax.scan(body, P0, None, length=INNER)
            s = s.replace(uvel=s.uvel
                          + 1e-38 * jax.lax.bitcast_convert_type(
                              P[:1, 0], jnp.float32))
            return s, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

        class _W:
            def __init__(self, f):
                self.f = f

            def __call__(self, s, frc):
                return self.f(s if not isinstance(s, tuple) else s[0])
        @jax.jit
        def perm_pad128(s):
            # full transport, but the pack pads the COLUMN LIST to 128
            # with zero columns before the transpose: probes whether
            # XLA's (128, N) -> (N, 128) full-width transpose avoids
            # the pathological 49->128 padded relayout (the pure gather
            # is 6.8 ms; pack/unpack was ~45 of the 51.7 ms transport)
            names = [f.name for f in dataclasses.fields(s)
                     if hasattr(getattr(s, f.name), "ndim")
                     and f.name not in uni]

            def body(c, _):
                s = c
                e = jnp.sum(s.uvel[:8]) * 1e-38
                s = s.replace(uvel=s.uvel + e)
                lanes = []
                cols = []
                for nm in names:
                    leaf = getattr(s, nm)
                    sub = ([(None, leaf)] if leaf.ndim == 1 else
                           [(b, leaf[:, b])
                            for b in range(leaf.shape[1])])
                    for b, col in sub:
                        if col.dtype == jnp.bool_:
                            lanes.append(col.astype(jnp.uint32))
                        else:
                            lanes.append(jax.lax.bitcast_convert_type(
                                col, jnp.uint32))
                        cols.append((nm, b, col.dtype))
                z = jnp.zeros_like(lanes[0])
                lanes128 = lanes + [z] * (128 - len(lanes))
                Nn = lanes[0].shape[0]
                P = jnp.concatenate(lanes128, axis=0).reshape(128, Nn).T
                S = jnp.take(P, perm, axis=0)
                new = {}
                packs = {}
                for k, (nm, b, dt) in enumerate(cols):
                    col = S[:, k]
                    col = (col > 0) if dt == jnp.bool_ else \
                        jax.lax.bitcast_convert_type(col, dt)
                    if b is None:
                        new[nm] = col
                    else:
                        packs.setdefault(nm, {})[b] = col
                for nm, cm in packs.items():
                    new[nm] = stack_cols([cm[b] for b in range(len(cm))])
                return s.replace(**new), None
            s, _ = jax.lax.scan(body, s, None, length=INNER)
            return s, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)

        run("sort_keys_only", _W(keys_only))
        run("sort_perm_only", _W(perm_only))
        run("sort_gather_only", _W(gather_only))
        run("sort_perm_pad128", _W(perm_pad128))
    if which in ("p3pack_it", "p3pack_fb1024", "p3pack_itfb",
                 "p3pack_itfbw"):
        # candidate production combinations from the session-13 budget:
        #   it     - single-gather TABLE interp (replaces the ~72 ms
        #            XLA interp with one packed row gather)
        #   fb1024 - fallback cap 4096 -> 1024 (the always-built exact
        #            fallback group measured ~100 ms at cap 4096 vs
        #            488 rows actually needing it; bench.py grows the
        #            cap on dropped>0 so smaller defaults stay exact)
        #   itfb   - both; itfbw - both + window 160
        fb = 4096 if which == "p3pack_it" else 1024
        W2 = 160 if which == "p3pack_itfbw" else W
        c2 = c_pack if which == "p3pack_fb1024" \
            else c_pack.replace(interp_mode="table")
        run(which, make_persistent_multi_step(
            grid, c2, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W2, contact_cap=131072,
            fused_fallback_cap=fb))
    if which in ("p3pack_fb8", "p3pack_1eval", "p3pack_w160"):
        # contact-chain drill-down (all same-window vs p3pack):
        #   fb8   - fallback machinery shrunk 512x (cap 4096 -> 8):
        #           isolates the always-built exact-fallback group cost
        #   1eval - use_new_predictive_corrective=False: one pair eval
        #           instead of the predictor+corrector pair
        #   w160  - extraction kernel window 288 -> 160
        kw = dict(fused_fallback_cap=4096)
        cfg2 = c_pack
        W2 = W
        if which == "p3pack_fb8":
            kw = dict(fused_fallback_cap=8)
        elif which == "p3pack_1eval":
            cfg2 = c_pack.replace(use_new_predictive_corrective=False)
        elif which == "p3pack_w160":
            W2 = 160
        run(which, make_persistent_multi_step(
            grid, cfg2, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W2, contact_cap=131072, **kw))
    if which == "p3pack_ik":
        # p3pack + the sorted-frame interp KERNEL alone (manual-DMA
        # variant, no gathered windows anywhere): isolates the interp
        # lever from the gathered-kernel regression seen in p3gpack
        run("p3pack_ik", make_persistent_multi_step(
            grid, c_pack.replace(interp_mode="kernel"),
            INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W, contact_cap=131072,
            fused_fallback_cap=4096))
    if which.startswith("p3tabk_no"):
        # leave-one-out budget in the PRODUCTION (p3tabk) frame:
        # table interp + pack kernels + window 160 + fb 2048
        c_tabk = c_pack.replace(interp_mode="table", pack_kernel=True)
        loo = dict(p3tabk_noia=dict(with_ia=False),
                   p3tabk_nothermo=dict(with_thermo=False),
                   p3tabk_nospread=dict(with_spread=False),
                   p3tabk_nointerp=dict(with_interp=False))
        run(which, make_persistent_multi_step(
            grid, c_tabk, INNER, with_stats=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=160, contact_cap=131072,
            fused_fallback_cap=2048, **loo[which]))
    if which == "p3tabke":
        # p3tabk + the in-kernel pair epilogue (contact_epilogue):
        # geometry/spring/projections computed in the extraction
        # kernel, PairData assembled without the XLA pd chain
        c2 = c_pack.replace(interp_mode="table", pack_kernel=True,
                            contact_epilogue=True)
        run(which, make_persistent_multi_step(
            grid, c2, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=160, contact_cap=131072,
            fused_fallback_cap=2048))
    if which == "p3tabk_full":
        c_tabk = c_pack.replace(interp_mode="table", pack_kernel=True)
        run(which, make_persistent_multi_step(
            grid, c_tabk, INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=160, contact_cap=131072,
            fused_fallback_cap=2048))
    if which.startswith("p3pack_no") or which == "sortprobe":
        # leave-one-out phase budget in the FULL-step frame: the
        # standalone per-phase profiler (tools/profile_persistent.py)
        # wedges the remote compiler, but whole-step programs of this
        # exact shape compile in 100-280 s — so each phase's cost is
        # (full p3pack) - (p3pack without it), all same-window
        loo = dict(p3pack_noia=dict(with_ia=False),
                   p3pack_nothermo=dict(with_thermo=False),
                   p3pack_nospread=dict(with_spread=False),
                   p3pack_nointerp=dict(with_interp=False))
        if True:
            if which == "sortprobe":
                c_probe = c_pack.replace(
                    starts_via_scatter=os.environ.get(
                        "KID_STARTS_SCATTER", "0") == "1")
                # standalone scanned re-sort (the only phase a
                # leave-one-out can't isolate: skipping it would
                # degrade the layout and so the downstream workload)
                import jax.numpy as jnp
                from icebergs_tpu.ops.sorted import (
                    sort_state_by_cell, uniform_state_fields)
                uni = uniform_state_fields(cfg)

                @jax.jit
                def multi_sort(s):
                    def body(c, _):
                        s, cs = c
                        # data-dependent perturbation so nothing hoists
                        e = jnp.sum(s.uvel[:8]) * 1e-38
                        s = s.replace(lon=s.lon + e,
                                      uvel=s.uvel + e)
                        return sort_state_by_cell(
                            s, grid, static_fields=uni,
                            packed_permute=True,
                            pack_kernel=os.environ.get(
                                "KID_SORT_PACKK", "1") == "1",
                            starts_via_scatter=c_probe.
                            starts_via_scatter), None
                    (s, cs), _ = jax.lax.scan(
                        body, sort_state_by_cell(
                            s, grid, static_fields=uni,
                            packed_permute=True,
                            pack_kernel=os.environ.get(
                                "KID_SORT_PACKK", "1") == "1",
                            starts_via_scatter=c_probe.
                            starts_via_scatter), None,
                        length=INNER)
                    return s, jnp.zeros((), jnp.int32), \
                        jnp.zeros((), jnp.int32)

                class _W:  # adapt to run()'s multi(st, frc) protocol
                    def __call__(self, s, frc):
                        out = multi_sort(s if not isinstance(s, tuple)
                                         else s[0])
                        return out
                run("sortprobe", _W())
            else:
                run(which, make_persistent_multi_step(
                    grid, c_pack, INNER, with_stats=True,
                    neighbor_mode="fused3", fused_block_n=BN,
                    fused_window=W, contact_cap=131072,
                    fused_fallback_cap=4096, **loo[which]))
    if which in ("persistent3g", "p3g"):
        # + the session-7 GATHERED kernels: tile-granular up-front
        # window gathers + standard block pipeline in all three kernels
        run("persistent3g", make_persistent_multi_step(
            grid, c_pal.replace(extract_impl="gathered",
                                spread_impl="gathered",
                                interp_mode="kernel",
                                interp_gathered=True),
            INNER, with_stats=True, with_thermo=True,
            neighbor_mode="fused3", fused_block_n=BN,
            fused_window=W, contact_cap=131072,
            fused_fallback_cap=4096))


if __name__ == "__main__":
    main()
