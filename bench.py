"""Headline benchmark: berg-steps/sec at 1M bergs with pair contacts.

The reference publishes no performance numbers (BASELINE.md); its wall
clocks are printed per run only.  The north star recorded in BASELINE.json
is >100 steps/s at 1M bergs with DEM contacts on one chip -> we report
steps/s at 1M bergs and vs_baseline = steps_per_sec / 100.

The contact search is the EXACT sortless fused path (Pallas strip-search
prepass + compact evaluation, ops/fused_contact.make_ia_fn_fused2): no
MAX_PER_CELL truncation; the JSON carries the dropped-candidate and
fallback counters so the fidelity of the measured physics is explicit
(dropped_candidates must be 0 for an exact run).

A second metric in the same JSON line is the MTS/DEM contact benchmark
(20k bonded elements x 60 substeps, the iKID/A68 regime), reported as
element-substeps/s.

Run on whatever jax.devices()[0] is (TPU under the driver).
"""

import json
import time

import numpy as np


def _sync(x):
    # slice ON DEVICE first: np.asarray on a full leaf transfers the
    # whole 4 MB array through the tunnel (~100+ ms of fake time)
    import jax
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def bench_1m_contacts():
    import jax
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.model import make_multi_step

    import os
    NBERGS = int(os.environ.get("KID_BENCH_N", 1_000_000))
    NX = NY = int(os.environ.get("KID_BENCH_NX", 512))
    DXY = 2000.0
    # amortize the tunneled runtime's ~0.35 s/dispatch (at INNER=6 that
    # artifact alone reads as ~58 ms/step on a ~500 ms step)
    INNER = int(os.environ.get("KID_BENCH_INNER", 24))

    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False,   # Verlet: one accel per step
        interactive_icebergs_on=True,        # pair contacts on
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    # divergence-free swirl, NOT a uniform current: a mean drift piles
    # the bergs against the downstream wall, so the local density (and
    # with it the exact search's fallback share) grows with every step
    # measured — the swirl keeps the density statistically steady
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

    # fused3p = fused3 extraction search + the Pallas segment-sum
    # spreading kernel (the step skips make_sort_ctx; spreading runs as
    # one payload sort + MXU one-hot reduction — 426 -> 86 ms at 1M).
    # fused3 = same search with the slot-scatter spreading for A/B;
    # KID_BENCH_CONTACT_MODE=fused selects the round-2 search.  If the
    # requested mode fails to compile/run on this backend (Mosaic
    # rejects a kernel, driver runs an older toolchain, ...) fall back
    # down the chain so the headline number is always produced.
    # (A full persistent-sorted-slab variant was measured 2.3x SLOWER:
    # physically re-sorting all ~70 state leaves costs ~1.3 s/step.)
    import os
    from icebergs_tpu.model import make_persistent_multi_step
    mode = os.environ.get("KID_BENCH_CONTACT_MODE", "p3tabk")
    BN = int(os.environ.get("KID_BENCH_BN", 128))
    W = int(os.environ.get("KID_BENCH_W", 288))
    # gathered-window extraction kernel in every fused3 mode (module
    # default since 2026-08-20: same-window floor-subtracted A/B read
    # 9.6 ms vs 25.1 ms manual at bn128_w288); KID_BENCH_GATHERED=0
    # restores the manual-DMA kernel for A/B
    force_gathered = os.environ.get("KID_BENCH_GATHERED", "1") == "1"
    chain = [mode] + [m for m in ("p3tabk", "p3tab", "p3pack", "p3gpack",
                                  "fused3p", "fused3", "fused", "sorted")
                      if m != mode]
    # persistent sorted slab variants; p3pack = persistent + the
    # packed-permute re-sort backend (key-only 4-operand sort + packed
    # u32 row gathers: compiles in ~100 s where the ~50-operand variadic
    # payload sort wedged the remote compiler for >40 min).  p3tab =
    # p3pack + the round-4 session-13..15 levers: single-gather TABLE
    # interp, fallback cap 1024 (+ the bench's grow-on-dropped retry),
    # window 160, scatter fold.  p3tabk = p3tab + the Pallas
    # block-transpose pack/unpack around the permute gather
    # (427 -> 194 ms/step at 1M across the round's same-window A/Bs)
    PERSISTENT = ("p3", "p3g", "p3k", "p3pack", "p3gpack", "p3tab",
                  "p3tabk")
    multi = out = None
    # The tunneled axon client has NO RPC timeout: a tunnel blip during
    # a long remote compile wedges the call forever (observed on every
    # >40-min persistent3 compile).  Run each mode's warmup in an
    # abandonable thread: on timeout the thread is left to the wedged
    # RPC (daemon, GIL released) and the chain falls back to the next
    # mode, so this bench always terminates.
    import threading as _th
    compile_timeout = float(os.environ.get("KID_BENCH_COMPILE_TIMEOUT",
                                           2700.0))

    def _run_abandonable(fn, timeout):
        """fn() in a daemon thread; raises TimeoutError if not done in
        time (the thread is abandoned — daemon, so exit never joins)."""
        box = {}

        def worker():
            try:
                box["v"] = fn()
            except BaseException as e:   # surfaced to the caller
                box["e"] = e

        t = _th.Thread(target=worker, daemon=True)
        t.start()
        t.join(timeout)
        if t.is_alive():
            raise TimeoutError(f"warmup exceeded {timeout:.0f}s "
                               "(wedged remote compile?)")
        if "e" in box:
            raise box["e"]
        return box["v"]

    def mode_cfg(m, fb, W_m):
        """Fast-lane config for a bench mode (the flags used to be
        module globals; they are IcebergsConfig fields now)."""
        return cfg.replace(
            slot_sum_method=("pallas" if m in ("fused3p",) + PERSISTENT
                             else "scatter"),
            sort_packed_permute=m in ("p3pack", "p3gpack", "p3tab",
                                      "p3tabk"),
            pack_kernel=(m == "p3tabk"),
            interp_mode=("table" if m in ("p3tab", "p3tabk")
                         else "kernel" if m in ("p3k", "p3g", "p3gpack")
                         else "xla"),
            interp_gathered=m in ("p3g", "p3gpack"),
            extract_impl=("pipelined" if m == "p3k"
                          else "gathered"
                          if (m in ("p3g", "p3gpack") or force_gathered)
                          else "manual"),
            spread_impl=("pipelined" if m == "p3k"
                         else "gathered" if m in ("p3g", "p3gpack")
                         else "manual"),
            fused_window=W_m, fused_fallback_cap=fb)

    for m in chain:
        # p3tab(k): 2048 — the swirl's steady-state fallback population
        # at 1M is ~1.2k (session-1 grew a 1024 cap mid-measure, paying
        # a recompile; 2048 holds with headroom at ~+2 ms)
        fb = (16384 if m in ("fused", "sorted")
              else 2048 if m in ("p3tab", "p3tabk") else 4096)
        W_m = 160 if m in ("p3tab", "p3tabk") else W
        try:
            mcfg = mode_cfg(m, fb, W_m)
            factory = make_persistent_multi_step if m in PERSISTENT \
                else make_multi_step
            kw = ({"neighbor_mode": "fused3"}
                  if m in ("fused3p",) + PERSISTENT
                  else {"neighbor_mode": m, "persistent": False})
            multi = factory(
                grid, mcfg, INNER, with_stats=True, with_thermo=True,
                fused_block_n=BN, fused_window=W_m,
                contact_cap=131072, fused_fallback_cap=fb, **kw)
            out = _run_abandonable(lambda mu=multi: mu(st, frc),
                                   compile_timeout)   # warmup/compile
            _sync(out)
            # auto-size the fallback cap (mirrors mts.auto_pair_cap's
            # grow-on-evidence design): a density spike that overruns
            # the static cap must grow it and re-measure, not silently
            # report dropped>0 (the headline claims an exact search)
            for _ in range(3):
                if int(np.asarray(out[1])) == 0:
                    break
                fb = min(4 * fb, NBERGS)
                print(f"bench: contact fallback cap overran "
                      f"(dropped={int(np.asarray(out[1]))}); growing "
                      f"to {fb} and recompiling", file=__import__(
                          'sys').stderr)
                mcfg = mode_cfg(m, fb, W_m)
                multi = factory(
                    grid, mcfg, INNER, with_stats=True, with_thermo=True,
                    fused_block_n=BN, fused_window=W_m,
                    contact_cap=131072, fused_fallback_cap=fb, **kw)
                out = _run_abandonable(lambda mu=multi: mu(st, frc),
                                       compile_timeout)
                _sync(out)
            break
        except Exception as e:     # pragma: no cover - hardware-dependent
            import sys
            print(f"bench: contact mode {m!r} failed ({e}); "
                  "falling back", file=sys.stderr)
            multi = out = None
    if multi is None:
        raise RuntimeError("no contact mode compiled")
    _sync(out[3])                  # coupler-field accumulator: the
    # spreading/diagnostic subgraph is a jit OUTPUT, not dead code

    # Dispatch-floor calibration: the tunneled dev runtime costs
    # 0.3-3.5 s per dispatch+readback cycle (it drifts by 10x between
    # windows) — pure client/tunnel artifact, zero device time.  Time
    # an identity scan with the identical call/sync pattern and
    # subtract; report both so the raw number stays auditable.  On a
    # local (non-tunneled) runtime the floor measures ~0 and this is a
    # no-op.
    st0 = out[0]

    @jax.jit
    def null_multi(s):
        def body(c, _):
            return c.replace(uvel=c.uvel + 1e-30), None
        o, _ = jax.lax.scan(body, s, None, length=INNER)
        return o

    nout = null_multi(st0)
    _sync(nout)

    # median-of-N-windows protocol (VERDICT r4 #6): the floor drifts
    # 1.3 -> 311 ms/iteration between tunnel windows, so a single
    # (raw, floor) pair can move the headline by tens of percent.
    # Measure raw+floor in N_WINDOWS passes separated by WINDOW_GAP_S
    # and take the median of the floor-subtracted step times; every
    # per-window pair is reported in the JSON.
    N_WINDOWS = int(os.environ.get("KID_BENCH_WINDOWS", 3))
    GAP = float(os.environ.get("KID_BENCH_WINDOW_GAP", 45.0))
    reps = 2
    for _grow in range(3):
        windows = []
        for w in range(N_WINDOWS):
            if w:
                time.sleep(GAP)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = multi(out[0], frc)
                _sync(out)
            raw = (time.perf_counter() - t0) / (reps * INNER)
            t0 = time.perf_counter()
            for _ in range(reps):
                nout = null_multi(nout)
                _sync(nout)
            floor = (time.perf_counter() - t0) / (reps * INNER)
            # sanity clamp: never credit more than 80% of raw to floor
            windows.append((raw, floor, max(raw - floor, 0.2 * raw)))
        dropped = int(np.asarray(out[1]))
        if dropped == 0:
            break
        # exactness contract: the swirl's density wanders over the
        # longer 3-window run, so a cap that survived warmup can still
        # overrun mid-measurement — grow on evidence and REMEASURE
        # (the round-5 session-1 run read dropped=201 at fb=1024)
        fb = min(4 * fb, NBERGS)
        print(f"bench: fallback cap overran during measurement "
              f"(dropped={dropped}); growing to {fb} and re-measuring",
              file=__import__('sys').stderr)
        multi = factory(
            grid, mode_cfg(m, fb, W_m), INNER, with_stats=True,
            with_thermo=True, fused_block_n=BN, fused_window=W_m,
            contact_cap=131072, fused_fallback_cap=fb, **kw)
        out = _run_abandonable(lambda mu=multi: mu(st, frc),
                               compile_timeout)
        _sync(out)
    fallback = int(np.asarray(out[2]))
    devs = sorted(wn[2] for wn in windows)
    dt_dev = devs[len(devs) // 2] if len(devs) % 2 else \
        0.5 * (devs[len(devs) // 2 - 1] + devs[len(devs) // 2])
    dt_wall, floor = windows[0][0], windows[0][1]
    active_bytes, model_bytes = roofline_model(st, cfg)
    return (1.0 / dt_dev, NBERGS, dropped, fallback, m,
            dt_wall, floor, active_bytes, model_bytes, windows)


def bench_dem_mts():
    """MTS+DEM bonded-contact benchmark (the iKID/A68 regime): hex-packed
    conglomerates, 20k elements x 60 explicit DEM substeps per outer step
    (tools/bench_mts.py)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import bench_mts
    return bench_mts.main(20000, 60)


def bench_dem_1m():
    """The north star's ACTUAL configuration: 1M bergs WITH DEM bonds —
    999,944 bonded elements in 2066 conglomerates, full MTS steps with
    the fused Part-1 search (tools/bench_dem_1m.py).  Returns the bench's
    JSON dict (value/elements/substeps/s_per_outer_step)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    import bench_dem_1m
    return bench_dem_1m.main(60)


def roofline_model(st, cfg):
    """Bytes-per-step model + HBM peak for the utilization report.

    ``active_bytes``: every state leaf that is NOT row-uniform under this
    config (ops/sorted.uniform_state_fields — uniform leaves never move).
    The model charges MODEL_PASSES full sweeps of that working set per
    step: one read + one write for the physics update, and one read +
    one write for the (cell, id) re-sort that maintains the persistent
    layout.  Contact-search windows, interp corner tables and the spread
    segment sums all ride subsets of those sweeps (transposed feature
    stacks / grid tiles), so they are second-order against the 4-sweep
    charge.  This is deliberately a LOWER bound on useful traffic: the
    utilization it yields is what an ideal 2-sweep-physics + 1-re-sort
    implementation would need, making hbm_util_pct honest to compare
    across rounds.
    """
    import dataclasses
    import numpy as np
    from icebergs_tpu.ops.sorted import uniform_state_fields
    uniform = set(uniform_state_fields(cfg))
    active = 0
    for f in dataclasses.fields(st):
        leaf = getattr(st, f.name)
        if not hasattr(leaf, "shape") or f.name in uniform:
            continue
        active += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    MODEL_PASSES = 4
    return active, MODEL_PASSES * active


# v5e (TPU v5 lite) HBM peak; the axon device string reports "TPU v5
# lite".  Source: public v5e spec sheet (819 GB/s, 16 GB HBM2).
HBM_PEAK_BYTES_PER_S = 819e9

# Achievable-floor model for the 1M persistent step (PERF.md
# "Achievable floor" — derivation and measured unit costs).  Counts the
# IRREDUCIBLE expensive ops of this algorithm on this chip: packed row
# gathers (re-sort transport, interp table), the key sort, the
# extraction + spread kernels, the fallback fold scatters, and the
# elementwise physics sweeps.  This is the honest target the headline
# is judged against (the 100 M berg-steps/s north star implies a
# 10 ms step — below the cost of its own four packed gathers/kernels,
# i.e. unreachable for this algorithm class on one v5e).
FLOOR_MODEL_OPS_MS = {
    "resort_key_sort": 2.2,        # 4-operand lax.sort, 1M keys
    "resort_packed_gather": 6.8,   # ONE (N,128)-lane u32 row gather
    "resort_pack_unpack": 2.6,     # 2 streaming passes of 0.5 GB
    "interp_packed_gather": 6.8,   # ONE (N,<=128) table row gather
    "interp_env_math": 3.0,        # ~60 (N,) elementwise rows
    "extract_kernel": 9.6,         # measured exg bn128 (floor-subtr.)
    "fallback_build_eval": 3.0,    # cap-1024 strips + eval
    "fallback_fold_scatters": 4.0, # 8 cap-row scatters
    "pd_evals": 4.0,               # (2,N) elementwise, 2 evals
    "spread_kernel": 20.0,         # measured pallas segment-sum
    "thermo": 2.2,                 # measured leave-one-out
    "verlet_walk": 4.0,            # elementwise sweeps, gather-free
    "starts_glue": 3.0,            # searchsorted / scatter-min
}
FLOOR_MODEL_MS = sum(FLOOR_MODEL_OPS_MS.values())   # ~71 ms


def main():
    import os
    import jax
    # persistent compile cache: the scanned 1M-berg program takes several
    # minutes to compile on the tunneled dev TPU; cache it next to the repo
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    (steps_per_sec, nbergs, dropped, fallback, mode,
     raw_step_s, floor_s, active_bytes, model_bytes,
     windows) = bench_1m_contacts()
    skip_dem = os.environ.get("KID_BENCH_ONLY") == "headline"
    # DEM benches in abandonable daemon threads: a wedged remote compile
    # there must never cost the headline JSON line
    import threading

    def _abandonable(fn, timeout):
        box = {}

        def w():
            try:
                box["v"] = fn()
            except BaseException as e:
                box["e"] = e
        t = threading.Thread(target=w, daemon=True)
        t.start()
        t.join(timeout)
        if t.is_alive() or "e" in box:
            return -1.0
        return box["v"]

    dem_timeout = float(os.environ.get("KID_BENCH_DEM_TIMEOUT", 2700.0))
    dem1m = None if skip_dem else _abandonable(bench_dem_1m, dem_timeout)
    dem_esps = -1.0 if skip_dem else _abandonable(bench_dem_mts,
                                                  dem_timeout)
    if dem1m == -1.0:
        dem1m = None
    berg_steps = steps_per_sec * nbergs
    dt_dev = 1.0 / steps_per_sec
    # the north star (BASELINE.json) is ">100 steps/s at 1M bergs WITH
    # DEM contacts" — both regimes are reported against it explicitly:
    # vs_baseline       = the pair-contact (non-DEM) 1M headline,
    # dem_1m_vs_baseline = the bonded-DEM 1M outer-step rate.
    rec = {
        "metric": "berg_steps_per_sec_1M_contacts",
        "value": round(berg_steps, 1),
        "unit": "berg-steps/s/chip",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
        "contact_mode": mode,
        "dropped_candidates": dropped,
        "fallback_bergs": fallback,
        "exact_contact_search": dropped == 0,
        "raw_ms_per_step": round(raw_step_s * 1e3, 1),
        "dispatch_floor_ms": round(floor_s * 1e3, 1),
        # roofline accounting (VERDICT r3 #2): ideal bytes/step for a
        # 2-sweep-physics + 1-re-sort step over the active working set,
        # vs this run's device time at the v5e HBM peak
        # per-window (raw, floor, floor-subtracted) ms/step triples;
        # the headline is the MEDIAN of the subtracted column
        "windows": [[round(a * 1e3, 1), round(b * 1e3, 1),
                     round(c * 1e3, 1)] for a, b, c in windows],
        "active_state_bytes": active_bytes,
        "bytes_per_step_model": model_bytes,
        # bytes/step MODEL (ideal 4-sweep step) vs this run's device
        # time at the v5e HBM spec peak — a cross-round ratchet, NOT a
        # measured utilization (VERDICT r4 weak #4)
        "model_util_pct": round(
            100.0 * model_bytes / (dt_dev * HBM_PEAK_BYTES_PER_S), 2),
        # achievable-floor model (VERDICT r4 #4): irreducible op count
        # for this algorithm x measured v5e unit costs (see PERF.md
        # "Achievable floor"); vs_floor = floor_model / dt is how close
        # the run is to the model's limit
        "floor_model_ms": round(FLOOR_MODEL_MS, 1),
        "vs_floor_model": round(FLOOR_MODEL_MS / (dt_dev * 1e3), 3),
        "dem_element_substeps_per_sec": round(dem_esps, 1),
    }
    if dem1m:
        outer_sps = 1.0 / dem1m["s_per_outer_step"]
        rec.update({
            "dem_1m_element_substeps_per_sec": round(dem1m["value"], 1),
            "dem_1m_outer_steps_per_sec": round(outer_sps, 3),
            "dem_1m_vs_baseline": round(outer_sps / 100.0, 5),
        })
    else:
        rec["dem_1m_element_substeps_per_sec"] = -1.0
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
