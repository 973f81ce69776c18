"""Isolate contact_extract_sorted kernel cost on the chip.

Feeds the PT matrix through the scan carry (data-dependent each
iteration, so nothing hoists) on PRE-SORTED data: measures the kernel
alone, no sort / no inverse mapping.  Variants attribute window size,
block size, and the extraction-matmul cost.

RUN ALONE on the chip: python tools/probe_kernel.py [names...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# Per-dispatch tunnel overhead is ~0.35 s on the axon backend; at
# INNER=4 that inflated every probe by ~90 ms.  INNER=16 brings the
# floor to ~22 ms, and the unconditional "null" probe below measures
# the residual floor exactly — subtract it from every number.
INNER = 16


def scan_timeit(fn, arg, reps=2):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out

    out = many(arg)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * INNER)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces as _forces
    from icebergs_tpu.ops.sorted import sort_state_by_cell
    from icebergs_tpu.ops.pallas_prepass import (
        contact_extract_sorted, PT_NF, PT_LON, PT_LAT, PT_U, PT_V,
        PT_AREA, PT_MASS, PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    lon_old=st.lon, lat_old=st.lat)

    @jax.jit
    def prep(s):
        s, starts = sort_state_by_cell(s, grid)
        key = jnp.where(s.alive, s.jne * NX + s.ine,
                        NX * NY).astype(jnp.int32)
        A = s.length * s.width
        R = _forces._interaction_radius(cfg, A)
        alive_f = s.alive.astype(s.dtype)
        feats = [s.lon_old, s.lat_old, s.uvel_old, s.vvel_old, A,
                 s.mass, R, alive_f, key.astype(s.dtype), s.fl_k]
        slots = (PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
                 PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)
        rows = [jnp.zeros((s.capacity,), s.dtype)] * PT_NF
        for r, f in zip(slots, feats):
            rows[r] = f
        PT = jnp.stack(rows, axis=0)
        return PT, key, starts

    PT, key_s, starts = jax.block_until_ready(prep(st))
    print("device:", jax.devices()[0], flush=True)
    only = set(sys.argv[1:])

    def run(name, fn, arg, always=False):
        if only and name not in only and not always:
            return
        try:
            t = scan_timeit(fn, arg)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)

    # dispatch-floor calibration: one trivial pass over PT through the
    # same scan harness; its time is pure per-dispatch overhead / INNER
    run("null", lambda pt: pt + 1e-30, PT, always=True)

    def mk(bn, w, fn=contact_extract_sorted, **kw):
        def f(carry):
            pt = carry
            out, bad = fn(
                pt, key_s, starts, grid, cfg, block_n=bn, window=w, **kw)
            # data-dependence: fold a zero back into PT so nothing hoists
            return pt + 1e-30 * out[0:1, :]
        return f

    from icebergs_tpu.ops.pallas_prepass import (contact_extract_sorted_p,
                                                 contact_extract_sorted_g)

    run("ex_bn128_w288", mk(128, 288), PT)
    run("ex_bn128_w160", mk(128, 160), PT)
    run("ex_bn256_w416", mk(256, 416), PT)
    run("ex_bn512_w672", mk(512, 672), PT)
    run("exp_bn128_w288", mk(128, 288, contact_extract_sorted_p), PT)
    run("exp_bn128_w160", mk(128, 160, contact_extract_sorted_p), PT)
    run("exp_bn256_w416", mk(256, 416, contact_extract_sorted_p), PT)
    run("exp_bn512_w672", mk(512, 672, contact_extract_sorted_p), PT)
    run("exg_bn128_w288", mk(128, 288, contact_extract_sorted_g), PT)
    run("exg_bn256_w416", mk(256, 416, contact_extract_sorted_g), PT)
    run("exg_bn512_w672", mk(512, 672, contact_extract_sorted_g), PT)
    # larger blocks: fewer per-block DMAs, more wasted compares (window
    # = block cell span + 1 ring + 160 slop) — find the U-curve minimum
    run("exg_bn384_w544", mk(384, 544, contact_extract_sorted_g), PT)
    run("exg_bn768_w928", mk(768, 928, contact_extract_sorted_g), PT)
    run("exg_bn1024_w1184", mk(1024, 1184, contact_extract_sorted_g), PT)
    # smaller blocks: the shared window shrinks with the block's cell
    # span (slop stays 128) — fewer wasted pair tests per berg
    run("ex_bn64_w160", mk(64, 160), PT)
    run("exg_bn64_w160", mk(64, 160, contact_extract_sorted_g), PT)

    # pipelined spread kernel A/B (production 21 extra columns)
    from icebergs_tpu.ops import pallas_spread as psp
    from icebergs_tpu import swirl_forcing
    frc = swirl_forcing(NX, NY, DXY, uo=0.3, ua=5.0, sst=4.0,
                          sss=33.0)
    st_s = jax.jit(lambda s: sort_state_by_cell(s, grid)[0])(st)
    st_s = jax.block_until_ready(st_s)

    def mk_spread(seg):
        def f(carry):
            s = carry
            key, rows = psp.build_rows(
                s, grid, frc, cfg, [s.mass * (0.01 * k) for k in range(21)])
            key_i = key.astype(jnp.int32)
            rows_s = jnp.stack(rows, axis=0)
            ncells = NX * NY
            starts2 = jnp.searchsorted(
                key_i, jnp.arange(ncells + 1, dtype=key_i.dtype)
            ).astype(jnp.int32)
            tbl = psp.cell_tables(grid)
            S, bad = seg(rows_s, starts2, tbl, cfg, 21)
            return s.replace(mass=s.mass + 1e-30 * S[0, 0])
        return f

    # gathered first: the decision-critical NEW number — if the window
    # dies mid-stage the unmeasured variant should be the old one
    run("spreadg_x21", mk_spread(psp.segment_spread_sums_g), st_s)
    run("spread_x21", mk_spread(psp.segment_spread_sums), st_s)
    run("spreadp_x21", mk_spread(psp.segment_spread_sums_p), st_s)

    # sorted-frame interp kernel vs the XLA row-gather path
    from icebergs_tpu.ops import pallas_interp as pin
    from icebergs_tpu import model as _model

    def f_interp_xla(s):
        s2 = _model.interp_to_bergs(s, grid, frc, cfg)
        return s.replace(uvel=s.uvel + 1e-30 * s2.uo)

    def f_interp_kernel(s):
        s2, m25 = pin.interp_to_bergs_sorted(s, grid, frc, cfg)
        return s.replace(uvel=s.uvel + 1e-30 * (s2.uo
                                                + m25.astype(s.dtype)))

    def f_interp_gathered(s):
        s2, m25 = pin.interp_to_bergs_sorted(
            s, grid, frc, cfg.replace(interp_gathered=True))
        return s.replace(uvel=s.uvel + 1e-30 * (s2.uo
                                                + m25.astype(s.dtype)))

    run("interp_gathered", f_interp_gathered, st_s)
    run("interp_kernel", f_interp_kernel, st_s)
    run("interp_xla", f_interp_xla, st_s)


if __name__ == "__main__":
    main()
