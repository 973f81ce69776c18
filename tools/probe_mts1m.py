"""Attribute the 1M bonded-DEM MTS outer-step cost. RUN ALONE."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

INNER = 2


def scan_timeit(fn, arg, reps=2, inner=INNER):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=inner)
        return out

    out = many(arg)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / (reps * inner)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu import mts as M
    from icebergs_tpu.ops import dem as DEM
    from icebergs_tpu.ops import forces as FO
    import bench_dem_1m as B

    cfg = B.config(60)
    grid, frc, st, n = B.build(cfg)
    st = ibt.interp_to_bergs(st, grid, frc, cfg)
    print("device:", jax.devices()[0], flush=True)
    only = set(sys.argv[1:])

    def run(name, fn, arg=st, inner=INNER):
        if only and name not in only:
            return
        try:
            t = scan_timeit(fn, arg, inner=inner)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)

    def f_bond_forces(s):
        out = DEM.dem_bond_forces(s, cfg, 10.0)
        return s.replace(uvel=s.uvel + 1e-12 * (out.F_x + out.T))

    def f_contact_broken(s):
        bo = jnp.maximum(s.bond_idx, 0)
        bm = (s.bond_idx >= 0) & (s.bond_broken == 1) \
            & s.alive[:, None] & s.alive[bo]
        c = DEM.dem_contact_forces(s, cfg, bo, bm)
        return s.replace(uvel=s.uvel + 1e-12 * c[0])

    def f_substep_forces(s):
        axn, ayn, aa, bu = M._substep_forces(s, None, cfg, 10.0)
        return s.replace(uvel=s.uvel + 1e-12 * (axn + aa))

    def f_part1_fused(s):
        from icebergs_tpu.ops.fused_contact import make_ia_fn_fused_mts1
        refresh, stats = make_ia_fn_fused_mts1(s, grid, cfg)
        out = M._slow_accel_mts(s, cfg, refresh(s))
        return s.replace(uvel=s.uvel + 1e-12 * out[0])

    def f_mts_full(s):
        s2, d = M.evolve_icebergs_mts(s, grid, frc, cfg,
                                      neighbor_mode="fused")
        return s2

    run("bond_forces_1x", f_bond_forces)
    run("contact_broken_1x", f_contact_broken)
    run("substep_forces_1x", f_substep_forces)
    run("part1_fused_once", f_part1_fused)
    run("mts_full_outer", f_mts_full, inner=1)


if __name__ == "__main__":
    main()
