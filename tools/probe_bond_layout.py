"""(N, B)-vs-per-column bond-kernel layout experiment at 1M. RUN ALONE.

Hypothesis: the DEM bond kernels' (N, B=6) tables and (N, B, 12) packed
partner gathers carry a 128-lane padding tax; per-COLUMN (N,) field
gathers + math should be ~10x cheaper.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

INNER = 4


def scan_timeit(fn, arg, reps=2):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out

    out = many(arg)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / (reps * INNER)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.ops import dem as DEM
    import bench_dem_1m as B

    cfg = B.config(60)
    grid, frc, st, n = B.build(cfg)
    st = ibt.interp_to_bergs(st, grid, frc, cfg)
    print("device:", jax.devices()[0], flush=True)
    only = set(sys.argv[1:])

    def run(name, fn, arg=st):
        if only and name not in only:
            return
        try:
            t = scan_timeit(fn, arg)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)

    def f_bond_current(s):
        out = DEM.dem_bond_forces(s, cfg, 10.0)
        return s.replace(uvel=s.uvel + 1e-12 * (out.F_x + out.T
                                                + out.Fd_x))

    # normal-spring-only per-column variant: the representative access
    # pattern (per-field (N,) gathers, sequential b accumulation)
    HEX = 1. / (2. * np.sqrt(3.))

    def f_spring_cols(s):
        k = cfg.dem_spring_coef
        R0 = 0.5 * np.sqrt(cfg.constant_length * cfg.constant_width)
        F_x = jnp.zeros_like(s.uvel)
        F_y = jnp.zeros_like(s.uvel)
        for b in range(s.bond_idx.shape[1]):
            o = jnp.maximum(s.bond_idx[:, b], 0)
            valid = (s.bond_idx[:, b] >= 0) & s.alive & s.alive[o] \
                & (s.bond_broken[:, b] != 1)
            rx = s.lon_old - s.lon_old[o]
            ry = s.lat_old - s.lat_old[o]
            length = jnp.sqrt(rx * rx + ry * ry)
            lsafe = jnp.where(length > 0., length, 1.)
            hd = 0.5 * (2. * R0 - length)
            T2 = s.thickness[o]
            Thick = jnp.minimum(s.thickness, T2)
            L = 2. * R0 * jnp.ones_like(length)
            Fn = k * Thick * 2. * hd * L / (2. * R0)
            w = jnp.where(valid, 1., 0.)
            F_x = F_x + w * Fn * rx / lsafe
            F_y = F_y + w * Fn * ry / lsafe
        return s.replace(uvel=s.uvel + 1e-12 * (F_x + F_y))

    # same math in (N, B) orientation for an apples-to-apples layout A/B
    def f_spring_nb(s):
        k = cfg.dem_spring_coef
        R0 = 0.5 * np.sqrt(cfg.constant_length * cfg.constant_width)
        o = jnp.maximum(s.bond_idx, 0)
        valid = (s.bond_idx >= 0) & s.alive[:, None] & s.alive[o] \
            & (s.bond_broken != 1)
        rx = s.lon_old[:, None] - s.lon_old[o]
        ry = s.lat_old[:, None] - s.lat_old[o]
        length = jnp.sqrt(rx * rx + ry * ry)
        lsafe = jnp.where(length > 0., length, 1.)
        hd = 0.5 * (2. * R0 - length)
        Thick = jnp.minimum(s.thickness[:, None], s.thickness[o])
        Fn = k * Thick * 2. * hd / 1.
        w = jnp.where(valid, 1., 0.)
        F_x = jnp.sum(w * Fn * rx / lsafe, -1)
        F_y = jnp.sum(w * Fn * ry / lsafe, -1)
        return s.replace(uvel=s.uvel + 1e-12 * (F_x + F_y))

    run("bond_full_current", f_bond_current)
    run("spring_cols", f_spring_cols)
    run("spring_nb", f_spring_nb)


if __name__ == "__main__":
    main()
