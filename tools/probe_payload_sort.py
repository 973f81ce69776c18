"""Measure variadic lax.sort cost vs payload count at 1M rows.

Decides the persistent-layout sort implementation: one lax.sort carrying
every state leaf as a payload vs order + per-leaf gathers
(permute_tree_rows, measured ~10 ms/leaf embedded at 1M).
"""

import time
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 1_000_000
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 512 * 512, N).astype(np.int32))
    k2 = jnp.asarray(rng.randint(0, 1 << 30, N).astype(np.int32))
    k3 = jnp.asarray(rng.randint(0, 1 << 30, N).astype(np.int32))
    f32 = jnp.asarray(rng.rand(N).astype(np.float32))

    def probe(npay, reps=4):
        pays = tuple(f32 + k for k in range(npay))

        @jax.jit
        def srt(key, k2, k3, pays):
            out = jax.lax.sort((key, k2, k3) + pays, num_keys=3)
            # consume every payload so none is DCE'd
            acc = out[0].astype(jnp.float32)
            for p in out[3:]:
                acc = acc + p
            return acc

        o = srt(key, k2, k3, pays)
        _ = np.asarray(o[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = srt(key, k2, k3, pays)
            _ = np.asarray(o[:1])
        return (time.perf_counter() - t0) / reps

    def probe_gathers(nleaf, reps=4):
        leaves = tuple(f32 + k for k in range(nleaf))

        @jax.jit
        def g(key, k2, k3, leaves):
            idx = jnp.arange(N, dtype=jnp.int32)
            out = jax.lax.sort((key, k2, k3, idx), num_keys=3)
            order = out[3]
            acc = out[0].astype(jnp.float32)
            for p in leaves:
                acc = acc + p[order]
            return acc

        o = g(key, k2, k3, leaves)
        _ = np.asarray(o[:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = g(key, k2, k3, leaves)
            _ = np.asarray(o[:1])
        return (time.perf_counter() - t0) / reps

    for n in (1, 10, 26, 44, 57):
        print(f"sort 3keys + {n} payloads: {probe(n)*1e3:.1f} ms",
              flush=True)
    for n in (10, 57):
        print(f"sort + {n} leaf gathers:  {probe_gathers(n)*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
