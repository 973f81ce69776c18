"""Isolate argsort / packed-row-gather costs at 1M on the real device.
All inputs are scan carries (no constant folding)."""
import time
import numpy as np

INNER = 4

def scan_timeit(fn, args, reps=2):
    import jax
    @jax.jit
    def many(a):
        def body(c, _):
            return fn(*c), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out
    out = jax.block_until_ready(many(args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(many(out))
    return (time.perf_counter() - t0) / (reps * INNER)

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    N = 1_000_000
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 262144, N).astype(np.int32))
    ids = jnp.asarray(rng.permutation(N).astype(np.int32))
    P16 = jnp.asarray(rng.rand(N, 16).astype(np.float32))
    col = jnp.asarray(rng.rand(N).astype(np.float32))

    def f_argsort(k, i, P, c):
        o = jnp.argsort(k)
        return (k + o % 2).astype(jnp.int32), i, P, c

    def f_lexsort3(k, i, P, c):
        o1 = jnp.argsort(i, stable=True)
        o2 = jnp.argsort(k[o1], stable=True)
        o = o1[o2]
        return (k + o % 2).astype(jnp.int32), i, P, c

    def f_rowgather16(k, i, P, c):
        o = jnp.argsort(k)
        Ps = P[o]
        return k, i, Ps, c

    def f_colgather12(k, i, P, c):
        o = jnp.argsort(k)
        cols = [c[o] for _ in range(12)]
        s = cols[0]
        for x in cols[1:]:
            s = s + x
        return k, i, P, s

    def f_pack_then_gather(k, i, P, c):
        o = jnp.argsort(k)
        M = jnp.stack([c + f for f in range(12)], axis=-1)  # (N, 12)
        Ms = M[o]
        return k, i, P, Ms[:, 0]

    def f_inv_perm_scatter(k, i, P, c):
        o = jnp.argsort(k)
        inv = jnp.zeros_like(o).at[o].set(jnp.arange(N, dtype=o.dtype))
        back = c[inv]
        return k, i, P, back

    for name, fn in (("argsort_1M", f_argsort),
                     ("lexsort3", f_lexsort3),
                     ("rowgather_N16", f_rowgather16),
                     ("colgather_x12", f_colgather12),
                     ("pack12_then_rowgather", f_pack_then_gather),
                     ("argsort+inv+gather", f_inv_perm_scatter)):
        try:
            t = scan_timeit(fn, (key, ids, P16, col))
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

if __name__ == "__main__":
    main()
