"""Isolate argsort / packed-row-gather costs at 1M on the real device.
Every op feeds the next scan iteration's key so nothing hoists."""
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
    _ = np.asarray(jax.tree.leaves(out)[0][:1])   # real sync (host read)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0][:1])
    return (time.perf_counter() - t0) / (reps * INNER)

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    N = 1_000_000
    NC = 262144
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, NC, N).astype(np.int32))
    P16 = jnp.asarray(rng.rand(N, 16).astype(np.float32))
    col = jnp.asarray(rng.rand(N).astype(np.float32))

    def nxt(o):
        # data-dependent new key with the same distribution
        return (o % NC).astype(jnp.int32)

    def f_argsort(k, P, c):
        o = jnp.argsort(k)
        return nxt(o), P, c

    def f_lexsort3(k, P, c):
        o1 = jnp.argsort((k * 7) % N, stable=True)
        o2 = jnp.argsort(k[o1], stable=True)
        o = o1[o2]
        return nxt(o), P, c

    def f_rowgather16(k, P, c):
        o = jnp.argsort(k)
        Ps = P[o]
        return nxt(o), Ps, c

    def f_colgather12(k, P, c):
        o = jnp.argsort(k)
        s = c[o]
        for f in range(11):
            s = s + (c + np.float32(f))[o]
        return nxt(o), P, s

    def f_pack12_rowgather(k, P, c):
        o = jnp.argsort(k)
        M = jnp.stack([c + np.float32(f) for f in range(12)], axis=-1)
        Ms = M[o]
        return nxt(o), P, Ms[:, 0]

    def f_gather_only(k, P, c):
        o = ((k.astype(jnp.int64) * 2654435761) % N).astype(jnp.int32) \
            if False else (k * 3 + 17) % N
        Ps = P[o]
        return nxt(o), Ps, c

    for name, fn in (("argsort_1M", f_argsort),
                     ("lexsort3", f_lexsort3),
                     ("rowgather_N16_only", f_gather_only),
                     ("argsort+rowgather_N16", f_rowgather16),
                     ("argsort+colgather_x12", f_colgather12),
                     ("argsort+pack12+rowgather", f_pack12_rowgather)):
        try:
            t = scan_timeit(fn, (key, P16, col))
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

if __name__ == "__main__":
    main()
