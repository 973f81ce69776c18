"""Round-3 microbenchmarks on the live chip: sort variants, slot-sum
variants, permute cost.  Informs the persistent-sorted-layout design."""

import time
import sys

import numpy as np


def scan_timeit(fn, args, reps=2, inner=4):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(*c) if isinstance(c, tuple) else fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=inner)
        return out

    out = many(args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * inner)


def main():
    import jax
    import jax.numpy as jnp

    N = 1_000_000
    NX = NY = 512
    NCELLS = NX * NY
    rng = np.random.RandomState(0)
    key0 = jnp.asarray(rng.randint(0, NCELLS, N), jnp.int32)
    idc = jnp.asarray(rng.randint(0, 1 << 20, N), jnp.int32)
    idj = jnp.asarray(rng.randint(0, 1 << 18, N), jnp.int32)
    vals = jnp.asarray(rng.rand(N, 36), jnp.float32)
    print("device:", jax.devices()[0], flush=True)

    # --- sort variants -------------------------------------------------
    def lex3(key, a, b):
        o1 = jnp.argsort(b, stable=True)
        o2 = jnp.argsort(a[o1], stable=True)
        o12 = o1[o2]
        o3 = jnp.argsort(key[o12], stable=True)
        order = o12[o3]
        return key + order[:1], a, b

    def lax_sort3(key, a, b):
        idx = jnp.arange(key.shape[0], dtype=jnp.int32)
        ks, as_, bs, order = jax.lax.sort((key, a, b, idx), num_keys=3)
        return key + order[:1], a, b

    def sort1(key, a, b):
        o = jnp.argsort(key)
        return key + o[:1], a, b

    def lax_sort1(key, a, b):
        idx = jnp.arange(key.shape[0], dtype=jnp.int32)
        ks, order = jax.lax.sort((key, idx), num_keys=1)
        return key + order[:1], a, b

    for name, fn in (("lexsort_3xargsort", lex3),
                     ("lax.sort num_keys=3", lax_sort3),
                     ("argsort_single", sort1),
                     ("lax.sort num_keys=1", lax_sort1)):
        t = scan_timeit(fn, (key0, idc, idj))
        print(f"{name}: {t*1e3:.1f} ms", flush=True)

    # --- near-sorted input (9% movers) --------------------------------
    key_sorted = jnp.sort(key0)
    mov = jnp.asarray(rng.rand(N) < 0.09)
    key_near = jnp.where(mov, jnp.asarray(rng.randint(0, NCELLS, N),
                                          jnp.int32), key_sorted)
    t = scan_timeit(lambda k, a, b: lax_sort3(k, a, b),
                    (key_near, idc, idj))
    print(f"lax.sort3 near-sorted: {t*1e3:.1f} ms", flush=True)

    # --- slot sums: scatter vs gather ---------------------------------
    K = 16
    ks = jnp.sort(key0)
    starts = jnp.searchsorted(ks, jnp.arange(NCELLS + 1,
                                             dtype=ks.dtype)).astype(jnp.int32)
    rank = jnp.arange(N, dtype=jnp.int32) - starts[jnp.minimum(ks, NCELLS - 1)]

    def tree_reduce(x):
        k = x.shape[1]
        while k > 1:
            x = x[:, 0::2] + x[:, 1::2]
            k //= 2
        return x[:, 0]

    def slot_scatter(v, ks=ks, rank=rank):
        idx = ks * K + jnp.minimum(rank, K - 1)
        buf = jnp.zeros((NCELLS * K, v.shape[1]), v.dtype).at[idx].add(
            v, mode='drop')
        s = tree_reduce(buf.reshape(NCELLS, K, -1))
        return v + s[:1, :]

    def slot_scatter_sorted(v, ks=ks, rank=rank):
        idx = ks * K + jnp.minimum(rank, K - 1)
        buf = jnp.zeros((NCELLS * K, v.shape[1]), v.dtype).at[idx].add(
            v, mode='drop', indices_are_sorted=True, unique_indices=True)
        s = tree_reduce(buf.reshape(NCELLS, K, -1))
        return v + s[:1, :]

    def slot_gather(v, starts=starts):
        cnt = starts[1:] - starts[:-1]                     # (NCELLS,)
        idx = starts[:-1, None] + jnp.arange(K)[None, :]   # (NCELLS, K)
        valid = jnp.arange(K)[None, :] < cnt[:, None]
        rows = v[jnp.minimum(idx, N - 1)] * valid[..., None]
        s = tree_reduce(rows)
        return v + s[:1, :]

    def seg_sum(v, ks=ks):
        s = jax.ops.segment_sum(v, ks, num_segments=NCELLS,
                                indices_are_sorted=True)
        return v + s[:1, :]

    for name, fn in (("slot_scatter (current)", slot_scatter),
                     ("slot_scatter sorted-hint", slot_scatter_sorted),
                     ("slot_gather", slot_gather),
                     ("segment_sum sorted", seg_sum)):
        try:
            t = scan_timeit(fn, vals)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    # --- full-state permute cost (70 leaves) ---------------------------
    import icebergs_tpu as ibt
    st = ibt.create_bergs(N, lon=rng.rand(N), lat=rng.rand(N),
                          mass=1e9, thickness=40., width=150., length=150.,
                          mass_scaling=1.0)
    order = jnp.asarray(rng.permutation(N), jnp.int32)

    def permute_state(s):
        s2 = jax.tree.map(lambda x: x[order], s)
        return s2
    t = scan_timeit(permute_state, st)
    print(f"permute_full_state: {t*1e3:.1f} ms", flush=True)

    # one (N, 34) row gather (packed interp idea)
    P = jnp.asarray(rng.rand(NCELLS, 34), jnp.float32)

    def packed_gather(v):
        g = P[key0]
        return v + g[:, :36] if g.shape[1] >= 36 else v + 0. * v + g.sum(
            1, keepdims=True)
    t = scan_timeit(lambda v: v + P[key0].sum(1, keepdims=True), vals)
    print(f"packed_gather_(N,34): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
