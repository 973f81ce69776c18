"""Round-3 microbenchmarks on the live chip: sort variants, slot-sum
variants, permute cost.  Informs the persistent-sorted-layout design.
RUN ALONE — concurrent host load poisons tunnel timings."""

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
    vals = jnp.asarray(rng.rand(N, 36).astype(np.float32))
    only = set(sys.argv[1:])

    def run(name, fn, args):
        if only and name not in only:
            return
        try:
            t = scan_timeit(fn, args)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)

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

    run("lexsort_3xargsort", lex3, (key0, idc, idj))
    run("lax.sort_3key", lax_sort3, (key0, idc, idj))

    # --- slot sums at F=36 (the spread shape) ---------------------------
    K = 16
    ks = jnp.sort(key0)
    starts = jnp.searchsorted(ks, jnp.arange(NCELLS + 1,
                                             dtype=ks.dtype)).astype(jnp.int32)
    rank = jnp.arange(N, dtype=jnp.int32) - starts[jnp.minimum(ks,
                                                               NCELLS - 1)]

    def tree_reduce(x):
        k = x.shape[1]
        while k > 1:
            x = x[:, 0::2] + x[:, 1::2]
            k //= 2
        return x[:, 0]

    def slot_scatter(v):
        idx = ks * K + jnp.minimum(rank, K - 1)
        buf = jnp.zeros((NCELLS * K, v.shape[1]), v.dtype).at[idx].add(
            v, mode='drop')
        s = tree_reduce(buf.reshape(NCELLS, K, -1))
        return v + s[:1, :]

    def slot_gather(v):
        cnt = starts[1:] - starts[:-1]
        idx = starts[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(K, dtype=jnp.int32)[None, :] < cnt[:, None])
        rows = v[jnp.minimum(idx, N - 1)] * valid[..., None]
        s = tree_reduce(rows)
        return v + s[:1, :]

    def slot_gather_flat(v):
        # gather with flat (NCELLS*K,) index then reshape (layout-friendlier?)
        cnt = starts[1:] - starts[:-1]
        idx = (starts[:-1, None]
               + jnp.arange(K, dtype=jnp.int32)[None, :]).reshape(-1)
        valid = (jnp.arange(K, dtype=jnp.int32)[None, :]
                 < cnt[:, None]).reshape(-1)
        rows = v[jnp.minimum(idx, N - 1)] * valid[:, None]
        s = tree_reduce(rows.reshape(NCELLS, K, -1))
        return v + s[:1, :]

    run("slot_scatter", slot_scatter, vals)
    run("slot_gather", slot_gather, vals)
    run("slot_gather_flat", slot_gather_flat, vals)

    # calibration: the real reproducible spread at 1M
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import spread as _spread
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=45.0, dt=600.0)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.3, vo=0.1, ua=5.0, sst=4.0,
                              sss=33.0)
    st = ibt.create_bergs(N,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, N),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, N),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    def f_spread(s):
        sp = _spread.create_gridded_icebergs_fields(s, grid, frc, cfg)
        return s.replace(lon=s.lon + 1e-12 * sp.spread_mass[0, 0])
    run("spread_reprod_actual", f_spread, st)

    # --- permutes --------------------------------------------------------
    order_rand = jnp.asarray(rng.permutation(N), jnp.int32)
    # near-sorted permutation: ~9% movers relocated
    p = np.arange(N)
    mov = rng.rand(N) < 0.09
    movers = p[mov]
    rng.shuffle(movers)
    p[mov] = movers
    order_near = jnp.asarray(p, jnp.int32)

    def permute_state(s, order):
        return jax.tree.map(lambda x: x[order], s)

    run("permute_full_random", lambda s: permute_state(s, order_rand), st)
    run("permute_full_near", lambda s: permute_state(s, order_near), st)

    # --- packed row gathers ----------------------------------------------
    P = jnp.asarray(rng.rand(NCELLS, 34).astype(np.float32))
    run("packed_gather_rand_idx",
        lambda v: v + P[key0].sum(1, keepdims=True), vals)
    run("packed_gather_sorted_idx",
        lambda v: v + P[ks].sum(1, keepdims=True), vals)

    # 14-col pack-then-gather (the fused path's M[order])
    M14 = jnp.asarray(rng.rand(N, 14).astype(np.float32))
    run("rowgather_(N,14)_rand",
        lambda v: v + M14[order_rand].sum(1, keepdims=True), vals)
    run("rowgather_(N,14)_near",
        lambda v: v + M14[order_near].sum(1, keepdims=True), vals)


if __name__ == "__main__":
    main()
