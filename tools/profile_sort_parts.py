"""Decompose sort_state_by_cell cost: argsort vs leaf permutes vs packed."""
import time
import numpy as np

INNER = 4

def scan_timeit(fn, arg, reps=2):
    import jax
    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out
    out = jax.block_until_ready(many(arg))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(many(out))
    return (time.perf_counter() - t0) / (reps * INNER)

def main():
    import jax, jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY, grid_is_latlon=False)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2*DXY, (NX-2)*DXY, NBERGS),
                          lat=rng.uniform(2*DXY, (NY-2)*DXY, NBERGS),
                          mass=850.*40.*150.*150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    print("device:", jax.devices()[0], "dtype:", st.lon.dtype, flush=True)
    nleaves = len(jax.tree.leaves(st))
    print("state leaves:", nleaves, flush=True)

    key0 = (st.jne * NX + st.ine).astype(jnp.int32)

    def f_argsort(k):
        o = jnp.argsort(k)
        return k + o.astype(jnp.int32)

    def f_sortpair(k):
        # sort (key, iota) pair - same as argsort
        o = jax.lax.sort((k, jnp.arange(k.shape[0], jnp.int32)), num_keys=1)[1]
        return k + o

    def f_permute_all(k):
        o = jnp.argsort(k)
        new = jax.tree.map(lambda x: x[o], st)
        return k + new.ine

    def f_permute_packed(k):
        o = jnp.argsort(k)
        P = jnp.stack([st.lon_old, st.lat_old, st.uvel, st.vvel,
                       st.length, st.width, st.fl_k,
                       st.alive.astype(st.lon.dtype)], axis=-1)
        Ps = P[o]
        return k + Ps[:, 0].astype(jnp.int32)

    def f_starts(k):
        o = jnp.argsort(k)
        ks = k[o]
        starts = jnp.searchsorted(ks, jnp.arange(NX*NY+1, dtype=ks.dtype))
        return k + starts[0].astype(jnp.int32)

    for name, fn in (("argsort", f_argsort),
                     ("lax.sort_pair", f_sortpair),
                     ("argsort+starts", f_starts),
                     ("argsort+packed8", f_permute_packed),
                     ("argsort+permute_all", f_permute_all)):
        try:
            t = scan_timeit(fn, key0)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

if __name__ == "__main__":
    main()
