"""Cost the sorted-layout maintenance options at 1M bergs + find the
composed-step overhead the phase sum doesn't explain."""

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
    import jax
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.model import make_multi_step

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.3, vo=0.1, ua=5.0, sst=4.0,
                              sss=33.0)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    print("device:", jax.devices()[0], flush=True)

    key = np.asarray(jnp.where(st.alive, st.jne * NX + st.ine, NX * NY))

    # 1. composed bench step (what bench.py actually runs)
    from icebergs_tpu.ops.forces import can_use_quadrant_window
    window = ("quadrant" if can_use_quadrant_window(st, grid, cfg)
              else "full")
    multi = make_multi_step(grid, cfg, INNER, with_thermo=True,
                            max_per_cell=6, neighbor_window=window,
                            contact_cap=131072)
    out = jax.block_until_ready(multi(st, frc))
    t0 = time.perf_counter()
    for _ in range(2):
        out = jax.block_until_ready(multi(out, frc))
    print(f"bench_step_composed: {(time.perf_counter()-t0)/(2*INNER)*1e3:.1f}"
          " ms", flush=True)

    # 2. argsort of the 1M cell keys alone
    def f_argsort(k):
        o = jnp.argsort(k)
        return k + (o[0] % 2)
    print(f"argsort_keys: {scan_timeit(f_argsort, jnp.asarray(key))*1e3:.1f}"
          " ms", flush=True)

    # 3. full 40-leaf permute, random order vs nearly-sorted order
    perm_rand = jnp.asarray(np.random.RandomState(1).permutation(NBERGS))
    near = np.arange(NBERGS)
    swaps = np.random.RandomState(2).choice(NBERGS - 1, 50_000, replace=False)
    near[swaps], near[swaps + 1] = near[swaps + 1], near[swaps]
    # plus ~5% long-distance movers (row crossers move ~2000 slots)
    movers = np.random.RandomState(3).choice(NBERGS, 50_000, replace=False)
    near[movers] = np.roll(near[movers], 1000)
    perm_near = jnp.asarray(near)

    def mk_permute(perm):
        def f(s):
            return jax.tree.map(lambda x: x[perm], s)
        return f
    print(f"permute40_random: {scan_timeit(mk_permute(perm_rand), st)*1e3:.1f}"
          " ms", flush=True)
    print(f"permute40_nearsorted: "
          f"{scan_timeit(mk_permute(perm_near), st)*1e3:.1f} ms", flush=True)

    # 4. packed (N,8) matrix permute (random) — the sort-only-the-search-
    # structure option
    P8 = jnp.stack([st.lon, st.lat, st.length, st.width, st.mass,
                    st.uvel, st.vvel, st.alive.astype(st.lon.dtype)], -1)
    def f_p8(p):
        return p[perm_rand] + 1e-30
    print(f"packed8_gather_random: {scan_timeit(f_p8, P8)*1e3:.1f} ms",
          flush=True)

    # 5. scalar map through order (the pmin/pmax id translation)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, NBERGS, NBERGS))
    def f_map(x):
        return perm_rand[x]
    print(f"scalar_gather_random: {scan_timeit(f_map, ids)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
