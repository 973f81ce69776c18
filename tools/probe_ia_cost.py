"""Attribute the fused-ia cost inside evolve: full-field evals (no DCE),
scatter variants, accel-with-ia vs accel-without.

RUN ALONE on the chip."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

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
    from icebergs_tpu import model
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2

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
    st_i = jax.block_until_ready(jax.jit(
        lambda s: model.interp_to_bergs(s, grid, frc, cfg))(st))
    print("device:", jax.devices()[0], flush=True)
    only = set(sys.argv[1:])

    def run(name, fn, arg=st_i):
        if only and name not in only:
            return
        try:
            t = scan_timeit(fn, arg)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:160]}",
                  flush=True)

    def mk(s):
        return make_ia_fn_fused2(s, grid, cfg, block_n=128, window=288,
                                 contact_cap=131072, fallback_cap=16384)

    def f_ia_allfields(s):
        ia_fn, _ = mk(s)
        ia = ia_fn(s.uvel, s.vvel)
        acc = sum(list(ia))                 # keeps ALL 7 fields alive
        return s.replace(uvel=s.uvel + 1e-12 * acc)

    def f_ia_allfields_2evals(s):
        ia_fn, _ = mk(s)
        ia = ia_fn(s.uvel, s.vvel)
        acc = sum(list(ia))
        ia2 = ia_fn(s.uvel + 1e-12 * acc, s.vvel)
        acc2 = sum(list(ia2))
        return s.replace(uvel=s.uvel + 1e-12 * acc2)

    def f_ia_xy_only(s):
        ia_fn, _ = mk(s)
        ia = ia_fn(s.uvel, s.vvel)
        return s.replace(uvel=s.uvel + 1e-12 * (ia.IA_x + ia.IA_y))

    def f_prepass_only(s):
        from icebergs_tpu.ops.pallas_prepass import contact_prepass_sorted
        from icebergs_tpu.ops.sorted import lex_cell_id_order
        from icebergs_tpu.ops import forces as _forces
        ncells = NX * NY
        key = jnp.where(s.alive, s.jne * NX + s.ine, ncells)
        order = lex_cell_id_order(key, s.id_cnt, s.id_ij)
        key_s = key[order]
        starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(
            jnp.int32)
        A = s.length * s.width
        R = _forces._interaction_radius(cfg, A)
        alive_f = s.alive.astype(s.dtype)
        M = jnp.stack([s.lon_old, s.lat_old, R, s.fl_k, alive_f,
                       key.astype(s.dtype), s.uvel_old, s.vvel_old],
                      axis=-1)
        Ms = M[order]
        cnt, pmin, pmax, bad = contact_prepass_sorted(
            None, starts, grid, cfg, block_n=128, window=288,
            P=Ms, key=key_s)
        return s.replace(uvel=s.uvel + 1e-12 * cnt.astype(s.dtype))

    run("prepass_only_incl_setup", f_prepass_only)
    run("ia_xy_only", f_ia_xy_only)
    run("ia_allfields", f_ia_allfields)
    run("ia_allfields_2evals", f_ia_allfields_2evals)

    # scatter cost in isolation: 7 separate vs 1 combined row scatter
    cap = 131072
    sel = jnp.sort(jnp.asarray(
        rng.choice(NBERGS, cap, replace=False), jnp.int32))
    vrow = jnp.arange(cap) < (cap - 7)
    vals7 = jnp.asarray(rng.rand(cap, 7).astype(np.float32))

    def f_scatter7(v):
        tgt = jnp.where(vrow, sel, NBERGS)
        outs = [jnp.zeros((NBERGS,), v.dtype).at[tgt].set(
            jnp.where(vrow, v[:, k], 0.), mode='drop',
            indices_are_sorted=True) for k in range(7)]
        return v + sum(o[:1] for o in outs)[None, :1]

    def f_scatter_rows(v):
        tgt = jnp.where(vrow, sel, NBERGS)
        rows = jnp.where(vrow[:, None], v, 0.)
        out = jnp.zeros((NBERGS, 7), v.dtype).at[tgt].set(
            rows, mode='drop', indices_are_sorted=True)
        return v + out[:1, :]

    run("scatter_7sep", f_scatter7, vals7)
    run("scatter_rows", f_scatter_rows, vals7)


if __name__ == "__main__":
    main()
