"""Stage-by-stage attribution of the production fused3 ia chain at 1M
(bn=128, w=288, pt_via_sort_payloads=True — exactly what the bench's
fused3p step builds), in-situ (scanned, state-fed) so nothing hoists.

Stages (cumulative):
  sort       14-payload lax.sort (key+3 keys, 10 features)
  kernel     + searchsorted + PT stack + extraction kernel (consume raw)
  invmap     + inverse sort + the 13 origin-frame gathers
  pd         + precompute_pair_data_T on the extracted partner features
  fallback   + the exact XLA fallback group's pair data
  eval1      + one eval_pair_ia_T + fallback eval + fold
  eval2      + the second eval (the production itloop runs 2)
  noia       evolve with zero ia (the non-ia remainder of the dynamics)

Run alone on the chip: python tools/probe_ia3_chain.py [stages...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

INNER = 6


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model, dynamics
    from icebergs_tpu.ops import forces as _forces
    from icebergs_tpu.ops.accel import IA, zero_ia
    from icebergs_tpu.ops import fused_contact as FC
    from icebergs_tpu.ops.pallas_prepass import (
        contact_extract_sorted, EX_CNT, EX_F1, EX_F2, PT_NF, PT_NEVAL,
        PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS, PT_RAD, PT_ALIVE,
        PT_KEY, PT_FLK)

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    ncells = NX * NY
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

    BN, W, FCAP = 128, 288, 4096

    def chain(s, upto):
        N = s.capacity
        dtype = s.dtype
        key = jnp.where(s.alive, s.jne * NX + s.ine, ncells)
        idx = jnp.arange(N, dtype=jnp.int32)
        A = s.length * s.width
        R = _forces._interaction_radius(cfg, A)
        alive_f = s.alive.astype(dtype)
        feats = [s.lon_old, s.lat_old, s.uvel_old, s.vvel_old, A,
                 s.mass, R, alive_f, key.astype(dtype), s.fl_k]
        slots = (PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
                 PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)
        sorted_all = jax.lax.sort(
            (key, s.id_cnt, s.id_ij, idx) + tuple(feats), num_keys=3)
        order = sorted_all[3]
        feats_s = list(sorted_all[4:])
        key_s = key[order]
        if upto == "sort":
            acc = sum(f[:1] for f in feats_s) + key_s[:1].astype(dtype)
            return s.replace(uvel=s.uvel.at[:1].add(1e-30 * acc))
        cell_starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)
        ).astype(jnp.int32)
        rows = [jnp.zeros((N,), dtype)] * PT_NF
        for r, f in zip(slots, feats_s):
            rows[r] = f
        PT = jnp.stack(rows, axis=0)
        out, bad_block = contact_extract_sorted(
            PT, key_s, cell_starts, grid, cfg, block_n=BN, window=W)
        if upto == "kernel":
            acc = out[EX_CNT] + out[EX_F1] + out[EX_F2]
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        _, inv = jax.lax.sort((order, idx), num_keys=1)
        cnt_s = out[EX_CNT].astype(jnp.int32)
        alive_s = key_s < ncells
        bad_s = (bad_block | (cnt_s > 2)) & alive_s
        normal_s = (cnt_s > 0) & ~bad_block & (cnt_s <= 2) & alive_s
        back = lambda x: x[inv]
        cnt_o = back(cnt_s)
        bad_o = back(bad_s)
        normal_o = back(normal_s)
        m_n = jnp.stack([normal_o, normal_o & (cnt_o >= 2)], axis=0)
        names = ("lon2", "lat2", "u2", "v2", "A2g", "M2g")
        pf = {nm: jnp.stack([back(out[EX_F1 + k]), back(out[EX_F2 + k])],
                            axis=0) for k, nm in enumerate(names)}
        if upto == "invmap":
            acc = cnt_o.astype(dtype) + bad_o.astype(dtype)
            for v in pf.values():
                acc = acc + v[0] + v[1]
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        pd_n = _forces.precompute_pair_data_T(
            s, cfg, None, m_n, bonded=False, use_c_crit_dist=False,
            partner_fields=pf)
        if upto == "pd":
            acc = pd_n.IA_x + pd_n.IA_y + jnp.sum(
                pd_n.P11 + pd_n.P12 + pd_n.P22, 0)
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        pd_f, sel_f, vrow_f, code_f, stats = FC._fallback_group(
            s, bad_o, order, key_s, cell_starts, grid, cfg,
            fallback_cap=FCAP, fallback_strip_width=64, radius=1,
            exclude_same_group=False, use_c_crit_dist=False)
        if upto == "fallback":
            acc = (pd_n.IA_x + pd_f.IA_x[:1] + code_f.astype(dtype)
                   + stats.overflow.astype(dtype))
            return s.replace(uvel=s.uvel + 1e-30 * acc)

        u0, v0 = s.uvel, s.vvel

        if upto.endswith("_bar"):
            # force pd/fallback materialization ONCE: if XLA is
            # rematerializing the velocity-independent pair chain inside
            # each eval, the barrier recovers it
            flat, tree = jax.tree.flatten((pd_n, pd_f))
            flat = jax.lax.optimization_barrier(flat)
            pd_n, pd_f = jax.tree.unflatten(tree, flat)

        def one_eval(u1, v1):
            bn = _forces.eval_pair_ia_T(pd_n, cfg, u0, v0, u1, v1)
            bf = _forces.eval_pair_ia(pd_f, cfg, u0[sel_f], v0[sel_f],
                                      u1[sel_f], v1[sel_f])

            def fold(x, f):
                tab = jnp.concatenate(
                    [jnp.where(vrow_f, f, 0.), jnp.zeros((1,), f.dtype)])
                return x + tab[code_f]
            return IA(*(fold(x, f) for x, f in zip(bn, bf)))

        ia = one_eval(s.uvel, s.vvel)
        acc = sum(list(ia))
        if upto.startswith("eval1"):
            return s.replace(uvel=s.uvel + 1e-30 * acc)
        ia2 = one_eval(s.uvel + 1e-30 * acc, s.vvel)
        acc2 = sum(list(ia2))
        return s.replace(uvel=s.uvel + 1e-30 * acc2)

    def f_noia(s):
        out = dynamics.evolve_icebergs(
            s, grid, frc, cfg,
            ia_fn=lambda u, v: zero_ia(s.lon.shape, s.dtype))
        return out.state

    def scan_timeit(fn, arg, reps=2):
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

    only = sys.argv[1:] or ["sort", "kernel", "invmap", "pd", "fallback",
                            "eval1", "eval2", "noia"]
    for name in only:
        fn = f_noia if name == "noia" else (
            lambda s, _u=name: chain(s, _u))
        try:
            t = scan_timeit(fn, st_i)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
