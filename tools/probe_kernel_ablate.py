"""In-kernel cost attribution for contact_extract_sorted (fused3).

Ablated copies of the extraction kernel, timed in-situ (scanned with a
data-dependent perturbation of the feature matrix so nothing hoists out
of the loop — PLAN.md measurement-bug note):

  dma_only    DMA self + 3 window strips, consume raw rows (no winT,
              no pair matrix)
  trans_only  + the per-strip (PT_NF, WL) -> (WL, PT_NF) transpose
  pairs       + full engagement test + cnt/vmin/vmax (no extraction)
  full        + the two selection matmuls (== production kernel)
  full_defp   full but Precision.DEFAULT dots (bf16 — WRONG numerics,
              cost probe only)
  mxu         pairs, but r^2 via the MXU cross-term (q1.q2 matmul with
              per-window centering) instead of VPU subtract/square

Run alone on the chip: python tools/probe_kernel_ablate.py [modes...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

INNER = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces as _forces
    from icebergs_tpu.ops.pallas_prepass import (
        PT_NF, PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
        PT_RAD, PT_ALIVE, PT_KEY, PT_FLK, EX_NOUT)

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    lon_old=st.lon, lat_old=st.lat)

    ncells = NX * NY
    N = st.capacity
    dtype = st.lon.dtype
    key = jnp.where(st.alive, st.jne * NX + st.ine, ncells)
    idx = jnp.arange(N, dtype=jnp.int32)
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    alive_f = st.alive.astype(dtype)
    feats = [st.lon_old, st.lat_old, st.uvel_old, st.vvel_old, A,
             st.mass, R, alive_f, key.astype(dtype), st.fl_k]
    slots = (PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
             PT_RAD, PT_ALIVE, PT_KEY, PT_FLK)
    _, _, _, order = jax.lax.sort((key, st.id_cnt, st.id_ij, idx),
                                  num_keys=3)
    key_s = jax.device_put(key[order])
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)
    rows = [jnp.zeros((N,), dtype)] * PT_NF
    for r, f in zip(slots, feats):
        rows[r] = f[order]
    PT0 = jax.device_put(jnp.stack(rows, axis=0))
    starts = jax.device_put(starts)

    def build(mode, BN=128, W=288):
        WL = -(-(W + 128) // 128) * 128
        nblocks = -(-N // BN)
        Npad = nblocks * BN
        nstrips = 3
        slack = 1. + 1e-6
        BIG = float(2 * N)

        c0 = key_s[::BN]
        c1 = jnp.minimum(key_s[BN - 1::BN], ncells - 1)
        offs = jnp.arange(-1, 2, dtype=jnp.int32) * NX
        c_lo = jnp.clip(c0[:, None] - 1 + offs[None, :], 0, ncells - 1)
        c_hi = jnp.clip(c1[:, None] + 1 + offs[None, :], -1, ncells - 1)
        ws128 = (starts[c_lo] // 128).astype(jnp.int32).reshape(-1)
        c_lo32 = c_lo.astype(jnp.int32).reshape(-1)
        c_hi32 = c_hi.astype(jnp.int32).reshape(-1)

        def kernel(ws_ref, clo_ref, chi_ref, PT_ref, out_ref, self_v,
                   win_v, sem, wsem):
            b = pl.program_id(0)
            cp_self = pltpu.make_async_copy(
                PT_ref.at[:, pl.ds(b * BN, BN)], self_v, sem)
            cp_self.start()
            wcps = []
            for s in range(nstrips):
                w0 = ws_ref[b * nstrips + s] * 128
                cp = pltpu.make_async_copy(
                    PT_ref.at[:, pl.ds(w0, WL)], win_v.at[s], wsem.at[s])
                cp.start()
                wcps.append(cp)
            cp_self.wait()
            rows = self_v[...]
            lon1 = rows[PT_LON:PT_LON + 1, :]
            lat1 = rows[PT_LAT:PT_LAT + 1, :]
            R1 = rows[PT_RAD:PT_RAD + 1, :]
            fl1 = rows[PT_FLK:PT_FLK + 1, :]
            al1 = rows[PT_ALIVE:PT_ALIVE + 1, :]
            gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (WL, 1), 0)

            cnt = jnp.zeros((1, BN), dtype)
            vmin = jnp.full((1, BN), BIG, dtype)
            vmax = jnp.full((1, BN), -1., dtype)
            f1 = jnp.zeros((8, BN), dtype)
            f2 = jnp.zeros((8, BN), dtype)

            for s in range(nstrips):
                w0 = ws_ref[b * nstrips + s] * 128
                wcps[s].wait()
                win = win_v[s]
                if mode == "dma_only":
                    cnt = cnt + jnp.sum(win[0:1, :128]) * jnp.ones(
                        (1, BN), dtype)
                    continue
                if mode == "mxu":
                    # r^2 <= (R1+R2)^2  <=>  (|p1c|^2 - R1^2) +
                    # (|p2c|^2 - R2^2) <= 2*(p1c.p2c + R1*R2), coords
                    # centered on the block's first self row
                    cx = lon1[0, 0]
                    cy = lat1[0, 0]
                    q1 = jnp.concatenate(
                        [lon1 - cx, lat1 - cy, R1], axis=0)   # (3, BN)
                    # window q rows: centered lon/lat + R  (3, WL)
                    q2 = jnp.concatenate(
                        [win[PT_LON:PT_LON + 1, :] - cx,
                         win[PT_LAT:PT_LAT + 1, :] - cy,
                         win[PT_RAD:PT_RAD + 1, :]], axis=0)
                    cross = jax.lax.dot_general(
                        q2, q1, (((0,), (0,)), ((), ())),
                        preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)  # (WL, BN)
                    b1 = (q1[0:1, :] ** 2 + q1[1:2, :] ** 2
                          - q1[2:3, :] ** 2)                  # (1, BN)
                    t2 = (q2[0:1, :] ** 2 + q2[1:2, :] ** 2
                          - q2[2:3, :] ** 2)                  # (1, WL)
                    winT = win.T
                    b2 = t2.T                                 # (WL, 1)
                    al2 = winT[:, PT_ALIVE:PT_ALIVE + 1]
                    fl2 = winT[:, PT_FLK:PT_FLK + 1]
                    key2 = winT[:, PT_KEY:PT_KEY + 1]
                    clo = clo_ref[b * nstrips + s].astype(dtype)
                    chi = chi_ref[b * nstrips + s].astype(dtype)
                    wid = w0 + rowi
                    valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                             & (al1 > 0.5) & (wid != gid)
                             & (fl1 != -1.) & (fl2 != -1.))
                    eng = valid & (b1 + b2 <= 2. * cross + 8.)
                    cnt = cnt + jnp.sum(
                        jnp.where(eng, 1., 0.).astype(dtype), axis=0,
                        keepdims=True)
                    widf = wid.astype(dtype)
                    vmin = jnp.minimum(vmin, jnp.min(
                        jnp.where(eng, widf, BIG), axis=0, keepdims=True))
                    vmax = jnp.maximum(vmax, jnp.max(
                        jnp.where(eng, widf, -1.), axis=0, keepdims=True))
                    continue

                winT = win.T
                if mode == "trans_only":
                    cnt = cnt + jnp.sum(winT[:128, 0:1]) * jnp.ones(
                        (1, BN), dtype)
                    continue
                lon2 = winT[:, PT_LON:PT_LON + 1]
                lat2 = winT[:, PT_LAT:PT_LAT + 1]
                R2 = winT[:, PT_RAD:PT_RAD + 1]
                fl2 = winT[:, PT_FLK:PT_FLK + 1]
                al2 = winT[:, PT_ALIVE:PT_ALIVE + 1]
                key2 = winT[:, PT_KEY:PT_KEY + 1]
                clo = clo_ref[b * nstrips + s].astype(dtype)
                chi = chi_ref[b * nstrips + s].astype(dtype)
                wid = w0 + rowi
                valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                         & (al1 > 0.5) & (wid != gid)
                         & (fl1 != -1.) & (fl2 != -1.))
                rx = lon1 - lon2
                ry = lat1 - lat2
                r2 = rx * rx + ry * ry
                crit = jnp.maximum(R1 + R2, 0.)
                engaged = valid & (r2 > 0.) & (r2 <= crit * crit * slack)
                engf = jnp.where(engaged, 1., 0.).astype(dtype)
                cnt = cnt + jnp.sum(engf, axis=0, keepdims=True)
                widf = wid.astype(dtype)
                lmin = jnp.min(jnp.where(engaged, widf, BIG), axis=0,
                               keepdims=True)
                lmax = jnp.max(jnp.where(engaged, widf, -1.), axis=0,
                               keepdims=True)
                if mode in ("full", "full_defp"):
                    feats_w = win[0:8, :]
                    e1 = engf * jnp.where(widf == lmin, 1., 0.)
                    e2 = engf * jnp.where(widf == lmax, 1., 0.)
                    prec = (jax.lax.Precision.HIGHEST if mode == "full"
                            else jax.lax.Precision.DEFAULT)
                    f1s = jax.lax.dot_general(
                        feats_w, e1, (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype, precision=prec)
                    f2s = jax.lax.dot_general(
                        feats_w, e2, (((1,), (0,)), ((), ())),
                        preferred_element_type=dtype, precision=prec)
                    take1 = lmin < vmin
                    take2 = lmax > vmax
                    f1 = jnp.where(take1, f1s, f1)
                    f2 = jnp.where(take2, f2s, f2)
                vmin = jnp.minimum(vmin, lmin)
                vmax = jnp.maximum(vmax, lmax)

            pad = jnp.zeros((1, BN), dtype)
            out_ref[...] = jnp.concatenate(
                [cnt, vmin, vmax, pad, f1, f2,
                 jnp.zeros((EX_NOUT - 20, BN), dtype)], axis=0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((EX_NOUT, BN), lambda b, *_: (0, b)),
            scratch_shapes=[pltpu.VMEM((PT_NF, BN), dtype),
                            pltpu.VMEM((nstrips, PT_NF, WL), dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA((nstrips,))])

        def run_once(PT):
            PTpad = jnp.concatenate(
                [PT, jnp.zeros((PT_NF, Npad - N + WL), dtype)], axis=1)
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((EX_NOUT, Npad), dtype),
            )(ws128, c_lo32, c_hi32, PTpad)

        return run_once

    only = sys.argv[1:] or ["dma_only", "trans_only", "pairs", "full",
                            "full_defp", "mxu", "full_bn256_w576",
                            "full_bn512_w1152"]

    def timeit(name, run_once):
        @jax.jit
        def many(PT):
            def body(c, _):
                out = run_once(c)
                # data-dependent feedback: no hoisting
                c = c + 1e-30 * out[0:1, :1]
                return c, out[0, :8]
            c, outs = jax.lax.scan(body, PT, None, length=INNER)
            return c, outs
        try:
            c, outs = many(PT0)
            _ = np.asarray(outs[:1, :1])
            t0 = time.perf_counter()
            reps = 2
            for _ in range(reps):
                c, outs = many(c)
                _ = np.asarray(outs[:1, :1])
            t = (time.perf_counter() - t0) / (reps * INNER)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)

    for m in only:
        if m.startswith("full_bn"):
            parts = m.split("_")
            bn = int(parts[1][2:])
            w = int(parts[2][1:])
            timeit(m, build("full", BN=bn, W=w))
        else:
            timeit(m, build(m))


if __name__ == "__main__":
    main()
