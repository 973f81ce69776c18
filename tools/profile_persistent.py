"""Per-phase budget of the PERSISTENT-sorted-slab step at 1M bergs.

Same methodology as tools/profile_phases.py (scan-batched, _inject
data-dependence so nothing hoists), but every probe runs in the
persistent layout: the carry is ``(state, cell_starts)`` with the slab
physically sorted by (cell, id), exactly as inside
``model.make_persistent_multi_step``.

RUN ALONE on the chip:
    python tools/profile_persistent.py [probe names...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# ~0.35 s per-dispatch tunnel overhead => ~22 ms floor at INNER=16;
# the unconditional "null" probe measures the exact floor to subtract.
INNER = 16

_DEP_F32 = ("lon", "lat", "lon_old", "lat_old", "uvel", "vvel",
            "uvel_old", "vvel_old", "length", "width")
_DEP_I32 = ("ine", "jne")


def _inject(s):
    import jax.numpy as jnp
    e = jnp.sum(s.uvel[:8]) * 1e-38          # data-dependent ~0 scalar
    di = (e * 0.).astype(jnp.int32)          # data-dependent int 0
    reps = {f: getattr(s, f) + e for f in _DEP_F32 if hasattr(s, f)}
    reps.update({f: getattr(s, f) + di for f in _DEP_I32 if hasattr(s, f)})
    return s.replace(**reps)


def scan_timeit(fn, arg, reps=2):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            s, cs = c
            return fn(_inject(s), cs), None
        out, _ = jax.lax.scan(body, a, None, length=INNER)
        return out

    out = many(arg)   # compile
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]   # real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * INNER)


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model, dynamics
    from icebergs_tpu.ops import thermo as _thermo
    from icebergs_tpu.ops import spread as _spread
    from icebergs_tpu.ops import pallas_interp as _pinterp
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused3
    from icebergs_tpu.ops.sorted import (sort_state_by_cell,
                                         uniform_state_fields)

    NBERGS = int(os.environ.get("KID_PROBE_N", 1_000_000))
    NX = NY = int(os.environ.get("KID_PROBE_NX", 512))
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.swirl_forcing(NX, NY, DXY, uo=0.3, ua=5.0, sst=4.0,
                              sss=33.0)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    lon_old=st.lon, lat_old=st.lat)
    _uniform = uniform_state_fields(cfg)
    st_s, starts0 = jax.jit(
        lambda s: sort_state_by_cell(s, grid, static_fields=_uniform))(st)
    st_s = jax.block_until_ready(st_s)
    print("device:", jax.devices()[0], flush=True)
    only = set(sys.argv[1:])
    ncells = NX * NY

    def run(name, fn, always=False):
        if only and name not in only and not always:
            return
        try:
            t = scan_timeit(fn, (st_s, starts0))
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)

    # dispatch-floor calibration (pure tunnel overhead / INNER)
    run("null", lambda s, cs: (s.replace(uvel=s.uvel + 1e-30), cs),
        always=True)

    # --- interface -------------------------------------------------
    def p_interp_xla(s, cs):
        s2 = model.interp_to_bergs(s, grid, frc, cfg)
        return s.replace(uvel=s.uvel + 1e-30 * s2.uo), cs

    def p_interp_kernel(s, cs):
        s2, m25 = _pinterp.interp_to_bergs_sorted(s, grid, frc, cfg)
        return s.replace(uvel=s.uvel + 1e-30 * (s2.uo
                                                + m25.astype(s.dtype))), cs

    # --- momentum (interp cached on the state via interp_to_bergs) --
    def _with_env(s):
        return model.interp_to_bergs(s, grid, frc, cfg)

    def _ia3(s, cs):
        return make_ia_fn_fused3(
            s, grid, cfg, block_n=128, window=288, contact_cap=131072,
            fallback_cap=4096, presorted=True, cell_starts=cs)

    def p_evolve_full(s, cs):
        se = _with_env(s)
        ia_fn, fstats = _ia3(se, cs)
        out = dynamics.evolve_icebergs(se, grid, frc, cfg, ia_fn=ia_fn)
        return out.state, cs

    def p_evolve_noia(s, cs):
        se = _with_env(s)
        out = dynamics.evolve_icebergs(se, grid, frc, cfg, ia_fn=None)
        return out.state, cs

    def p_evolve_zeroia(s, cs):
        from icebergs_tpu.ops.accel import IA
        se = _with_env(s)

        def zia(u, v):
            z = jnp.zeros_like(u)
            return IA(z + 1e-38 * u, z, z, z, z, z, z, z)

        out = dynamics.evolve_icebergs(se, grid, frc, cfg, ia_fn=zia)
        return out.state, cs

    # --- re-sort ----------------------------------------------------
    def p_sort(s, cs):
        s2, cs2 = sort_state_by_cell(s, grid, static_fields=_uniform)
        return s2, cs2

    def p_sort_packed(s, cs):
        from icebergs_tpu.ops import sorted as _srt
        _srt.SORT_PACKED_PERMUTE = True
        try:
            s2, cs2 = sort_state_by_cell(s, grid, static_fields=_uniform)
        finally:
            _srt.SORT_PACKED_PERMUTE = False
        return s2, cs2

    # --- thermo + spreading in the identity sort frame ---------------
    def _sort_ctx(s, cs):
        key_s = jnp.where(s.alive, s.jne * NX + s.ine,
                          ncells).astype(cs.dtype)
        rank = (jnp.arange(s.capacity, dtype=jnp.int32)
                - cs[jnp.minimum(key_s, ncells)])
        return (None, key_s, rank)

    def p_thermo(s, cs):
        se = _with_env(s)
        s2, md = _thermo.thermodynamics(se, grid, frc, cfg,
                                        sort_ctx=_sort_ctx(s, cs),
                                        defer_cell_cols=True)
        return s2, cs

    def p_spread_kernel(s, cs):
        old = _spread.SLOT_SUM_METHOD
        _spread.SLOT_SUM_METHOD = "pallas"
        try:
            sp = _spread.create_gridded_icebergs_fields(
                s, grid, frc, cfg, sort_ctx=_sort_ctx(s, cs),
                key_alive=s.alive, cell_starts=cs)
        finally:
            _spread.SLOT_SUM_METHOD = old
        return s.replace(mass=s.mass + 1e-30 * sp.spread_mass[0, 0]), cs

    run("p_interp_xla", p_interp_xla)
    run("p_interp_kernel", p_interp_kernel)
    run("p_evolve_noia", p_evolve_noia)
    run("p_evolve_zeroia", p_evolve_zeroia)
    run("p_evolve_full", p_evolve_full)
    run("p_sort", p_sort)
    run("p_sort_packed", p_sort_packed)
    run("p_thermo", p_thermo)
    run("p_spread_kernel", p_spread_kernel)


if __name__ == "__main__":
    main()
