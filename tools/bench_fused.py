"""Compare the fused Pallas contact path vs the round-1 quadrant-bucket
path at 1M bergs on the real device (scan-batched)."""

import sys
import time

import numpy as np

INNER = 4


def main():
    import os
    import jax
    cache = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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

    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("both", "fused"):
        cfgs = ((256, 512), (512, 1024))
        if len(sys.argv) > 2:
            cfgs = tuple((int(a.split("x")[0]), int(a.split("x")[1]))
                         for a in sys.argv[2:])
        for bn, W in cfgs:
            multi = make_multi_step(grid, cfg, INNER, with_stats=True,
                                    with_thermo=True, neighbor_mode="fused",
                                    fused_block_n=bn, fused_window=W,
                                    contact_cap=131072,
                                    fused_fallback_cap=16384)
            try:
                import numpy as _np
                out = multi(st, frc)
                _ = _np.asarray(out[0].lon[:1])        # real sync
                t0 = time.perf_counter()
                out = multi(out[0], frc)
                _ = _np.asarray(out[0].lon[:1])
                dt = (time.perf_counter() - t0) / INNER
                print(f"fused bn={bn} W={W}: {dt*1e3:.1f} ms/step  "
                      f"overflow={int(out[1])} fallback={int(out[2])}",
                      flush=True)
            except Exception as e:
                print(f"fused bn={bn} W={W}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)

    if which in ("both", "quadrant"):
        multi = make_multi_step(grid, cfg, INNER, with_thermo=True,
                                max_per_cell=6, neighbor_window="quadrant",
                                contact_cap=131072)
        import numpy as _np
        out = multi(st, frc)
        _ = _np.asarray(out.lon[:1])
        t0 = time.perf_counter()
        out = multi(out, frc)
        _ = _np.asarray(out.lon[:1])
        dt = (time.perf_counter() - t0) / INNER
        print(f"quadrant K=6: {dt*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
