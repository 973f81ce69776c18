"""Headline benchmark: berg-steps/sec at 1M bergs with pair contacts.

The reference publishes no performance numbers (BASELINE.md); its wall
clocks are printed per run only.  The north star recorded in BASELINE.json
is >100 steps/s at 1M bergs with DEM contacts on one chip -> we report
steps/s at 1M bergs and vs_baseline = steps_per_sec / 100.

Run on whatever jax.devices()[0] is (TPU under the driver).
"""

import json
import time

import numpy as np


def main():
    import os
    import jax
    # persistent compile cache: the scanned 1M-berg program takes several
    # minutes to compile on the tunneled dev TPU; cache it next to the repo
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.model import make_multi_step

    NBERGS = 1_000_000
    CAP = NBERGS
    NX = NY = 512
    DXY = 2000.0
    INNER = 2          # keep the scanned program's compile time bounded
    # ~3.8 bergs/cell mean at this density; K=6 drops candidates in the
    # ~8% of cells holding >6 bergs (the reference's lists are unbounded;
    # K=8 measured 1.53 s/step vs 0.89 here -- fidelity/cost knob)
    MAX_PER_CELL = 6

    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False,   # Verlet: one accel per step
        interactive_icebergs_on=True,        # pair contacts on
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.3, vo=0.1, ua=5.0, sst=4.0,
                              sss=33.0)

    rng = np.random.RandomState(0)
    lon = rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS)
    lat = rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS)
    st = ibt.create_bergs(CAP, lon=lon, lat=lat,
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # The quadrant window (2x2 candidate block nearest (xi, yj)) is an
    # equal candidate superset here (cutoff ~170 m << half-cell 1000 m)
    # at 4/9 the candidate bandwidth: 2.16 -> 1.13 s/step measured.
    # Contact compaction on top (position-only prepass -> compact eval of
    # the ~3% engaged subset) gives 1.13 -> 0.89 s/step.
    from icebergs_tpu.ops.forces import can_use_quadrant_window
    window = ("quadrant" if can_use_quadrant_window(st, grid, cfg)
              else "full")
    multi = make_multi_step(grid, cfg, INNER, with_thermo=True,
                            max_per_cell=MAX_PER_CELL,
                            neighbor_window=window,
                            contact_cap=131072)

    # warmup/compile
    st = jax.block_until_ready(multi(st, frc))

    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        st = jax.block_until_ready(multi(st, frc))
    dt_wall = (time.perf_counter() - t0) / (reps * INNER)

    steps_per_sec = 1.0 / dt_wall
    berg_steps = steps_per_sec * NBERGS
    print(json.dumps({
        "metric": "berg_steps_per_sec_1M_contacts",
        "value": round(berg_steps, 1),
        "unit": "berg-steps/s/chip",
        "vs_baseline": round(steps_per_sec / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
