"""Optimized-HLO census of the production 1M step (p3tabk).

Compiles the persistent multi-step for the bench configuration (hits
the on-disk compile cache when bench/bench_persistent ran first) and
prints an opcode histogram plus the largest ops by output bytes —
the offline stand-in for a profiler on the tunneled backend
(jax.profiler hangs there; PLAN round-3 notes).

Usage: python tools/analyze_hlo.py [top_n]
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(top_n=40):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.model import make_persistent_multi_step

    NBERGS, NX, NY, DXY, INNER = 1_000_000, 512, 512, 2000.0, 24
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True,
        slot_sum_method="pallas", sort_packed_permute=True,
        pack_kernel=True, interp_mode="table", fused_window=160,
        fused_fallback_cap=2048)
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
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    multi = make_persistent_multi_step(
        grid, cfg, INNER, with_stats=True, with_thermo=True,
        neighbor_mode="fused3", fused_block_n=128, fused_window=160,
        contact_cap=131072, fused_fallback_cap=2048)
    txt = multi.lower(st, frc).compile().as_text()

    # shape -> bytes
    def nbytes(shape_str):
        m = re.match(r"(bf16|f32|f64|s32|u32|s8|u8|pred|s64|u64)"
                     r"\[([0-9,]*)\]", shape_str)
        if not m:
            return 0
        sz = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
              "u64": 8, "bf16": 2, "s8": 1, "u8": 1, "pred": 1}[m.group(1)]
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * sz

    ops = []
    hist = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = "
                     r"((?:bf16|f32|f64|s32|u32|s8|u8|pred|s64|u64|"
                     r"\()[^ ]*) ([\w\-]+)\(", line)
        if not m:
            continue
        shape, opc = m.group(1), m.group(2)
        if opc in ("parameter", "constant", "get-tuple-element",
                   "tuple", "bitcast"):
            continue
        b = sum(nbytes(s) for s in re.findall(
            r"(?:bf16|f32|f64|s32|u32|s8|u8|pred|s64|u64)\[[0-9,]*\]",
            shape))
        hist[opc] += 1
        ops.append((b, opc, line.strip()[:160]))

    print("== opcode histogram (top-level, post-opt) ==")
    for opc, n in hist.most_common(30):
        print(f"{n:6d}  {opc}")
    print(f"\n== top {top_n} ops by output bytes ==")
    for b, opc, line in sorted(ops, reverse=True)[:top_n]:
        print(f"{b/1e6:9.1f} MB  {opc:18s} {line[:120]}")
    total = sum(b for b, _, _ in ops)
    print(f"\ntotal top-level output bytes: {total/1e9:.2f} GB "
          f"(per {INNER}-step program; /{INNER} per step)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
