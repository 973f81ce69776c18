"""The north star's ACTUAL configuration: 1M bergs WITH DEM bonds.

2066 square-packed conglomerates of 484 elements (22x22 at 3 km
spacing, the A68 element convention) = 999,944 bonded DEM elements on a
512x512 x 7 km grid, advanced by full MTS outer steps (Part-1 fused
cross-conglomerate search + half kick + explicit DEM substeps with
broken-bond contact, the a68 long-run flag set).

dt=600 s with 60 substeps -> dtf=10 s, inside the reference's stability
rule mts_fast_dt = 0.3/sqrt(spring_coef) = 11.7 s
(icebergs_framework.F90:1297-1302).

Prints one JSON line with element-substeps/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def config(sub_steps=60):
    import icebergs_tpu as ibt
    return ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=-55.0,
        dt=600.0, Runge_not_Verlet=False,
        mts=True, mts_sub_steps=sub_steps, explicit_inner_mts=True,
        dem=True, dem_spring_coef=5.e6, dem_damping_coef=1.0, poisson=0.3,
        interactive_icebergs_on=True, iceberg_bonds_on=True,
        spring_coef=0.00065359477124183, contact_spring_coef=1.e-7,
        contact_distance=4.e3, force_convergence=True,
        convergence_tolerance=1e-4,
        use_broken_bonds_for_substep_contact=True,
        break_bonds_on_sub_steps=True,
        fracture_criterion="stress", frac_thres_scaling=1.,
        frac_thres_n=18.e3, frac_thres_t=100.e3,
        constant_interaction_LW=True, constant_length=3000.,
        constant_width=3000.,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, max_bonds=6,
        hexagonal_icebergs=False).normalized(warn=False)


def build(cfg, n_units=2066, side_el=22, r=1500.0):
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces

    NX = NY = 512
    DXY = 7000.0
    per = side_el * side_el
    n = n_units * per
    cap = 1 << int(np.ceil(np.log2(n + 1)))

    # prototype conglomerate: 22x22 square lattice at 2r spacing
    px, py = np.meshgrid(np.arange(side_el) * 2 * r,
                         np.arange(side_el) * 2 * r, indexing="ij")
    px, py = px.ravel(), py.ravel()

    grid_ext = NX * DXY
    uside = int(np.ceil(np.sqrt(n_units)))
    pitch = (grid_ext - 4 * DXY - side_el * 2 * r) / uside
    lon, lat = [], []
    for u in range(n_units):
        ox = 2 * DXY + (u % uside) * pitch
        oy = 2 * DXY + (u // uside) * pitch
        lon.append(px + ox)
        lat.append(py + oy)
    lon = np.concatenate(lon)
    lat = np.concatenate(lat)

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.25, vo=0.05, ua=5.0, sst=-2.0,
                              sss=34.0)
    st = ibt.create_bergs(cap, lon=lon, lat=lat,
                          uvel=np.full(n, 0.22), vvel=np.zeros(n),
                          mass=850. * 200. * (2 * r) ** 2, thickness=200.,
                          width=2 * r, length=2 * r, mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1, max_bonds=6)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # bond the prototype once and replicate with slot offsets
    pst = ibt.create_bergs(1 << int(np.ceil(np.log2(per + 1))),
                           lon=px, lat=py, mass=1., thickness=200.,
                           width=2 * r, length=2 * r, mass_scaling=1.,
                           max_bonds=6)
    pst = forces.initialize_bonds_host(pst, cfg)
    pbond = np.asarray(pst.bond_idx)[:per]
    pblen = np.asarray(pst.bond_length)[:per]
    bond_idx = np.full((cap, 6), -1, np.int32)
    bond_len = np.zeros((cap, 6))
    cong = np.zeros((cap,), np.int32)
    offs = (np.arange(n_units) * per)[:, None, None]
    bond_idx[:n] = np.where(pbond[None] >= 0, pbond[None] + offs,
                            -1).reshape(n, 6)
    bond_len[:n] = np.broadcast_to(pblen[None], (n_units, per, 6)
                                   ).reshape(n, 6)
    cong[:n] = np.repeat(np.arange(n_units) + 1, per)
    st = st.replace(bond_idx=jnp.asarray(bond_idx),
                    bond_length=jnp.asarray(bond_len, st.dtype),
                    conglom_id=jnp.asarray(cong))
    st = forces.count_bonds(st)
    return grid, frc, st, n


def main(sub_steps=60, inner=2, reps=2, vmem=True, block_n=1024):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import icebergs_tpu as ibt
    from icebergs_tpu.model import make_multi_step

    cfg = config(sub_steps)
    grid, frc, st, n = build(cfg)

    # VMEM-resident Part-3: conglomerate-blocked layout + static deltas
    # (ops/dem_vmem.py); falls back to the scan path when the topology
    # is not block-closed
    vmem_kw = {}
    if vmem:
        from icebergs_tpu.ops.dem_vmem import (
            analyze_bond_deltas, pack_conglomerates_blocked)
        st = pack_conglomerates_blocked(st, block_n)
        deltas = analyze_bond_deltas(st.bond_idx, block_n)
        if deltas is not None:
            vmem_kw = dict(mts_substep_kernel="vmem",
                           mts_vmem_deltas=deltas,
                           mts_vmem_block_n=block_n)
        print(f"# vmem substeps: deltas={deltas} block_n={block_n} "
              f"cap={st.capacity}", file=sys.stderr, flush=True)

    nbonds = int(np.asarray(st.n_bonds).sum())
    print(f"# dem_1m: {n} elements, {nbonds} directed bonds, "
          f"{sub_steps} substeps, cap {st.capacity}", file=sys.stderr,
          flush=True)

    # fallback chain mirrors bench.py's headline: if a Pallas kernel is
    # rejected by this backend's toolchain, degrade (pallas spread ->
    # scatter, vmem -> scan, fused Part-1 -> tables) rather than losing
    # the metric.  The pallas segment-sum spreading replaced the
    # round-2 slot scatters in the pair-contact headline (426 -> 86 ms
    # at 1M) but the DEM bench had never been switched over.
    attempts = [dict(mts_neighbor_mode="fused", spread="pallas",
                     interp_table=True, **vmem_kw),
                dict(mts_neighbor_mode="fused", spread="pallas",
                     **vmem_kw),
                dict(mts_neighbor_mode="fused", **vmem_kw),
                dict(mts_neighbor_mode="fused"),
                dict(mts_neighbor_mode="tables")]
    multi = s = None
    # leave-one-out probes (KID_DEM_PROBE=nospread|nothermo):
    # measurement-only phase ablations for the outer-step budget
    probe = os.environ.get("KID_DEM_PROBE", "")
    probe_kw = dict(with_spread=False) if probe == "nospread" else {}
    if probe == "nopart1":
        # MEASUREMENT ONLY: skip the Part-1 slow solve + half-kick
        # (skip_first_outer_mts_step) — isolates the Part-1 search +
        # eval cost from interp/part3/bookkeeping
        cfg = cfg.replace(skip_first_outer_mts_step=True)
    for kw in attempts:
        kw = dict(kw)
        it = kw.pop("interp_table", False)
        # fallback cap 65536: the 1M world has ~32k Part-1 fallback rows
        # (elements with >= 3 cross-conglomerate partners at cd=4 km —
        # measured by the round-5 drop counter; the old 4096 cap was
        # silently dropping ~28k of them).  Starting at the known-exact
        # size avoids the grow ladder's compile-per-step; growth on
        # evidence still guards it.
        mcfg = cfg.replace(slot_sum_method=kw.pop("spread", "scatter"),
                           interp_mode="table" if it else "xla",
                           pack_kernel=it,
                           fused_fallback_cap=65536)
        try:
            multi = make_multi_step(grid, mcfg, inner, with_stats=True,
                                    with_thermo=probe != "nothermo",
                                    **probe_kw, **kw)
            out = multi(st, frc)
            s = out[0]
            _ = np.asarray(s.lon[:1].ravel())
            # exactness: grow the Part-1 fallback cap on drop evidence
            for _g in range(3):
                drops = int(np.asarray(out[1]))
                if drops == 0:
                    break
                fb2 = min(4 * mcfg.fused_fallback_cap, st.capacity)
                print(f"# dem_1m: P1 fallback overran (drops={drops}); "
                      f"growing cap to {fb2}", file=sys.stderr,
                      flush=True)
                mcfg = mcfg.replace(fused_fallback_cap=fb2)
                multi = make_multi_step(grid, mcfg, inner,
                                        with_stats=True,
                                        with_thermo=probe != "nothermo",
                                        **probe_kw, **kw)
                out = multi(st, frc)
                s = out[0]
                _ = np.asarray(s.lon[:1].ravel())
            break
        except Exception as e:      # pragma: no cover - hw-dependent
            print(f"# dem_1m: config {kw.get('mts_neighbor_mode')}"
                  f"/{kw.get('mts_substep_kernel', 'scan')} failed"
                  f" ({e}); falling back", file=sys.stderr, flush=True)
            multi = s = None
    if multi is None:
        raise RuntimeError("no dem_1m config compiled")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = multi(s, frc)
        s = out[0]
        _ = np.asarray(s.lon[:1].ravel())
    dt_wall = (time.perf_counter() - t0) / (reps * inner)
    drops_final = int(np.asarray(out[1]))
    if drops_final:
        print(f"# dem_1m: WARNING drops={drops_final} in the measured "
              "window (inexact run)", file=sys.stderr, flush=True)

    # identity-scan dispatch floor with the identical call/sync shape
    # (the tunneled runtime's per-dispatch cycle drifts 0.1-3.5 s
    # between windows; at inner=2 an unsubtracted floor inflates the
    # outer-step time by floor/2 — same honesty fix as bench.py)
    import jax.numpy as jnp

    @jax.jit
    def null_multi(state):
        def body(c, _):
            return c.replace(uvel=c.uvel + 1e-30), None
        o, _ = jax.lax.scan(body, state, None, length=inner)
        return o

    try:
        ns = null_multi(s)
        _ = np.asarray(ns.lon[:1].ravel())
        t0 = time.perf_counter()
        for _ in range(reps):
            ns = null_multi(ns)
            _ = np.asarray(ns.lon[:1].ravel())
        floor = (time.perf_counter() - t0) / (reps * inner)
    except Exception:               # never lose the metric to the probe
        floor = 0.0
    dt_dev = max(dt_wall - floor, 0.2 * dt_wall)
    esps = n * sub_steps / dt_dev
    out = {
        "metric": "dem_1m_element_substeps_per_sec",
        "value": round(esps, 1),
        "unit": "element-substeps/s/chip",
        "s_per_outer_step": round(dt_dev, 4),
        "raw_s_per_outer_step": round(dt_wall, 4),
        "dispatch_floor_s": round(floor, 4),
        "elements": n,
        "substeps": sub_steps,
    }
    print(json.dumps(out), file=sys.stderr, flush=True)
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    ss = int(args[0]) if args else 60
    main(ss, vmem="--no-vmem" not in sys.argv)
