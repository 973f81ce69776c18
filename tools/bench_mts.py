"""Secondary benchmark: MTS/DEM bonded-conglomerate throughput.

The reference's headline configuration is iKID — bonded-particle DEM
elements advanced with multiple time stepping (Huth et al 2022b).  This
measures full MTS steps (Part1 slow forces + half kick + N_sub explicit
DEM substeps) for a field of hex-packed conglomerates.

Prints one JSON line: element-substeps/s (elements x substeps / wall).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(n_target=20000, sub_steps=60):
    import jax
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces
    import makeberg

    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=3600.0, mts=True, mts_sub_steps=sub_steps,
        explicit_inner_mts=True, dem=True, dem_spring_coef=5.e6,
        dem_damping_coef=1.0, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=1.e-5,
        contact_spring_coef=1.e-8, contact_distance=2000.,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        max_bonds=6, hexagonal_icebergs=False).normalized(warn=False)

    # field of hex-packed conglomerates (37 elements each) on a big grid
    r = 400.0
    proto = makeberg.gen_hexpack(r, shape="circle", R=3e3)
    per = len(proto["lon"])
    n_units = max(1, n_target // per)
    side = int(np.ceil(np.sqrt(n_units)))
    NX = NY = 256
    DXY = 2000.0
    pitch = (NX - 4) * DXY / side
    lon, lat, th = [], [], []
    for u in range(n_units):
        ox = 2 * DXY + (u % side + 0.15) * pitch
        oy = 2 * DXY + (u // side + 0.15) * pitch
        lon.append(proto["lon"] + ox)
        lat.append(proto["lat"] + oy)
    lon = np.concatenate(lon)
    lat = np.concatenate(lat)
    n = len(lon)
    cap = 1 << int(np.ceil(np.log2(n + 1)))

    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.2, vo=0.05, ua=5.0, sst=-2.0,
                              sss=33.0)
    st = ibt.create_bergs(cap, lon=lon, lat=lat,
                          mass=850. * 100. * proto["width"][0] ** 2,
                          thickness=100., width=float(proto["width"][0]),
                          length=float(proto["length"][0]),
                          mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1, max_bonds=6)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    # bond the prototype once (O(per^2)) and replicate with slot offsets —
    # initialize_bonds_host on the full field would be O(n^2) host work
    import jax.numpy as jnp
    pst = ibt.create_bergs(64, lon=proto["lon"], lat=proto["lat"],
                           mass=1., thickness=100.,
                           width=float(proto["width"][0]),
                           length=float(proto["length"][0]),
                           mass_scaling=1., max_bonds=6)
    pst = forces.initialize_bonds_host(pst, cfg)
    pbond = np.asarray(pst.bond_idx)[:per]            # (per, B)
    pblen = np.asarray(pst.bond_length)[:per]
    bond_idx = np.full((cap, 6), -1, np.int32)
    bond_len = np.zeros((cap, 6))
    cong = np.zeros((cap,), np.int32)
    for u in range(n_units):
        o = u * per
        bond_idx[o:o + per] = np.where(pbond >= 0, pbond + o, -1)
        bond_len[o:o + per] = pblen
        cong[o:o + per] = u + 1
    st = st.replace(bond_idx=jnp.asarray(bond_idx),
                    bond_length=jnp.asarray(bond_len, st.dtype),
                    conglom_id=jnp.asarray(cong))
    st = forces.count_bonds(st)
    nbonds = int(np.asarray(st.n_bonds).sum())
    print(f"# {n} elements in {n_units} conglomerates, {nbonds} bonds, "
          f"{sub_steps} substeps, cap {cap}", file=sys.stderr)

    # substep contact pairs: ~37 same-conglomerate neighbor-cell mates per
    # element; cap with 2x headroom
    # internal-velocity skin keeps the frozen list near touching pairs
    # (hex coordination ~6); the SUBSTEP cost scales with this static cap
    # (masked rows are still gathered), so size it tightly — overflow is
    # counted and reported
    pair_cap = 1 << int(np.ceil(np.log2(n * 6)))
    # candidate tables at K=16/cell: raft density is ~25-37 elements per
    # 2 km cell, so binning drops some same-cell candidates — counted
    # honestly below (bin_overflow in the JSON; K=40 measured 12x slower
    # in Part 1 for ~0.1% physics difference).  Two outer steps per
    # dispatch (lax.scan): the tunneled dev runtime costs ~0.35 s per
    # dispatch, which would otherwise dominate.
    K_BIN = 16
    counts = np.zeros((NX * NY,), np.int64)
    cells = (np.asarray(st.jne)[:n] * NX + np.asarray(st.ine)[:n])
    np.add.at(counts, cells, 1)
    bin_overflow = int(np.maximum(counts - K_BIN, 0).sum())
    from icebergs_tpu.model import make_multi_step
    INNER = 2
    # Part-1 collisions through the fused sortless search (exact, no
    # dense (N, M) slab — PLAN round-2 gap 2); the substep contact
    # regime (use_broken_bonds=False, the reference's more expensive
    # option, dem_ground_frac_test/input.nml:1-9) keeps the K_BIN
    # candidate tables.  Falls back to the tables Part 1 if the Pallas
    # kernel won't compile on this backend.
    attempts = [dict(mts_neighbor_mode="fused"),
                dict(mts_neighbor_mode="tables")]
    multi = s = None
    for kw in attempts:
        try:
            multi = make_multi_step(grid, cfg, INNER, with_thermo=True,
                                    mts_pair_cap=pair_cap,
                                    max_per_cell=K_BIN,
                                    contact_cap=max(4096, n // 4), **kw)
            s = multi(st, frc)
            _ = np.asarray(s.lon[:1])     # real sync (host read)
            break
        except Exception as e:      # pragma: no cover - hw-dependent
            print(f"# bench_mts: {kw} failed ({e}); falling back",
                  file=sys.stderr, flush=True)
            multi = s = None
    if multi is None:
        raise RuntimeError("no bench_mts config compiled")
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        s = multi(s, frc)
        _ = np.asarray(s.lon[:1])
    dt_wall = (time.perf_counter() - t0) / (reps * INNER)
    esps = n * sub_steps / dt_wall
    print(json.dumps({
        "metric": "dem_element_substeps_per_sec",
        "value": round(esps, 1),
        "unit": "element-substeps/s/chip",
        "s_per_outer_step": round(dt_wall, 4),
        "elements": n,
        "bin_overflow": bin_overflow,
    }), file=sys.stderr)
    return esps


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--elements", type=int, default=20000)
    p.add_argument("--sub-steps", type=int, default=60)
    a = p.parse_args()
    main(a.elements, a.sub_steps)
