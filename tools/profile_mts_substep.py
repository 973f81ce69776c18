"""Per-piece substep attribution for the MTS/DEM loop at bench_mts scale.

Each piece runs as its own lax.scan over N_SUB iterations with the state
chained through and a host readback for sync (block_until_ready does not
synchronize on the tunneled backend).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SUB = 4


def scan_timeit(fn, arg, reps=2):
    import jax

    @jax.jit
    def many(a):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, a, None, length=N_SUB)
        return out

    out = many(arg)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(out)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / (reps * N_SUB)


def main(n_target=20000):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces, dem as _dem
    from icebergs_tpu import mts as _mts
    import makeberg

    # same world as bench_mts
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=3600.0, mts=True, mts_sub_steps=60,
        explicit_inner_mts=True, dem=True, dem_spring_coef=5.e6,
        dem_damping_coef=1.0, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=1.e-5,
        contact_spring_coef=1.e-8, contact_distance=2000.,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        max_bonds=6, hexagonal_icebergs=False).normalized(warn=False)

    r = 400.0
    proto = makeberg.gen_hexpack(r, shape="circle", R=3e3)
    per = len(proto["lon"])
    n_units = max(1, n_target // per)
    side = int(np.ceil(np.sqrt(n_units)))
    NX = NY = 256
    DXY = 2000.0
    pitch = (NX - 4) * DXY / side
    lon, lat = [], []
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
                          mass_scaling=1.0, id_cnt=np.arange(n) + 1,
                          max_bonds=6)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    pst = ibt.create_bergs(64, lon=proto["lon"], lat=proto["lat"],
                           mass=1., thickness=100.,
                           width=float(proto["width"][0]),
                           length=float(proto["length"][0]),
                           mass_scaling=1., max_bonds=6)
    pst = forces.initialize_bonds_host(pst, cfg)
    pbond = np.asarray(pst.bond_idx)[:per]
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
    print("device:", jax.devices()[0], "n:", n, flush=True)

    # frozen pair list like evolve_icebergs_mts part 3
    nbr = forces.build_neighbor_tables(
        st, grid, cfg, ncells_radius=forces.neighbor_radius(grid, cfg))
    nbr40 = forces.build_neighbor_tables(
        st, grid, cfg, max_per_cell=40,
        ncells_radius=forces.neighbor_radius(grid, cfg))
    pair_cap = 1 << int(np.ceil(np.log2(n * 16)))
    me_p, ot_p, pv_p, pov, _sd = _mts.compact_conglom_pairs(st, nbr, pair_cap,
                                                       cfg=cfg, dt=cfg.dt)
    print("pair_cap:", pair_cap, "npair:",
          int(np.asarray(jnp.sum(pv_p.astype(jnp.int32)))),
          "overflow:", int(np.asarray(pov)), flush=True)
    pairs = (me_p, ot_p, pv_p)
    dtf = cfg.dt / cfg.n_sub_steps

    def f_drift_kick(s):
        u2 = s.uvel + 0.5 * dtf * (s.axn_fast + s.bxn_fast)
        v2 = s.vvel + 0.5 * dtf * (s.ayn_fast + s.byn_fast)
        from icebergs_tpu.dynamics import _advance_position
        lonn, latn = _advance_position(grid, cfg, s.lon, s.lat, u2, v2, dtf)
        return s.replace(lon=lonn, lat=latn, uvel=u2, vvel=v2)

    def f_bond_forces(s):
        out = _dem.dem_bond_forces(s, cfg, dtf, onehot=None)
        return s.replace(uvel=s.uvel + 1e-12 * out.F_x,
                         vvel=s.vvel + 1e-12 * out.F_y)

    def f_pair_contact(s):
        pm = _mts._pair_contact_masks(s, me_p, ot_p, pv_p, cfg)
        c = _dem.dem_contact_forces_pairs(s, cfg, me_p, ot_p, pm)
        return s.replace(uvel=s.uvel + 1e-12 * c[0],
                         vvel=s.vvel + 1e-12 * c[1])

    def f_broken_bond_contact(s):
        bo = jnp.maximum(s.bond_idx, 0)
        bm = (s.bond_idx >= 0) & (s.bond_broken == 1) \
            & s.alive[:, None] & s.alive[bo]
        c = _dem.dem_contact_forces(s, cfg, bo, bm)
        return s.replace(uvel=s.uvel + 1e-12 * c[0],
                         vvel=s.vvel + 1e-12 * c[1])

    def f_fracture(s):
        s2, nb = _dem.break_bonds_dem(s, cfg)
        return s2

    def f_substep_forces(s):
        axn, ayn, ang, bu = _mts._substep_forces(s, nbr, cfg, dtf,
                                                 onehot=None, pairs=pairs)
        return s.replace(uvel=s.uvel + 1e-12 * axn,
                         vvel=s.vvel + 1e-12 * ayn)

    def f_full_substep(s):
        # mirror the scan body via evolve path pieces: forces + updates
        axn, ayn, ang, bu = _mts._substep_forces(s, nbr, cfg, dtf,
                                                 onehot=None, pairs=pairs)
        u3 = s.uvel + dtf * 0.5 * axn
        v3 = s.vvel + dtf * 0.5 * ayn
        s = s.replace(uvel=u3, vvel=v3, ang_accel=ang,
                      axn_fast=axn, ayn_fast=ayn)
        if bu is not None:
            s = s.replace(bond_length=bu.bond_length,
                          bond_nstress=bu.nstress, bond_sstress=bu.sstress)
        s2, nb = _dem.break_bonds_dem(s, cfg)
        return f_drift_kick(s2)

    def f_nbr_build(s):
        nbr2 = forces.build_neighbor_tables(
            s, grid, cfg, ncells_radius=forces.neighbor_radius(grid, cfg))
        return s.replace(uvel=s.uvel + 1e-12 * nbr2.cand_idx[:, 0])

    def f_part1_once(s):
        ia_fn = forces.make_ia_fn(s, nbr, cfg, mts_part=1,
                                  contact_cap=max(4096, n // 4))
        ax, ay, axn, ayn, bxn, byn, fdc = _mts._slow_accel_mts(s, cfg,
                                                               ia_fn)
        return s.replace(uvel=s.uvel + 1e-12 * ax,
                         vvel=s.vvel + 1e-12 * ay)

    def f_compact_pairs(s):
        me2, ot2, pv2, _, _sd = _mts.compact_conglom_pairs(s, nbr, pair_cap,
                                                      cfg=cfg, dt=cfg.dt)
        return s.replace(uvel=s.uvel + 1e-12 * me2[0])

    def f_nbr40_build(s):
        nbr2 = forces.build_neighbor_tables(
            s, grid, cfg, max_per_cell=40,
            ncells_radius=forces.neighbor_radius(grid, cfg))
        return s.replace(uvel=s.uvel + 1e-12 * nbr2.cand_idx[:, 0])

    def f_compact_pairs40(s):
        me2, ot2, pv2, _, _sd = _mts.compact_conglom_pairs(s, nbr40, pair_cap,
                                                      cfg=cfg, dt=cfg.dt)
        return s.replace(uvel=s.uvel + 1e-12 * me2[0])

    def f_part1_once40(s):
        ia_fn = forces.make_ia_fn(s, nbr40, cfg, mts_part=1,
                                  contact_cap=max(4096, n // 4))
        ax, ay, axn, ayn, bxn, byn, fdc = _mts._slow_accel_mts(s, cfg,
                                                               ia_fn)
        return s.replace(uvel=s.uvel + 1e-12 * ax,
                         vvel=s.vvel + 1e-12 * ay)

    def f_outer_sub60(s):
        s2, _d = _mts.evolve_icebergs_mts(s, grid, frc, cfg,
                                          pair_cap=pair_cap,
                                          contact_cap=max(4096, n // 4))
        return s2

    def f_outer_sub0(s):
        import dataclasses as _dc
        cfg1 = _dc.replace(cfg, mts_sub_steps=0)
        s2, _d = _mts.evolve_icebergs_mts(s, grid, frc, cfg1,
                                          pair_cap=pair_cap,
                                          contact_cap=max(4096, n // 4))
        return s2

    for name, fn in (("nbr_build", f_nbr_build),
                     ("nbr40_build", f_nbr40_build),
                     ("part1_once", f_part1_once),
                     ("part1_once40", f_part1_once40),
                     ("compact_pairs", f_compact_pairs),
                     ("outer_sub60_evolve_only", f_outer_sub60),
                     ("outer_sub0", f_outer_sub0),
                     ("drift_kick", f_drift_kick),
                     ("bond_forces", f_bond_forces),
                     ("pair_contact", f_pair_contact),
                     ("broken_bond_contact", f_broken_bond_contact),
                     ("fracture", f_fracture),
                     ("substep_forces_all", f_substep_forces),
                     ("full_substep", f_full_substep)):
        try:
            t = scan_timeit(fn, st)
            print(f"{name}: {t*1e3:.2f} ms/substep", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
