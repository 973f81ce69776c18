"""Stand-alone driver: the TPU equivalent of ``driver/icebergs_driver.F90``.

Reads the reference's ``input.nml`` (both ``icebergs_driver_nml`` and
``icebergs_nml``), builds the synthetic grid + forcing of the test cases
(uniform Cartesian or A68 lat-lon grid; converging collision jet
driver:313-327; Gaussian grounding bump 288-307; footloose jet 309-311),
loads ``icebergs.res.nc``/``bonds_iceberg.res.nc`` initial conditions from
the makeberg tooling, runs the time loop, and writes restarts +
trajectories.

CLI:  python -m icebergs_tpu.driver --nml input.nml [--input-dir DIR]
          [--output-dir DIR] [--capacity N]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_grid_and_forcing(cfg, drv, dtype=None):
    """Synthetic grid + forcing from icebergs_driver_nml
    (driver/icebergs_driver.F90:196-328)."""
    import jax.numpy as jnp
    from . import forcing as F
    from . import grid as G

    if dtype is None:
        dtype = jnp.float32

    ni = int(drv.get("ni", 20))
    nj = int(drv.get("nj", 20))
    gridres = float(drv.get("gridres", 1000.0))
    ibuo = float(drv.get("ibuo", 0.0))
    ibvo = float(drv.get("ibvo", 0.0))
    ibui = float(drv.get("ibui", 0.0))
    ibvi = float(drv.get("ibvi", 0.0))
    ibua = float(drv.get("ibua", 0.0))
    # the reference names the meridional wind "ibuy" (driver:74); accept
    # ibva as an alias
    ibva = float(drv.get("ibuy", drv.get("ibva", 0.0)))
    sst0 = float(drv.get("sst", -2.0))

    if cfg.grid_is_latlon:
        # simple lat-lon box (the A68 case reads its grid from file)
        lon0 = float(drv.get("lon0", 0.0))
        lat0 = float(drv.get("lat0", -70.0))
        dll = float(drv.get("dlonlat", 0.125))
        grid = G.make_uniform_grid(ni, nj, lon0, lat0, dll, dll,
                                   grid_is_latlon=True, Rearth=cfg.Rearth,
                                   dtype=dtype)
    else:
        grid = G.make_uniform_grid(ni, nj, 0.0, 0.0, gridres, gridres,
                                   grid_is_latlon=False, dtype=dtype)

    frc = F.uniform_forcing(grid.nx, grid.ny, uo=ibuo, vo=ibvo, ui=ibui,
                            vi=ibvi, ua=ibua, va=ibva, sst=sst0, sss=33.0,
                            dtype=dtype)

    xc = gridres * np.arange(ni + 1)[:, None] * np.ones((1, nj + 1))
    yc = gridres * np.arange(nj + 1)[None, :] * np.ones((ni + 1, 1))

    if drv.get("collision_test"):
        # converging meridional jet toward y=mid (driver:313-327)
        mid = 10.e3
        vo = np.where((xc > mid) | (xc <= 0.) | (yc == mid), 0.,
                      np.where(yc > mid, -ibvo, ibvo))
        frc = frc.replace(vo=jnp.asarray(vo, dtype))
    if drv.get("fl_test"):
        vo = np.where(xc > 10000., -ibvo, ibvo)
        frc = frc.replace(vo=jnp.asarray(vo, dtype))
    if drv.get("big_grounding_test"):
        # Gaussian seamount bathymetry + N/S land strips (driver:288-307):
        # height a = 1000 - bump_depth, width c = 5 km, center (63, 60) km
        xm = gridres * (np.arange(ni) + 0.5)
        ym = gridres * (np.arange(nj) + 0.5)
        X, Y = np.meshgrid(xm, ym, indexing="ij")
        a = 1000.0 - float(drv.get("bump_depth", 0.0))
        c = 5.e3
        bump = a * np.exp(-((X - 63.e3) ** 2 + (Y - 60.e3) ** 2)
                          / (2. * c * c))
        od = np.pad(1000.0 - bump, 1)
        grid = grid.replace(ocean_depth=jnp.asarray(od, dtype))
        msk2 = np.asarray(grid.msk).copy()
        land = (Y <= -5.e3) | (Y >= 220.e3)
        msk2[1:-1, 1:-1] = np.where(land, 0.0, msk2[1:-1, 1:-1])
        grid = grid.replace(msk=jnp.asarray(msk2, dtype))
    else:
        # default deep ocean so nothing grounds spuriously
        grid = grid.replace(ocean_depth=jnp.full_like(grid.ocean_depth,
                                                      1000.0))
    # the reference driver hands ibua/ibuy to icebergs_run through the
    # WIND-STRESS slots (tauxa/tauya, driver:225 + icebergs_driver:389),
    # so the interface layer applies: stress -> velocity inversion unless
    # tau_is_velocity, Kelvin SST autodetect, NaN scrub
    # (icebergs.F90:5236-5383).  B-grid staggering is an identity here.
    from .api import prepare_forcing
    frc = prepare_forcing(grid, cfg, frc)
    return grid, frc


def run(nml_path: str, input_dir: str = ".", output_dir: str = ".",
        capacity: int = 4096, verbose: bool = True,
        neighbor_window: str = "auto", mts_pair_cap: int = None,
        dtype: str = "float32", substep_kernel: str = "auto",
        clocks: bool = False, cfg_overrides: dict = None):
    """Main loop (driver/icebergs_driver.F90:339-444).

    ``dtype="float64"`` runs the whole model in double precision (the
    reference's implicit ``-r8``): enables jax_enable_x64 and threads
    f64 through grid/forcing/state construction.
    """
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize force-registers the axon TPU
        # plugin and overrides the env var; the config knob wins
        jax.config.update("jax_platforms", "cpu")
    if dtype in ("float64", "f64"):
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    fdtype = jnp.float64 if dtype in ("float64", "f64") else jnp.float32
    from .io.namelist import config_from_namelist
    from .io import restart as rio
    from .io import trajectory as tio
    from . import model, diag
    from .ops import forces as FO
    from .calving import init_calving_state

    if not os.path.exists(nml_path):
        raise SystemExit(f"icebergs_tpu.driver: namelist not found: "
                         f"{nml_path}")
    cfg, drv = config_from_namelist(nml_path)
    if cfg_overrides:
        cfg = cfg.replace(**cfg_overrides)
    # transient A68 hindcast (driver:254-272, 368-385): hourly GFDL
    # forcing files from data_dir, 30-min or 1-hr steps
    a68_data = None
    start_ind = int(drv.get("transient_a68_data_start_ind", 0))
    if drv.get("a68_test") and start_ind > 0:
        from .io import a68 as a68io
        if cfg.dt not in (1800.0, 3600.0):
            raise SystemExit("icebergs_tpu.driver: transient A68 data "
                             "requires ibdt of 30 min or 1 hr")
        data_dir = str(drv.get("data_dir", input_dir))
        a68_data = a68io.load_a68(data_dir, cfg)
        grid = a68_data.grid
        frc = a68io.forcing_at_hour(a68_data, start_ind - 1)
        print(f"KID-TPU driver: transient A68 forcing from {data_dir} "
              f"({a68_data.n_hours} hourly frames, start index "
              f"{start_ind})")
    else:
        grid, frc = build_grid_and_forcing(cfg, drv, dtype=fdtype)
    # bathymetry from topog.nc when provided (read_ocean_depth,
    # icebergs_fms2io.F90:1600-1629)
    grid = rio.read_ocean_depth(os.path.join(input_dir, "topog.nc"), grid)

    berg_restart = os.path.join(input_dir, "icebergs.res.nc")
    if os.path.exists(berg_restart):
        st = rio.read_restart_bergs(berg_restart, capacity, grid, cfg,
                                    dtype=fdtype)
    elif cfg.generate_test_icebergs:
        # debug generator: 4 bergs spread over the domain
        # (generate_bergs, icebergs_fms2io.F90:1051-1154)
        import numpy as _np
        from .grid import pos_to_cell
        from . import create_bergs
        fx = _np.array([0.3, 0.7, 0.3, 0.7]) * grid.nx
        fy = _np.array([0.3, 0.3, 0.7, 0.7]) * grid.ny
        lon = float(grid.lon0) + fx * float(grid.dlon)
        lat = float(grid.lat0) + fy * float(grid.dlat)
        st = create_bergs(capacity, lon=lon, lat=lat, mass=8.8e7,
                          thickness=40., width=182., length=273.,
                          mass_scaling=1.0, id_cnt=_np.arange(4) + 1)
        Lx = cfg.Lx if cfg.grid_is_latlon else -1.
        i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, Lx)
        st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    elif cfg.require_restart:
        raise SystemExit(f"no initial bergs found at {berg_restart}")
    else:
        from . import empty_state
        st = empty_state(capacity, max_bonds=cfg.max_bonds,
                         dtype=fdtype)
    if cfg.static_icebergs:
        # Static_icebergs master switch: hold every berg in place
        # (icebergs_framework.F90:826; static_berg honored per-berg in
        # the momentum update)
        import jax.numpy as _jnp
        st = st.replace(static_berg=_jnp.ones_like(st.static_berg))
    # constant-L/W interactions: derive the constants from the loaded
    # elements when the namelist left them 0 (icebergs.F90:175-177)
    cfg = FO.set_constant_interaction_length_and_width(cfg, st)
    bond_restart = os.path.join(input_dir, "bonds_iceberg.res.nc")
    if cfg.iceberg_bonds_on and os.path.exists(bond_restart):
        st = rio.read_restart_bonds(bond_restart, st, cfg)
    elif cfg.iceberg_bonds_on and cfg.manually_initialize_bonds:
        st = FO.initialize_bonds_host(st, cfg)
    calving_restart = os.path.join(input_dir, "calving.res.nc")
    calv = init_calving_state(grid)
    if os.path.exists(calving_restart):
        calv = rio.read_restart_calving(calving_restart, calv, grid)

    ibdt = cfg.dt
    ibhrs = float(drv.get("ibhrs", 24))
    nmax = int(drv.get("nmax", 10 ** 9))
    nsteps = min(int(round(ibhrs * 3600.0 / ibdt)), nmax)
    traj_every = max(1, int(round(cfg.traj_sample_hrs * 3600.0 / ibdt)))

    if neighbor_window == "auto":
        # the quadrant (2x2) candidate window is an equal superset only
        # when the pair cutoff is below half a cell
        neighbor_window = ("quadrant" if FO.can_use_quadrant_window(
            st, grid, cfg) and not cfg.mts
            and FO.neighbor_radius(grid, cfg) == 1 else "full")
        if verbose and neighbor_window == "quadrant":
            print("KID-TPU driver: using the quadrant neighbor window")
    # VMEM-resident substep kernel: when the production DEM flag set
    # applies (broken-bond-only substep contact, explicit inner steps)
    # and the bond topology packs into block-closed conglomerate blocks,
    # run the whole fast loop in one Pallas kernel (ops/dem_vmem.py).
    # Bonds never form mid-run (reference inits them at start/restart
    # only), spawned/footloose bergs are unbonded, and the driver is
    # single-device, so the layout contract holds for the whole run.
    vmem_kw = {}
    import jax as _jax
    on_tpu = _jax.devices()[0].platform in ("tpu", "axon")
    want_vmem = (substep_kernel == "vmem"
                 or (substep_kernel == "auto" and on_tpu
                     and dtype == "float32"))   # no f64 Mosaic on TPU
    if want_vmem and cfg.mts and cfg.dem and cfg.iceberg_bonds_on \
            and cfg.n_sub_steps > 0:
        from .ops import dem_vmem as _dv
        lat_np = np.asarray(st.lat)[np.asarray(st.alive)]
        safe_lat = (not cfg.grid_is_latlon or lat_np.size == 0
                    or float(np.max(lat_np)) < 85.0)
        if _dv.supports_vmem_substeps(cfg) and safe_lat:
            # single VMEM block up to 4096 slots (rounded up to the
            # 128-lane tile), 1024-blocks beyond; packing may grow the
            # capacity to fill whole blocks
            bn = -(-st.capacity // 128) * 128 if st.capacity <= 4096 \
                else 1024
            try:
                st2 = _dv.pack_conglomerates_blocked(st, bn)
                deltas = _dv.analyze_bond_deltas(st2.bond_idx, bn)
            except ValueError:
                deltas = None
            if deltas and (st2.capacity == bn or bn % 1024 == 0):
                st = st2
                vmem_kw = dict(
                    mts_substep_kernel="vmem", mts_vmem_deltas=deltas,
                    mts_vmem_block_n=bn,
                    mts_vmem_interpret=not on_tpu)
                if verbose:
                    print(f"KID-TPU driver: VMEM substep kernel on "
                          f"(block_n={bn}, deltas={deltas}, "
                          f"capacity={st.capacity})")
    if (mts_pair_cap is None and cfg.mts and cfg.dem
            and not cfg.use_broken_bonds_for_substep_contact
            and "mts_substep_kernel" not in vmem_kw
            and int(np.asarray(jnp.sum(st.alive))) > 0):
        # auto-size the frozen substep pair list from the concrete ICs
        # (PLAN round-3 gap 2) — only the use_broken_bonds=False regime
        # runs substep contacts off the (N, M) superset
        from .mts import auto_pair_cap
        from .ops import forces as _fo
        nbr0 = _fo.build_neighbor_tables(
            st, grid, cfg, max_per_cell=16,
            ncells_radius=_fo.neighbor_radius(grid, cfg))
        mts_pair_cap = auto_pair_cap(st, nbr0, cfg)
        if verbose:
            print(f"KID-TPU driver: auto mts_pair_cap={mts_pair_cap}")
    fused_fb_cap = cfg.fused_fallback_cap
    mts_nbr_mode = [None]        # None -> make_step's production default

    def _build_step(pair_cap, fb_cap):
        return model.make_step(grid, cfg, with_thermo=True,
                               neighbor_window=neighbor_window,
                               mts_pair_cap=pair_cap,
                               mts_neighbor_mode=mts_nbr_mode[0],
                               fused_fallback_cap=fb_cap, **vmem_kw)

    step = _build_step(mts_pair_cap, fused_fb_cap)
    buf = tio.init_traj_buffer(st.capacity,
                               nsamples=max(2, nsteps // traj_every + 2),
                               cfg=cfg)
    bond_buf = tio.init_bond_traj_buffer(
        st.capacity, cfg.max_bonds,
        nsamples=max(2, nsteps // traj_every + 2)) \
        if cfg.save_bond_traj else None
    from .diagnostics import (DiagManager, collect_step_fields,
                              collect_forcing_fields)
    dmgr = DiagManager(grid)     # full reference catalog
    dstate = dmgr.init_state()
    verbose_every = max(1, int(round(cfg.verbose_hrs * 3600.0 / ibdt)))

    ffields = collect_forcing_fields(frc, grid)
    ffields_frc = frc
    b0 = diag.compute_budgets(st, calv)
    b_prev = b0
    t_wall = time.time()
    melt_total = 0.0
    melt_interval = 0.0
    # mpp_clock analog (icebergs_framework.F90:896-908): per-phase wall
    # clocks; the momentum+thermo phase blocks on the device so it
    # measures device time, not dispatch time — only when asked for
    # (--clocks), since the sync serializes the async pipeline
    ck = diag.PhaseClocks() if clocks else None
    # interval source/sink accumulators for the category-resolved
    # budget tables (report_full_budget, the reference's lbudget block)
    acc = diag.IntervalBudget()
    for n in range(nsteps):
        if ck:
            ck.begin("Icebergs-interface")
        if a68_data is not None:
            # hourly frame selection (driver:368-385): ns2 advances by
            # dt/3600 per step; half-hour steps blend the velocity fields
            # 0.5*(prev + next frame) while SSH takes the floor frame
            from .io import a68 as a68io
            ns2 = 1.0 + n * cfg.dt / 3600.0
            if cfg.dt == 3600.0 or float(ns2).is_integer():
                frc = a68io.forcing_at_hour(
                    a68_data, start_ind + int(ns2) - 2)
            else:
                import math
                fnew = a68io.forcing_at_hour(
                    a68_data, start_ind + math.ceil(ns2) - 2)
                frc = frc.replace(
                    ua=0.5 * (frc.ua + fnew.ua),
                    va=0.5 * (frc.va + fnew.va),
                    uo=0.5 * (frc.uo + fnew.uo),
                    vo=0.5 * (frc.vo + fnew.vo),
                    ssh=a68io.forcing_at_hour(
                        a68_data, start_ind + int(ns2) - 2).ssh)
        if ck:
            ck.end("Icebergs-interface")
            ck.begin("Icebergs-step")
        def _call_step(s):
            if cfg.footloose:
                # deterministic per-step placement stream (the reference
                # seeds per berg id; fold_in(step) keeps restarts and
                # layouts reproducible)
                return step(s, frc, fl_key=jax.random.fold_in(
                    jax.random.PRNGKey(7), n),
                    current_yearday=jnp.asarray(n * ibdt / 86400.,
                                                jnp.float32))
            return step(s, frc)

        st_prev = st
        if n == 0:
            # fast-lane fallback chain (VERDICT r4 #3): if a Pallas
            # kernel in the production configuration fails to compile
            # on this backend, rebuild on the plain-XLA slow lane
            try:
                st, diags = _call_step(st)
            except Exception as e:     # pragma: no cover - backend-dep.
                slow = cfg.replace(contact_mode="buckets",
                                   interp_mode="xla",
                                   slot_sum_method="scatter",
                                   sort_packed_permute=False,
                                   pack_kernel=False)
                if slow == cfg and mts_nbr_mode[0] == "tables":
                    raise
                mts_nbr_mode[0] = "tables"
                print(f"KID-TPU driver: fast-lane step failed ({e}); "
                      "falling back to the XLA slow lane", flush=True)
                cfg = slow
                step = _build_step(mts_pair_cap, fused_fb_cap)
                st, diags = _call_step(st)
        else:
            st, diags = _call_step(st)
        # increase_ibuffer analog (icebergs_framework.F90:3710-3747):
        # when a spawn found no free slot or the frozen MTS pair list
        # overflowed, grow the exhausted buffer, rebuild the jitted
        # step (recompile accepted) and RE-RUN this step from the saved
        # pre-step state — overflow is corrected, never just counted.
        for _ in range(3):
            fl_ov = (int(np.asarray(diags.fl_spawn_overflow))
                     if diags.fl_spawn_overflow is not None else 0)
            pair_ov = (int(np.asarray(diags.contact_overflow))
                       if (cfg.mts and mts_pair_cap is not None
                           and diags.contact_overflow is not None) else 0)
            fused_ov = (int(np.asarray(diags.contact_overflow))
                        if (not cfg.mts
                            and diags.contact_overflow is not None) else 0)
            fused_ov += (int(np.asarray(diags.p1_overflow))
                         if diags.p1_overflow is not None else 0)
            if fl_ov == 0 and pair_ov == 0 and fused_ov == 0:
                break
            from .state import grow_capacity
            if fl_ov > 0:
                newcap = max(2 * st_prev.capacity,
                             st_prev.capacity + 4 * fl_ov)
                print(f"KID-TPU driver: slot pool exhausted at step "
                      f"{n + 1} ({fl_ov} spawns denied) — growing "
                      f"capacity {st_prev.capacity} -> {newcap}",
                      flush=True)
                st_prev = grow_capacity(st_prev, newcap)
                buf = tio.grow_traj_buffer(buf, newcap)
                if bond_buf is not None:
                    bond_buf = tio.grow_traj_buffer(
                        bond_buf, newcap * cfg.max_bonds)
            if pair_ov > 0:
                mts_pair_cap = 2 * mts_pair_cap
                print(f"KID-TPU driver: MTS pair list overflowed at "
                      f"step {n + 1} ({pair_ov} pairs) — growing "
                      f"pair cap to {mts_pair_cap}", flush=True)
            if fused_ov > 0:
                # exact-search contract: dropped candidates grow the
                # fallback compaction cap and the step re-runs
                fused_fb_cap = min(4 * fused_fb_cap, st_prev.capacity)
                print(f"KID-TPU driver: contact fallback cap overran "
                      f"at step {n + 1} ({fused_ov} dropped) — growing "
                      f"to {fused_fb_cap}", flush=True)
            step = _build_step(mts_pair_cap, fused_fb_cap)
            st, diags = _call_step(st_prev)
        if ck:
            ck.end("Icebergs-step", sync=st.lon)
            ck.begin("Icebergs-diagnostics")
        if cfg.debug_iceberg_with_id > 0:
            # monitor_a_berg (icebergs_framework.F90:4245-4269)
            from .diagnostics import monitor_a_berg
            monitor_a_berg(st, cfg.debug_iceberg_with_id,
                           label=f"step {n + 1}")
        if diags.floating_melt is not None:
            m = float(np.sum(np.asarray(
                diags.floating_melt * grid.area))) * cfg.dt
            melt_total += m
            melt_interval += m
        if ffields_frc is not frc:     # recompute only on forcing swap
            ffields = collect_forcing_fields(frc, grid)
            ffields_frc = frc
        dstate = dmgr.send_data(dstate, collect_step_fields(
            diags, st=st, cfg=cfg, grid=grid, forcing_fields=ffields,
            extra={"stored_ice": calv.stored_ice,
                   "stored_heat": calv.stored_heat,
                   "running_mean_calving": calv.rmean_calving,
                   "running_mean_calving_hflx": calv.rmean_calving_hflx}))
        if ck:
            ck.end("Icebergs-diagnostics")
        if (n + 1) % traj_every == 0 and not cfg.ignore_traj:
            if ck:
                ck.begin("Icebergs-traj record")
            day = (n + 1) * ibdt / 86400.0
            buf = tio.record_posn(buf, st, cfg, day=day, year=0)
            if cfg.save_bond_traj:
                bond_buf = tio.record_bonds(bond_buf, st, cfg, day=day)
            if ck:
                ck.end("Icebergs-traj record")
        acc.add_step(diags, grid, ibdt)
        if verbose and (n + 1) % verbose_every == 0:
            b_now = diag.compute_budgets(st, calv)
            diag.report_budget(f"hr {((n + 1) * ibdt) / 3600.:.0f}",
                               b_prev, b_now, verbose_every * ibdt,
                               melt_kg=melt_interval)
            diag.report_full_budget(
                f"hr {((n + 1) * ibdt) / 3600.:.0f}", b_prev, b_now, acc)
            acc.reset()
            b_prev = b_now
            melt_interval = 0.0
        if verbose and (n + 1) % max(1, int(drv.get("write_time_inc",
                                                    nsteps // 10))) == 0:
            print(f"step {n + 1}/{nsteps} bergs={int(diags.nbergs)} "
                  f"wall={time.time() - t_wall:.1f}s", flush=True)
        if cfg.debug and (n + 1) % verbose_every == 0:
            diag.check_state(st, grid, cfg, label=f"step {n + 1}")
        if cfg.halo_debugging and (n + 1) % verbose_every == 0:
            diag.dump_halo_state(st, label=f"step {n + 1}")

    b1 = diag.compute_budgets(st, calv)
    diag.report_budget("driver", b0, b1, nsteps * ibdt, melt_kg=melt_total)
    cs, nb = jax.jit(diag.berg_chksum)(st)
    print(f"KID-TPU, bergs_chksum: write_restart berg chksum="
          f"{int(cs)} #={int(nb)}")

    os.makedirs(output_dir, exist_ok=True)
    if ck:
        ck.begin("Icebergs-I/O write")
    if drv.get("saverestart", False):
        rio.write_restart_bergs(os.path.join(output_dir, "icebergs.res.nc"),
                                st, cfg)
        if cfg.iceberg_bonds_on:
            rio.write_restart_bonds(
                os.path.join(output_dir, "bonds_iceberg.res.nc"), st, cfg)
        rio.write_restart_calving(
            os.path.join(output_dir, "calving.res.nc"), calv, grid)
    if not cfg.ignore_traj:
        tio.write_trajectories(os.path.join(output_dir, cfg.traj_name),
                               buf, cfg)
    if cfg.save_bond_traj:
        tio.write_trajectories(os.path.join(output_dir, cfg.bond_traj_name),
                               bond_buf, cfg)
    dmgr.flush(dstate, os.path.join(output_dir, "icebergs_history.nc"),
               time_value=nsteps * ibdt / 86400.)
    if ck:
        ck.end("Icebergs-I/O write")
        ck.report()
    secs = time.time() - t_wall
    sim_days = nsteps * ibdt / 86400.
    if sim_days > 0:
        # the reference driver's per-increment timing line
        # (icebergs_driver.F90:355-366)
        print(f"KID-TPU driver: {secs / sim_days:.1f} s per simulated "
              f"day ({sim_days:.2f} days)")
    print(f"KID-TPU driver: {nsteps} steps in {secs:.1f}s "
          f"({nsteps / max(secs, 1e-9):.2f} steps/s)")
    return st


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nml", required=True)
    p.add_argument("--input-dir", default=".")
    p.add_argument("--output-dir", default=".")
    p.add_argument("--capacity", type=int, default=4096)
    p.add_argument("--neighbor-window", default="auto",
                   choices=("auto", "full", "quadrant"),
                   help="contact candidate window (auto: quadrant when "
                        "the pair cutoff is below half a cell)")
    p.add_argument("--mts-pair-cap", type=int, default=None,
                   help="compact MTS substep contacts to this many pairs "
                        "(size >= same-conglomerate neighbor pairs)")
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "float64"),
                   help="model precision (float64 = the reference's -r8)")
    p.add_argument("--substep-kernel", default="auto",
                   choices=("auto", "scan", "vmem"),
                   help="MTS fast-loop implementation: auto = the "
                        "VMEM-resident Pallas kernel on TPU when the "
                        "bond topology qualifies, lax.scan otherwise")
    p.add_argument("--clocks", action="store_true",
                   help="per-phase wall-clock table at the end of the "
                        "run (mpp_clock analog; syncs the device each "
                        "step, so expect a small slowdown)")
    a = p.parse_args()
    run(a.nml, a.input_dir, a.output_dir, a.capacity,
        neighbor_window=a.neighbor_window, mts_pair_cap=a.mts_pair_cap,
        dtype=a.dtype, substep_kernel=a.substep_kernel, clocks=a.clocks)


if __name__ == "__main__":
    main()
