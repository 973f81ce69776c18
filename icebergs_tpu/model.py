"""Top-level model API: the TPU equivalent of ``module ice_bergs``.

``icebergs_run`` (``src/icebergs.F90:5074-5889``) becomes one jit-compiled
``step(state, forcing) -> (state, diagnostics)`` over fixed-capacity slabs.
Sequence (mirroring the reference's call order):

1. interpolate forcing to bergs (``interp_gridded_fields_to_bergs``)
2. evolve momentum + positions (RK4 / Verlet / MTS)
3. cell re-binning (the SoA analog of ``move_berg_between_cells`` +
   ``send_bergs_to_other_pes``; a no-op on one device)
4. thermodynamics (melt, rolling, death)
5. calving (bucket spawning, footloose children)
6. mass spreading to the ocean + diagnostics
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import IcebergsConfig
from .dynamics import evolve_icebergs
from .grid import Grid
from .ops.interp import interp_flds
from .state import BergState


class StepDiags(NamedTuple):
    nbergs: jnp.ndarray
    tickets: jnp.ndarray
    bounced: jnp.ndarray
    total_mass: jnp.ndarray          # sum alive mass*mass_scaling (kg)
    contact_overflow: Optional[jnp.ndarray] = None  # fused-path cap drops
    contact_fallback: Optional[jnp.ndarray] = None  # bergs on exact fallback
    p1_overflow: Optional[jnp.ndarray] = None  # MTS Part-1 fallback drops
    nbergs_calved_fl: Optional[jnp.ndarray] = None  # footloose children
    fl_spawn_overflow: Optional[jnp.ndarray] = None  # slots exhausted
    # interval-budget scalars (diag.IntervalBudget / report_full_budget):
    # strict per-category sources/sinks in kg this step
    nbergs_melted: Optional[jnp.ndarray] = None
    nbergs_deleted_fl: Optional[jnp.ndarray] = None  # fully-fl-calved
    net_melt_kg: Optional[jnp.ndarray] = None
    berg_melt_kg: Optional[jnp.ndarray] = None
    bergy_src_kg: Optional[jnp.ndarray] = None
    bergy_melt_kg: Optional[jnp.ndarray] = None
    fl_bits_melt_kg: Optional[jnp.ndarray] = None
    flb_bergy_melt_kg: Optional[jnp.ndarray] = None
    flb_internal_eros_kg: Optional[jnp.ndarray] = None
    fl_bits_src: Optional[jnp.ndarray] = None       # (nx+2,ny+2) kg/m2/s
    fl_to_berg_kg: Optional[jnp.ndarray] = None     # fl bits -> new berg
    flb_to_bergy_kg: Optional[jnp.ndarray] = None   # fl bergy -> bergy
    floating_melt: Optional[jnp.ndarray] = None   # (nx+2,ny+2) kg/m2/s
    calving_hflx: Optional[jnp.ndarray] = None    # W/m2
    berg_melt: Optional[jnp.ndarray] = None
    spread_mass: Optional[jnp.ndarray] = None
    spread_area: Optional[jnp.ndarray] = None
    spread_uvel: Optional[jnp.ndarray] = None
    spread_vvel: Optional[jnp.ndarray] = None
    ustar_iceberg: Optional[jnp.ndarray] = None
    mass_on_ocean: Optional[jnp.ndarray] = None
    net_melt_heat: Optional[jnp.ndarray] = None
    # extended gridded diagnostics (unused ones are DCE'd under jit)
    melt_buoy: Optional[jnp.ndarray] = None
    melt_eros: Optional[jnp.ndarray] = None
    melt_conv: Optional[jnp.ndarray] = None
    bergy_src: Optional[jnp.ndarray] = None
    bergy_melt: Optional[jnp.ndarray] = None
    fl_bits_melt: Optional[jnp.ndarray] = None
    fl_parent_melt: Optional[jnp.ndarray] = None
    fl_child_melt: Optional[jnp.ndarray] = None
    melt_buoy_fl: Optional[jnp.ndarray] = None
    melt_eros_fl: Optional[jnp.ndarray] = None
    melt_conv_fl: Optional[jnp.ndarray] = None
    melt_by_class: Optional[jnp.ndarray] = None
    u_iceberg: Optional[jnp.ndarray] = None
    v_iceberg: Optional[jnp.ndarray] = None
    mass: Optional[jnp.ndarray] = None
    virtual_area: Optional[jnp.ndarray] = None
    bergy_mass: Optional[jnp.ndarray] = None
    fl_bits_mass: Optional[jnp.ndarray] = None
    fl_bergy_bits_mass: Optional[jnp.ndarray] = None
    bergs_per_cell: Optional[jnp.ndarray] = None
    list_chksum: Optional[jnp.ndarray] = None


def interp_to_bergs(st: BergState, grid: Grid, frc, cfg: IcebergsConfig,
                    rx=0., ry=0.) -> BergState:
    """Cache interpolated environment on every berg
    (interp_gridded_fields_to_bergs, icebergs.F90:4673-4716)."""
    env = interp_flds(grid, frc, cfg, st.lon, st.lat, st.ine, st.jne,
                      st.xi, st.yj, rx, ry)
    return st.replace(uo=env.uo, vo=env.vo, ui=env.ui, vi=env.vi,
                      ua=env.ua, va=env.va, ssh_x=env.ssh_x, ssh_y=env.ssh_y,
                      sst=env.sst, sss=env.sss, cn=env.cn, hi=env.hi,
                      od=env.od)


def step_dynamics(st: BergState, grid: Grid, frc, cfg: IcebergsConfig,
                  ia_fn=None):
    """Interp + evolve only (the minimum end-to-end slice)."""
    st = interp_to_bergs(st, grid, frc, cfg)
    out = evolve_icebergs(st, grid, frc, cfg, ia_fn=ia_fn)
    return out


def make_step(grid: Grid, cfg: IcebergsConfig, *, with_thermo: bool = True,
              with_interactions: Optional[bool] = None,
              with_spread: bool = True,
              with_calving: bool = False, jit: bool = True,
              max_per_cell: int = 16,
              neighbor_mode: Optional[str] = None,
              neighbor_window: str = "full",
              use_pallas: bool = False, contact_cap: Optional[int] = None,
              mts_pair_cap: Optional[int] = None,
              mts_neighbor_mode: Optional[str] = None,
              mts_substep_kernel: str = "scan",
              mts_vmem_deltas=None,
              mts_vmem_block_n: int = 512,
              mts_vmem_interpret: bool = False,
              fused_block_n: int = 128,
              fused_window: Optional[int] = None,
              fused_fallback_cap: Optional[int] = None,
              fused_fallback_strip_width: int = 64,
              fused_interpret: bool = None):
    """Build the full jitted coupling step.

    Returns ``step(state, forcing[, calving_flux]) -> (state, StepDiags)``.

    ``neighbor_mode="fused"`` routes the legacy contact search through the
    Pallas strip-search prepass (`ops/pallas_prepass.py`) + compact eval —
    exact (overflow goes through an XLA fallback, counted in
    ``StepDiags.contact_overflow``), no ``max_per_cell`` truncation.
    """
    from .ops import thermo as _thermo
    from .ops import spread as _spread
    from .ops import forces as _forces
    from .ops import pallas_interp as _pinterp

    interactive = (cfg.interactive_icebergs_on
                   if with_interactions is None else with_interactions)
    # fast-lane resolution from the config (production defaults =
    # the p3tabk set; see IcebergsConfig's fast-lane section)
    if neighbor_mode is None:
        neighbor_mode = cfg.resolved_contact_mode() if interactive \
            else "buckets"
    if fused_window is None:
        fused_window = cfg.fused_window
    if fused_fallback_cap is None:
        fused_fallback_cap = cfg.fused_fallback_cap
    if mts_neighbor_mode is None:
        # production default: the Part-1 collision group rides the
        # extraction-kernel search (round-5; bitwise vs "tables")
        mts_neighbor_mode = "fused" if cfg.mts else "tables"
    nbr_radius = _forces.neighbor_radius(grid, cfg) if interactive else 1
    # single-gather TABLE interp (cfg.interp_mode == "table").  The
    # per-cell slot table and the per-berg math are grid-shape
    # independent (they mirror interp_flds' cell-local reads), so
    # lat-lon AND curvilinear grids ride it; only the MTS quad-od rows
    # assume the regular-grid quadratic stencil (and the driver's
    # A68_test analytic branch keeps the XLA path)
    use_interp_table = (
        cfg.interp_mode == "table"
        and cfg.coastal_drift == 0. and cfg.tidal_drift == 0.
        and not (cfg.mts and (cfg.A68_test
                              or not cfg.grid_is_regular)))

    def step(st: BergState, frc, stored_ice=None, fl_key=None,
             current_year=0, current_yearday=0.):
        # phase scopes mirror the reference's mpp_clock sub-timers
        # (icebergs_framework.F90:896-908) for jax.profiler traces
        # 0. (sorted layout) physically reorder the slab by cell so the
        # neighbor search reads contiguous strips
        # ("fused" no longer reorders the state: the sortless closure
        # gathers only the feature columns it needs — the full-state sort
        # measured 1.5 s/step at 1M bergs)
        cell_starts = None
        if interactive and neighbor_mode == "sorted":
            with jax.named_scope("kid_binning"):
                from .ops.sorted import sort_state_by_cell
                st, cell_starts = sort_state_by_cell(
                    st, grid, packed_permute=cfg.sort_packed_permute,
                    pack_kernel=cfg.pack_kernel,
                    starts_via_scatter=cfg.starts_via_scatter)

        # 1. interpolate fields to bergs
        m25_pre = None
        with jax.named_scope("kid_interface"):
            if use_interp_table:
                st, m25_pre = _pinterp.interp_to_bergs_table(
                    st, grid, frc, cfg)
            else:
                st = interp_to_bergs(st, grid, frc, cfg)

        # 2. dynamics (MTS dispatch mirrors icebergs_run 5426-5441)
        fstats = None
        mts_pair_ov = None
        mts_p1_ov = None
        with jax.named_scope("kid_momentum"):
            if cfg.mts:
                from .mts import evolve_icebergs_mts
                st, mts_d = evolve_icebergs_mts(
                    st, grid, frc, cfg, pair_cap=mts_pair_cap,
                    contact_cap=contact_cap, max_per_cell=max_per_cell,
                    neighbor_mode=mts_neighbor_mode,
                    fused_kw={"fallback_cap": fused_fallback_cap},
                    substep_kernel=mts_substep_kernel,
                    vmem_deltas=mts_vmem_deltas,
                    vmem_block_n=mts_vmem_block_n,
                    vmem_interpret=mts_vmem_interpret)
                mts_p1_ov = mts_d.p1_overflow
                from .dynamics import EvolveOut
                out = EvolveOut(st, jnp.zeros((), jnp.int32),
                                jnp.zeros((), jnp.int32))
                mts_pair_ov = mts_d.pair_overflow
            else:
                ia_fn = None
                if interactive:
                    if neighbor_mode in ("fused", "fused3"):
                        from .ops.fused_contact import (make_ia_fn_fused2,
                                                        make_ia_fn_fused3)
                        mk = (make_ia_fn_fused3 if neighbor_mode == "fused3"
                              else make_ia_fn_fused2)
                        with jax.named_scope("kid_binning"):
                            ia_fn, fstats = mk(
                                st, grid, cfg,
                                block_n=fused_block_n, window=fused_window,
                                contact_cap=(contact_cap or 65536),
                                fallback_cap=fused_fallback_cap,
                                fallback_strip_width=(
                                    fused_fallback_strip_width),
                                interpret=fused_interpret)
                    elif neighbor_mode == "sorted":
                        from .ops.sorted import strip_neighbor_tables
                        nbr = strip_neighbor_tables(
                            st, grid, cfg, cell_starts,
                            strip_width=max_per_cell * (2 * nbr_radius + 1),
                            ncells_radius=nbr_radius)
                    else:
                        nbr = _forces.build_neighbor_tables(
                            st, grid, cfg, ncells_radius=nbr_radius,
                            max_per_cell=max_per_cell,
                            window=neighbor_window)
                    if neighbor_mode not in ("fused", "fused3"):
                        ia_fn = _forces.make_ia_fn(st, nbr, cfg,
                                                   use_pallas=use_pallas,
                                                   contact_cap=contact_cap)
                out = evolve_icebergs(st, grid, frc, cfg, ia_fn=ia_fn,
                                      m25_pre=m25_pre)
                st = out.state

        # 3b. footloose calving (icebergs_run steps 10-12,
        # icebergs.F90:5453-5488): part-1 foot-shed spawn/shrink,
        # delete fully-calved edge elements, child interactivity
        # promotion — the same sequence api.run_coupling_step runs;
        # placement randomness comes from the caller's fl_key
        # (deterministic per step in the driver)
        fl_diag = None
        if cfg.footloose:
            with jax.named_scope("kid_footloose"):
                from .footloose import (footloose_calving,
                                        delete_fully_fl_calved,
                                        adjust_fl_berg_interactivity)
                key = (fl_key if fl_key is not None
                       else jax.random.PRNGKey(0))
                st, fl_diag = footloose_calving(
                    st, grid, cfg, key, current_year=current_year,
                    current_yearday=current_yearday)
                st, fl_deleted = delete_fully_fl_calved(st)
                if interactive:
                    nbr2 = _forces.build_neighbor_tables(
                        st, grid, cfg, ncells_radius=nbr_radius,
                        max_per_cell=max_per_cell)
                    st = adjust_fl_berg_interactivity(st, nbr2, cfg)

        # 4. thermodynamics (melt + rolling + death)
        # one shared (cell, id) lexsort feeds every deterministic scatter
        # in the step (melt fields, per-cell sums, 9-slot spreading);
        # the pallas spread kernel replaces the lexsort+slot machinery
        # entirely — it does its own payload sort, so the step skips
        # make_sort_ctx and only pins the PRE-thermo aliveness for the
        # sort key (rows that die during thermo keep their cell so their
        # deferred melt still lands, matching _origin_frame_ranks)
        sort_ctx = None
        key_alive = None
        use_spread_kernel = (cfg.parallel_reprod
                             and cfg.slot_sum_method == "pallas"
                             and not cfg.hexagonal_icebergs)
        if cfg.parallel_reprod:
            if use_spread_kernel:
                key_alive = st.alive
            else:
                sort_ctx = _spread.make_sort_ctx(st, grid)
        melt_diags = None
        defer = cfg.parallel_reprod
        if with_thermo:
            with jax.named_scope("kid_thermodyn"):
                st, melt_diags = _thermo.thermodynamics(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    defer_cell_cols=defer)

        # 6. spread mass + gridded fields (+ thermo's deferred melt
        # columns in the SAME slot-sum pass when reproducible)
        with jax.named_scope("kid_diagnostics"):
            if not with_spread:
                # MEASUREMENT ONLY (leave-one-out probes): coupler
                # fields zeroed, deferred melt columns dropped
                shp = (grid.nx + 2, grid.ny + 2)
                z = jnp.zeros(shp, st.lon.dtype)
                sp = SimpleNamespace(
                    spread_mass=z, spread_area=z, spread_uvel=z,
                    spread_vvel=z, ustar_iceberg=z, mass_on_ocean=z,
                    u_iceberg=None, v_iceberg=None, mass=None,
                    virtual_area=None, bergy_mass=None,
                    fl_bits_mass=None, fl_bergy_bits_mass=None)
                if melt_diags is not None:
                    melt_diags = melt_diags._replace(deferred_cols=None)
            elif with_thermo and defer and melt_diags.deferred_cols:
                sp, melt_fields = _spread.create_gridded_icebergs_fields(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    extra_cell_cols=melt_diags.deferred_cols,
                    key_alive=key_alive)
                melt_diags = melt_diags._replace(
                    floating_melt=melt_fields[0],
                    calving_hflx=melt_fields[1],
                    berg_melt=melt_fields[2],
                    bergy_src=melt_fields[3],
                    bergy_melt=melt_fields[4],
                    fl_bits_melt=melt_fields[5],
                    melt_buoy=melt_fields[6],
                    melt_eros=melt_fields[7],
                    melt_conv=melt_fields[8],
                    fl_parent_melt=melt_fields[9],
                    fl_child_melt=melt_fields[10],
                    melt_buoy_fl=melt_fields[11],
                    melt_eros_fl=melt_fields[12],
                    melt_conv_fl=melt_fields[13],
                    deferred_cols=None)
            else:
                sp = _spread.create_gridded_icebergs_fields(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    key_alive=key_alive)

        diags = StepDiags(
            nbergs=st.count(), tickets=out.tickets, bounced=out.bounced,
            total_mass=jnp.sum(jnp.where(st.alive,
                                         st.mass * st.mass_scaling, 0.)),
            contact_overflow=(fstats.overflow if fstats is not None
                              else mts_pair_ov),
            contact_fallback=(fstats.n_fallback if fstats else None),
            p1_overflow=mts_p1_ov,
            nbergs_calved_fl=(fl_diag.nbergs_calved_fl
                              if fl_diag else None),
            fl_spawn_overflow=(fl_diag.spawn_overflow
                               if fl_diag else None),
            nbergs_melted=(melt_diags.nbergs_melted
                           if melt_diags else None),
            nbergs_deleted_fl=(fl_deleted if fl_diag else None),
            net_melt_kg=(melt_diags.net_melt_kg if melt_diags else None),
            berg_melt_kg=(melt_diags.berg_melt_kg
                          if melt_diags else None),
            bergy_src_kg=(melt_diags.bergy_src_kg
                          if melt_diags else None),
            bergy_melt_kg=(melt_diags.bergy_melt_kg
                           if melt_diags else None),
            fl_bits_melt_kg=(melt_diags.fl_bits_melt_kg
                             if melt_diags else None),
            flb_bergy_melt_kg=(melt_diags.flb_bergy_melt_kg
                               if melt_diags else None),
            flb_internal_eros_kg=(melt_diags.flb_internal_eros_kg
                                  if melt_diags else None),
            fl_bits_src=(fl_diag.fl_bits_src if fl_diag else None),
            fl_to_berg_kg=(fl_diag.fl_to_berg_kg if fl_diag else None),
            flb_to_bergy_kg=(fl_diag.flb_to_bergy_kg
                             if fl_diag else None),
            floating_melt=(melt_diags.floating_melt if melt_diags else None),
            calving_hflx=(melt_diags.calving_hflx if melt_diags else None),
            berg_melt=(melt_diags.berg_melt if melt_diags else None),
            spread_mass=sp.spread_mass, spread_area=sp.spread_area,
            spread_uvel=sp.spread_uvel, spread_vvel=sp.spread_vvel,
            ustar_iceberg=sp.ustar_iceberg, mass_on_ocean=sp.mass_on_ocean,
            net_melt_heat=(melt_diags.net_heat if melt_diags else None),
            melt_buoy=(melt_diags.melt_buoy if melt_diags else None),
            melt_eros=(melt_diags.melt_eros if melt_diags else None),
            melt_conv=(melt_diags.melt_conv if melt_diags else None),
            bergy_src=(melt_diags.bergy_src if melt_diags else None),
            bergy_melt=(melt_diags.bergy_melt if melt_diags else None),
            fl_bits_melt=(melt_diags.fl_bits_melt if melt_diags else None),
            fl_parent_melt=(melt_diags.fl_parent_melt
                            if melt_diags else None),
            fl_child_melt=(melt_diags.fl_child_melt
                           if melt_diags else None),
            melt_buoy_fl=(melt_diags.melt_buoy_fl if melt_diags else None),
            melt_eros_fl=(melt_diags.melt_eros_fl if melt_diags else None),
            melt_conv_fl=(melt_diags.melt_conv_fl if melt_diags else None),
            melt_by_class=(melt_diags.melt_by_class
                           if melt_diags else None),
            u_iceberg=sp.u_iceberg, v_iceberg=sp.v_iceberg,
            mass=sp.mass, virtual_area=sp.virtual_area,
            bergy_mass=sp.bergy_mass, fl_bits_mass=sp.fl_bits_mass,
            fl_bergy_bits_mass=sp.fl_bergy_bits_mass,
        )
        return st, diags

    if jit:
        step = jax.jit(step)
    return step


def make_persistent_multi_step(grid: Grid, cfg: IcebergsConfig,
                               n_inner: int, with_stats: bool = False, *,
                               with_thermo: bool = True,
                               with_interp: bool = True,
                               with_ia: bool = True,
                               with_spread: bool = True,
                               neighbor_mode: Optional[str] = None,
                               contact_cap: int = 65536,
                               fused_block_n: int = 128,
                               fused_window: Optional[int] = None,
                               fused_fallback_cap: Optional[int] = None,
                               fused_fallback_strip_width: int = 64,
                               fused_fallback_mode: str = "full",
                               fused_interpret: bool = None):
    """Persistent-sorted-layout coupling step, scanned ``n_inner`` times.

    The particle slab is kept PHYSICALLY sorted by (cell, id) across
    steps, so per-step neighbor-search setup disappears:

    * the contact prepass reads the slab directly (no per-step lexsort,
      no packed feature re-gather — the two setup costs that bounded the
      round-2 fused path);
    * one re-sort per step (after the dynamics walk) serves THREE
      consumers: the thermodynamic melt scatters, the reproducible
      9-slot spreading (their reduction frame IS the post-dynamics cell
      order), and the next step's contact search;
    * all deterministic reductions run with ``order=None`` (identity) —
      the rows already sit in the (cell, id) order the reference's
      id-ordered per-cell lists define (parallel_reprod,
      icebergs_framework.F90:33).

    Physics is bitwise identical per berg id to ``make_multi_step`` with
    ``neighbor_mode="fused"``; only the slab ordering differs.

    Single-device, no mid-scan spawning (calving/footloose children
    would land unsorted; the driver path re-sorts per step instead).
    Returns ``multi(st, frc) -> st_sorted`` (+ overflow/fallback stats
    with ``with_stats``).
    """
    from .ops import thermo as _thermo
    from .ops import spread as _spread
    from .ops.sorted import sort_state_by_cell, uniform_state_fields
    from .ops.fused_contact import make_ia_fn_fused, make_ia_fn_fused3
    _uniform_fields = uniform_state_fields(cfg)

    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    assert cfg.interactive_icebergs_on and not cfg.mts
    if neighbor_mode is None:
        neighbor_mode = cfg.resolved_contact_mode()
        if neighbor_mode not in ("fused", "fused3"):
            neighbor_mode = "fused3"
    if fused_window is None:
        fused_window = cfg.fused_window
    if fused_fallback_cap is None:
        fused_fallback_cap = cfg.fused_fallback_cap
    assert neighbor_mode in ("fused", "fused3")

    from .ops import pallas_interp as _pinterp
    _interp_ok = (not cfg.mts
                  and cfg.coastal_drift == 0. and cfg.tidal_drift == 0.)
    use_interp_kernel = (cfg.interp_mode == "kernel" and _interp_ok
                         and cfg.grid_is_regular)
    use_interp_table = cfg.interp_mode == "table" and _interp_ok

    def step(st: BergState, cell_starts, frc):
        m25_pre = None
        with jax.named_scope("kid_interface"):
            if not with_interp:
                pass                # env cached from init (probe only)
            elif use_interp_table:
                st, m25_pre = _pinterp.interp_to_bergs_table(
                    st, grid, frc, cfg)
            elif use_interp_kernel:
                st, m25_pre = _pinterp.interp_to_bergs_sorted(
                    st, grid, frc, cfg, interpret=fused_interpret)
            else:
                st = interp_to_bergs(st, grid, frc, cfg)

        with jax.named_scope("kid_momentum"):
            if not with_ia:
                from .ops.fused_contact import FusedContactStats
                ia_fn = None
                fstats = FusedContactStats(
                    overflow=jnp.zeros((), jnp.int32),
                    n_fallback=jnp.zeros((), jnp.int32))
            elif neighbor_mode == "fused3":
                # presorted: no payload sort, no origin-frame inverse
                # gathers — the slab IS the sorted frame
                ia_fn, fstats = make_ia_fn_fused3(
                    st, grid, cfg, block_n=fused_block_n,
                    window=fused_window, contact_cap=contact_cap,
                    fallback_cap=fused_fallback_cap,
                    fallback_strip_width=fused_fallback_strip_width,
                    presorted=True, cell_starts=cell_starts,
                    fallback_mode=fused_fallback_mode,
                    interpret=fused_interpret)
            else:
                ia_fn, fstats = make_ia_fn_fused(
                    st, cell_starts, grid, cfg, block_n=fused_block_n,
                    window=fused_window, contact_cap=contact_cap,
                    fallback_cap=fused_fallback_cap,
                    fallback_strip_width=fused_fallback_strip_width,
                    interpret=fused_interpret)
            out = evolve_icebergs(st, grid, frc, cfg, ia_fn=ia_fn,
                                  m25_pre=m25_pre)
            st = out.state

        # one re-sort serves thermo, spreading AND the next step's search
        # (row-uniform leaves under this cfg are skipped — identity)
        with jax.named_scope("kid_binning"):
            st, cell_starts = sort_state_by_cell(
                st, grid, static_fields=_uniform_fields,
                packed_permute=cfg.sort_packed_permute,
                pack_kernel=cfg.pack_kernel,
                starts_via_scatter=cfg.starts_via_scatter)
            key_s = jnp.where(st.alive, st.jne * nx + st.ine,
                              ncells).astype(cell_starts.dtype)
            rank = (jnp.arange(st.capacity, dtype=jnp.int32)
                    - cell_starts[jnp.minimum(key_s, ncells)])
            sort_ctx = (None, key_s, rank)   # identity: already sorted
            key_alive = st.alive             # pre-thermo, for the kernel

        melt_diags = None
        use_spread_kernel = (cfg.parallel_reprod
                             and cfg.slot_sum_method == "pallas"
                             and not cfg.hexagonal_icebergs)
        defer = cfg.parallel_reprod and use_spread_kernel
        if with_thermo:
            with jax.named_scope("kid_thermodyn"):
                st, melt_diags = _thermo.thermodynamics(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    defer_cell_cols=defer)

        with jax.named_scope("kid_diagnostics"):
            if not with_spread:
                shp = (grid.nx + 2, grid.ny + 2)
                z = jnp.zeros(shp, st.lon.dtype)
                sp = SimpleNamespace(
                    spread_mass=z, spread_area=z, spread_uvel=z,
                    spread_vvel=z, ustar_iceberg=z, mass_on_ocean=z)
                if melt_diags is not None:
                    melt_diags = melt_diags._replace(deferred_cols=None)
            elif with_thermo and defer and melt_diags.deferred_cols:
                sp, melt_fields = _spread.create_gridded_icebergs_fields(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    extra_cell_cols=melt_diags.deferred_cols,
                    key_alive=key_alive, cell_starts=cell_starts)
                melt_diags = melt_diags._replace(
                    floating_melt=melt_fields[0],
                    calving_hflx=melt_fields[1],
                    berg_melt=melt_fields[2],
                    deferred_cols=None)
            else:
                sp = _spread.create_gridded_icebergs_fields(
                    st, grid, frc, cfg, sort_ctx=sort_ctx,
                    key_alive=key_alive if use_spread_kernel else None,
                    cell_starts=(cell_starts if use_spread_kernel
                                 else None))

        diags = StepDiags(
            nbergs=st.count(), tickets=out.tickets, bounced=out.bounced,
            total_mass=jnp.sum(jnp.where(st.alive,
                                         st.mass * st.mass_scaling, 0.)),
            contact_overflow=fstats.overflow,
            contact_fallback=fstats.n_fallback,
            floating_melt=(melt_diags.floating_melt if melt_diags else None),
            berg_melt=(melt_diags.berg_melt if melt_diags else None),
            spread_mass=sp.spread_mass, spread_area=sp.spread_area,
            spread_uvel=sp.spread_uvel, spread_vvel=sp.spread_vvel,
            ustar_iceberg=sp.ustar_iceberg, mass_on_ocean=sp.mass_on_ocean)
        return st, cell_starts, diags

    @jax.jit
    def multi(st: BergState, frc):
        zero = jnp.zeros((), jnp.int32)
        acc0 = jnp.zeros((grid.nx + 2, grid.ny + 2), st.lon.dtype)
        st, cs = sort_state_by_cell(
            st, grid, packed_permute=cfg.sort_packed_permute,
            pack_kernel=cfg.pack_kernel,
            starts_via_scatter=cfg.starts_via_scatter)

        def body(carry, _):
            s, cs, ov, fb, acc = carry
            s, cs, d = step(s, cs, frc)
            ov = jnp.maximum(ov, d.contact_overflow)
            fb = jnp.maximum(fb, d.contact_fallback)
            # keep the coupler outputs live — a stats-only consumer
            # lets XLA dead-code the whole spreading subgraph
            for f in (d.spread_mass, d.spread_area, d.ustar_iceberg,
                      d.mass_on_ocean, d.floating_melt):
                if f is not None:
                    acc = acc + f
            return (s, cs, ov, fb, acc), None

        (st, cs, ov, fb, acc), _ = jax.lax.scan(
            body, (st, cs, zero, zero, acc0), None, length=n_inner)
        return (st, ov, fb, acc) if with_stats else st

    return multi


_PERSISTENT_KW = ("with_thermo", "with_spread", "neighbor_mode",
                  "contact_cap", "fused_block_n", "fused_window",
                  "fused_fallback_cap", "fused_fallback_strip_width",
                  "fused_interpret")


def make_multi_step(grid: Grid, cfg: IcebergsConfig, n_inner: int,
                    with_stats: bool = False,
                    persistent: Optional[bool] = None, **kw):
    """Jit a scan of ``n_inner`` coupling steps (fixed forcing) — one
    compiled program, no per-step dispatch.

    ``persistent`` (default: auto) routes eligible configurations
    through :func:`make_persistent_multi_step` — the production fast
    lane, where ONE (cell, id) re-sort per step serves the contact
    search, thermo and spreading (the bench's "p3tabk" mode).  Eligible
    = interactive, non-MTS, non-footloose, fused-search neighbor mode,
    full thermo+spread, no calving.  Physics is bitwise identical per
    berg id; only the returned slab ORDER differs (sorted by cell).
    Pass ``persistent=False`` to force the per-step path (slot order
    preserved).

    ``with_stats=True`` returns ``(state, max_contact_overflow,
    max_contact_fallback)`` accumulated over the scan (0 when the
    neighbor mode reports none) — the honesty counters for benchmarks.

    The per-step COUPLER outputs (spread mass/area/ustar, melt and
    calving-heat fluxes — what icebergs_run hands back to the ocean,
    icebergs.F90:5652-5679) are accumulated into the carried state's
    spread-mass slot of the returned diags... they are summed into an
    accumulator field that is part of the carry and returned, so XLA
    cannot dead-code the spreading/diagnostic subgraph the way a
    state-only scan silently would (a state-only multi-step measured a
    step WITHOUT the coupler fields — not the reference's step).
    """
    if persistent is None:
        nm = kw.get("neighbor_mode")
        nm = nm if nm is not None else (
            cfg.resolved_contact_mode()
            if cfg.interactive_icebergs_on else "buckets")
        persistent = (
            cfg.interactive_icebergs_on and not cfg.mts
            and not cfg.footloose
            and nm in ("fused", "fused3")
            and kw.get("with_thermo", True)
            and kw.get("with_spread", True)
            and not kw.get("with_calving", False)
            and kw.get("with_interactions") in (None, True)
            and all(k in _PERSISTENT_KW for k in kw))
    if persistent:
        return make_persistent_multi_step(
            grid, cfg, n_inner, with_stats,
            **{k: v for k, v in kw.items() if k in _PERSISTENT_KW})
    step = make_step(grid, cfg, jit=False, **kw)

    @jax.jit
    def multi(st: BergState, frc):
        zero = jnp.zeros((), jnp.int32)
        acc0 = jnp.zeros((grid.nx + 2, grid.ny + 2), st.lon.dtype)

        def body(carry, _):
            s, ov, fb, acc = carry
            s, d = step(s, frc)
            if d.contact_overflow is not None:
                ov = jnp.maximum(ov, d.contact_overflow)
            if d.p1_overflow is not None:
                # MTS Part-1 fallback drops count as overflow too: the
                # exactness contract covers the collision group
                ov = jnp.maximum(ov, d.p1_overflow)
            if d.contact_fallback is not None:
                fb = jnp.maximum(fb, d.contact_fallback)
            for f in (d.spread_mass, d.spread_area, d.ustar_iceberg,
                      d.mass_on_ocean, d.floating_melt, d.calving_hflx,
                      d.u_iceberg, d.v_iceberg):
                if f is not None:
                    acc = acc + f
            return (s, ov, fb, acc), None
        (st, ov, fb, acc), _ = jax.lax.scan(
            body, (st, zero, zero, acc0), None, length=n_inner)
        return (st, ov, fb, acc) if with_stats else st
    return multi
