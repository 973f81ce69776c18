"""Public model API: the TPU equivalent of ``module ice_bergs``'s
``icebergs_init`` / ``icebergs_run`` / ``icebergs_end`` /
``icebergs_save_restart`` / ``icebergs_stock_pe`` / ``icebergs_incr_mass``
(``src/icebergs.F90:65-66``).

``IcebergsModel`` holds the static pieces (grid, config, compiled step);
the dynamic state (bergs + calving buckets + RNG key + clock) flows
functionally through ``run()``, which executes the reference's full
coupling sequence (icebergs_run, icebergs.F90:5074-5889):

 1. interface: stagger forcing onto the B-grid, tau->velocity, K->C SST,
    NaN scrub                                   (icebergs.F90:5236-5383)
 2. accumulate_calving -> buckets               (5389)
 3. calve_icebergs: spawn from buckets          (5403)
 4. interp fields to bergs                      (5423)
 5. evolve (RK4 / Verlet / MTS)                 (5426-5441)
 6. footloose calving parts 1+2                 (5453, 5479-5488)
 7. thermodynamics (melt, rolling, death)       (5505)
 8. create_gridded_icebergs_fields              (5512)
 9. coupler return fields + budgets             (5652-5889)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .calving import (CalvingState, accumulate_calving, calve_icebergs,
                      get_running_mean_calving, init_calving_state)
from .config import IcebergsConfig
from .diag import Budgets, compute_budgets
from .dynamics import evolve_icebergs
from .footloose import (adjust_fl_berg_interactivity, delete_fully_fl_calved,
                        footloose_calving)
from .forcing import Forcing
from .grid import Grid
from .model import interp_to_bergs
from .ops import forces as _forces
from .ops import spread as _spread
from .ops import thermo as _thermo
from .state import BergState
from .tree import pytree_dataclass


@pytree_dataclass
class ModelState:
    bergs: BergState = None
    calving: CalvingState = None
    key: jnp.ndarray = None          # PRNG key (footloose placement, tides)
    current_year: jnp.ndarray = None
    current_yearday: jnp.ndarray = None
    spread_mass_old: jnp.ndarray = None   # previous step's spread mass
                                          # (find_melt_using_spread_mass)


class RunOutputs(NamedTuple):
    """Coupler return fields (icebergs_run out args, icebergs.F90:5652-5679)
    — all halo-padded center fields."""
    calving: jnp.ndarray         # residual calving + melt return, kg/s/m2
    calving_hflx: jnp.ndarray    # W/m2
    floating_melt: jnp.ndarray   # kg/m2/s
    berg_melt: jnp.ndarray
    spread_mass: jnp.ndarray
    spread_area: jnp.ndarray
    spread_uvel: jnp.ndarray
    spread_vvel: jnp.ndarray
    ustar_iceberg: jnp.ndarray
    mass_on_ocean: jnp.ndarray
    nbergs: jnp.ndarray
    budgets: Budgets
    # fused-contact honesty counters (0 on non-fused neighbor modes):
    # bergs dropped past fallback_cap and bergs routed through the
    # exact fallback (FusedContactStats; model.make_step surfaces the
    # same numbers in StepDiags)
    contact_overflow: jnp.ndarray = None
    contact_fallback: jnp.ndarray = None
    # slot-pool exhaustion counters: calving-bucket spawns and footloose
    # children that wanted a slot and found none (allocate_slots).  The
    # reference grows its buffers on demand (increase_ibuffer,
    # icebergs_framework.F90:3710-3747); the slab analog is the driver's
    # grow-and-re-run reaction (driver.run) via state.grow_capacity.
    spawn_overflow: jnp.ndarray = None
    fl_spawn_overflow: jnp.ndarray = None
    # interval-budget scalars for diag.IntervalBudget /
    # report_full_budget (the reference's lbudget accumulators,
    # icebergs.F90:5680-5700): per-step counts and strict per-category
    # kg/J sources and sinks
    tickets: jnp.ndarray = None
    nbergs_calved: jnp.ndarray = None
    nbergs_calved_fl: jnp.ndarray = None
    nbergs_melted: jnp.ndarray = None
    nbergs_deleted_fl: jnp.ndarray = None
    net_calving_used: jnp.ndarray = None      # kg into the buckets
    heat_used: jnp.ndarray = None             # J into stored heat
    calving_to_bergs: jnp.ndarray = None      # kg buckets -> new bergs
    heat_to_bergs: jnp.ndarray = None         # J buckets -> new bergs
    net_melt_heat: jnp.ndarray = None         # J floating -> ocean
    net_melt_kg: jnp.ndarray = None
    berg_melt_kg: jnp.ndarray = None
    bergy_src_kg: jnp.ndarray = None
    bergy_melt_kg: jnp.ndarray = None
    fl_bits_melt_kg: jnp.ndarray = None
    flb_bergy_melt_kg: jnp.ndarray = None
    flb_internal_eros_kg: jnp.ndarray = None
    fl_bits_src: jnp.ndarray = None           # (nx+2,ny+2) kg/m2/s
    fl_to_berg_kg: jnp.ndarray = None         # fl bits -> new berg
    flb_to_bergy_kg: jnp.ndarray = None       # fl bergy -> bergy bits


def prepare_forcing(grid: Grid, cfg: IcebergsConfig, frc: Forcing,
                    *, vel_stagger: str = "B",
                    stress_stagger: str = "B") -> Forcing:
    """Interface layer (P16, icebergs.F90:5236-5383): stagger velocities
    onto the corner B-grid, convert wind stress to a wind speed unless
    tau_is_velocity, autodetect Kelvin SST, scrub NaNs."""
    def a_to_corners(u):
        """A-grid centers (nx, ny) or padded -> corner 4-point average."""
        if u.shape == grid.shape_corners:
            return u
        up = jnp.pad(u, 1, mode="edge") if u.shape == (grid.nx, grid.ny) \
            else u
        return 0.25 * (up[:-1, :-1] + up[1:, :-1] + up[:-1, 1:] + up[1:, 1:])

    def c_to_corners(u, component):
        """C-grid faces -> corners: u on east faces (nx+1, ny), v on north
        faces (nx, ny+1) (the CGRID_NE branch, icebergs.F90:5244-5282)."""
        if component == "u":                 # average along y
            up = jnp.pad(u, ((0, 0), (1, 1)), mode="edge")
            return 0.5 * (up[:, :-1] + up[:, 1:])
        up = jnp.pad(u, ((1, 1), (0, 0)), mode="edge")
        return 0.5 * (up[:-1, :] + up[1:, :])

    def vel(u, v, stagger):
        if stagger == "B":
            return u, v
        if stagger == "C":
            return c_to_corners(u, "u"), c_to_corners(v, "v")
        return a_to_corners(u), a_to_corners(v)

    uo, vo = vel(frc.uo, frc.vo, vel_stagger)
    ui, vi = vel(frc.ui, frc.vi, vel_stagger)
    ua, va = vel(frc.ua, frc.va, stress_stagger)

    if not cfg.tau_is_velocity:
        # invert_tau_for_du (icebergs.F90:8271-8296): |du| = sqrt(|tau|/cd)
        # with cd=0.0015 and NO air-density factor (the reference divides
        # each component by sqrt(cd*|tau|))
        def invert(tau_x, tau_y):
            mag = jnp.sqrt(tau_x ** 2 + tau_y ** 2)
            cddvmod = jnp.sqrt(0.0015 * mag)
            den = jnp.where(cddvmod > 0., cddvmod, 1.)
            return jnp.where(cddvmod > 0., tau_x / den, 0.), \
                jnp.where(cddvmod > 0., tau_y / den, 0.)
        ua, va = invert(ua, va)

    sst = frc.sst
    sst = jnp.where(jnp.max(sst) > 120.0, sst - 273.15, sst)

    def scrub(a):
        return jnp.where(jnp.isnan(a), 0., a)

    ssh = frc.ssh
    if cfg.add_iceberg_thickness_to_SSH:
        pass  # spread_mass/area-based SSH increment added by the host model

    return Forcing(uo=scrub(uo), vo=scrub(vo), ui=scrub(ui), vi=scrub(vi),
                   ua=scrub(ua), va=scrub(va), ssh=scrub(ssh),
                   sst=scrub(sst), sss=scrub(frc.sss), cn=scrub(frc.cn),
                   hi=scrub(frc.hi))



def run_coupling_sequence(cfg: IcebergsConfig, grid: Grid, state: ModelState,
                          frc: Forcing, calving, calving_hflx, *,
                          nbr_radius: int, max_per_cell: int = 16,
                          neighbor_mode: str = None,
                          fused_interpret: bool = None,
                          fused_kw: dict = None):
    """The full icebergs_run coupling sequence (icebergs.F90:5389-5679) as
    a pure function over (grid, cfg): calving buckets -> spawn -> interp ->
    evolve -> footloose -> thermo -> spread -> coupler returns.

    Shared by IcebergsModel (single controller) and the sharded per-tile
    step (parallel/domain.make_sharded_run); on a tile grid, spawning is
    restricted to owned cells and ids are global (grid.i_off/nxg).
    """
    st = state.bergs
    calv = state.calving
    key = state.key
    if neighbor_mode is None:
        neighbor_mode = (cfg.resolved_contact_mode()
                         if cfg.interactive_icebergs_on else "buckets")
    b0 = compute_budgets(st, calv)

    # 2-3. calving buckets -> new bergs
    calv, calving, calving_hflx = get_running_mean_calving(
        calv, calving, calving_hflx, cfg)
    calv, calving_res, hflx_res, used_kg, used_J = accumulate_calving(
        calv, grid, calving, calving_hflx, cfg)
    st, calv, calv_diag = calve_icebergs(
        st, calv, grid, frc, cfg,
        current_year=state.current_year,
        current_yearday=state.current_yearday)

    # 4. interpolate fields onto bergs (with stochastic tidal drift if
    # enabled — per-berg uniforms on [-1,1], the reference seeds its
    # stream from cell index + ssh hash, icebergs.F90:4697-4701)
    if cfg.tidal_drift > 0.:
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, (2, st.capacity), st.dtype,
                               -1., 1.)
        st = interp_to_bergs(st, grid, frc, cfg, rx=r[0], ry=r[1])
    else:
        st = interp_to_bergs(st, grid, frc, cfg)

    # 5. evolve
    fstats = None
    tickets = jnp.zeros((), jnp.int32)
    if cfg.mts:
        from .mts import evolve_icebergs_mts
        st, _ = evolve_icebergs_mts(st, grid, frc, cfg)
    else:
        ia_fn = None
        nbr = None
        if cfg.interactive_icebergs_on:
            if neighbor_mode in ("fused", "fused3"):
                # production Pallas search (sortless, cap-free normal
                # group).  Layout-invariant like the sorted path: the
                # <=2-partner sums are commutative and fallback strips
                # enumerate each 3x3 neighborhood in (cell, id) order
                # (tests/test_parallel.py fused3 cross-layout test)
                from .ops.fused_contact import (make_ia_fn_fused2,
                                                make_ia_fn_fused3)
                mk = (make_ia_fn_fused3 if neighbor_mode == "fused3"
                      else make_ia_fn_fused2)
                # same kernel defaults as model.make_step so a config
                # validated there behaves identically through this
                # entry point; fused_kw overrides
                kw = dict(block_n=128, window=cfg.fused_window,
                          fallback_cap=cfg.fused_fallback_cap,
                          fallback_strip_width=64)
                kw.update(fused_kw or {})
                ia_fn, fstats = mk(st, grid, cfg,
                                   interpret=fused_interpret, **kw)
            elif neighbor_mode == "sorted":
                # cell+id sorted slab: layout-invariant pair sums
                from .ops.sorted import (sort_state_by_cell,
                                         strip_neighbor_tables)
                st, cell_starts = sort_state_by_cell(
                    st, grid, packed_permute=cfg.sort_packed_permute,
                    pack_kernel=cfg.pack_kernel,
                    starts_via_scatter=cfg.starts_via_scatter)
                nbr = strip_neighbor_tables(st, grid, cfg, cell_starts,
                                            ncells_radius=nbr_radius)
            else:
                nbr = _forces.build_neighbor_tables(
                    st, grid, cfg, ncells_radius=nbr_radius,
                    max_per_cell=max_per_cell)
            if ia_fn is None:
                ia_fn = _forces.make_ia_fn(st, nbr, cfg)
        out = evolve_icebergs(st, grid, frc, cfg, ia_fn=ia_fn)
        st = out.state
        tickets = out.tickets

    # 6. footloose calving + interactivity bookkeeping
    fl_diag = None
    fl_deleted = None
    if cfg.footloose:
        key, sub = jax.random.split(key)
        st, fl_diag = footloose_calving(
            st, grid, cfg, sub, current_year=state.current_year,
            current_yearday=state.current_yearday)
        st, fl_deleted = delete_fully_fl_calved(st)
        if cfg.interactive_icebergs_on:
            if neighbor_mode in ("sorted", "fused", "fused3"):
                # fused modes reuse the sorted strip tables here: the
                # interactivity walk needs a candidate TABLE, and the
                # sorted strips are layout-invariant
                from .ops.sorted import (sort_state_by_cell,
                                         strip_neighbor_tables)
                st, cs2 = sort_state_by_cell(
                    st, grid, packed_permute=cfg.sort_packed_permute,
                    pack_kernel=cfg.pack_kernel,
                    starts_via_scatter=cfg.starts_via_scatter)
                nbr2 = strip_neighbor_tables(st, grid, cfg, cs2,
                                             ncells_radius=nbr_radius)
            else:
                nbr2 = _forces.build_neighbor_tables(
                    st, grid, cfg, ncells_radius=nbr_radius,
                    max_per_cell=max_per_cell)
            st = adjust_fl_berg_interactivity(st, nbr2, cfg)

    # 7. thermodynamics
    melt = None
    st, melt = _thermo.thermodynamics(st, grid, frc, cfg)

    # 8. gridded fields
    sp = _spread.create_gridded_icebergs_fields(st, grid, frc, cfg)

    # melt from the spread-mass difference (find_melt_using_spread_mass,
    # icebergs.F90:3424-3440)
    floating_melt = melt.floating_melt
    hflx_melt = melt.calving_hflx
    if cfg.find_melt_using_spread_mass:
        floating_melt = jnp.where(
            grid.area > 0.,
            jnp.maximum((state.spread_mass_old - sp.spread_mass)
                        / cfg.dt, 0.), 0.)
        hflx_melt = floating_melt * C.HLF

    # melt cutoff over thin ocean (apply_thickness_cutoff_to_gridded_melt,
    # icebergs.F90:3471-3483)
    if cfg.apply_thickness_cutoff_to_gridded_melt and cfg.melt_cutoff >= 0.:
        ave_thick = sp.spread_mass / jnp.maximum(
            sp.spread_area * cfg.rho_bergs, 1e-30)
        ave_draft = ave_thick * (cfg.rho_bergs / C.RHO_SEAWATER)
        thin = (sp.spread_area > 0.) & (
            (grid.ocean_depth - ave_draft) < cfg.melt_cutoff)
        floating_melt = jnp.where(thin, 0., floating_melt)
        hflx_melt = jnp.where(thin, 0., hflx_melt)

    # 9. coupler return: residual calving +- melt
    calving_out = calving_res + floating_melt * (grid.msk > 0.)
    hflx_out = hflx_res + hflx_melt

    b1 = compute_budgets(st, calv)
    outputs = RunOutputs(
        calving=calving_out, calving_hflx=hflx_out,
        floating_melt=floating_melt, berg_melt=melt.berg_melt,
        spread_mass=sp.spread_mass, spread_area=sp.spread_area,
        spread_uvel=sp.spread_uvel, spread_vvel=sp.spread_vvel,
        ustar_iceberg=sp.ustar_iceberg, mass_on_ocean=sp.mass_on_ocean,
        nbergs=st.count(), budgets=b1,
        contact_overflow=(fstats.overflow if fstats is not None
                          else jnp.zeros((), jnp.int32)),
        contact_fallback=(fstats.n_fallback if fstats is not None
                          else jnp.zeros((), jnp.int32)),
        spawn_overflow=calv_diag.get("spawn_overflow",
                                     jnp.zeros((), jnp.int32)),
        fl_spawn_overflow=(fl_diag.spawn_overflow if fl_diag is not None
                           else jnp.zeros((), jnp.int32)),
        tickets=tickets,
        nbergs_calved=calv_diag.get("nbergs_calved"),
        nbergs_calved_fl=(fl_diag.nbergs_calved_fl
                          if fl_diag is not None else None),
        nbergs_melted=melt.nbergs_melted,
        nbergs_deleted_fl=fl_deleted,
        net_calving_used=used_kg, heat_used=used_J,
        calving_to_bergs=calv_diag.get("calving_to_bergs"),
        heat_to_bergs=calv_diag.get("heat_to_bergs"),
        net_melt_heat=melt.net_heat,
        net_melt_kg=melt.net_melt_kg, berg_melt_kg=melt.berg_melt_kg,
        bergy_src_kg=melt.bergy_src_kg, bergy_melt_kg=melt.bergy_melt_kg,
        fl_bits_melt_kg=melt.fl_bits_melt_kg,
        flb_bergy_melt_kg=melt.flb_bergy_melt_kg,
        flb_internal_eros_kg=melt.flb_internal_eros_kg,
        fl_bits_src=(fl_diag.fl_bits_src if fl_diag is not None
                     else None),
        fl_to_berg_kg=(fl_diag.fl_to_berg_kg if fl_diag is not None
                       else None),
        flb_to_bergy_kg=(fl_diag.flb_to_bergy_kg
                         if fl_diag is not None else None))

    day = state.current_yearday + cfg.dt / 86400.
    state = state.replace(bergs=st, calving=calv, key=key,
                          current_yearday=day,
                          spread_mass_old=sp.spread_mass)
    return state, outputs


class IcebergsModel:
    """icebergs_init equivalent: bind grid + config, build the jitted run."""

    def __init__(self, grid: Grid, cfg: IcebergsConfig, *,
                 max_per_cell: int = 16, jit: bool = True,
                 neighbor_mode: str = None,
                 fused_interpret: bool = None, fused_kw: dict = None):
        self.grid = grid
        self.cfg = cfg
        self.max_per_cell = max_per_cell
        self.neighbor_mode = neighbor_mode
        self.fused_interpret = fused_interpret
        self.fused_kw = fused_kw
        self._nbr_radius = _forces.neighbor_radius(grid, cfg)
        self._run = jax.jit(self._run_impl) if jit else self._run_impl

    # -- lifecycle ---------------------------------------------------------

    def init_state(self, bergs: BergState, seed: int = 0,
                   year: int = 0, yearday: float = 0.) -> ModelState:
        return ModelState(
            bergs=bergs, calving=init_calving_state(self.grid),
            key=jax.random.PRNGKey(seed),
            current_year=jnp.asarray(year, jnp.int32),
            current_yearday=jnp.asarray(yearday, jnp.float32),
            spread_mass_old=jnp.zeros((self.grid.nx + 2, self.grid.ny + 2),
                                      bergs.dtype))

    def run(self, state: ModelState, frc: Forcing,
            calving=None, calving_hflx=None):
        """One coupling step; returns (state, RunOutputs)."""
        shape = (self.grid.nx + 2, self.grid.ny + 2)
        if calving is None:
            calving = jnp.zeros(shape, state.bergs.dtype)
        if calving_hflx is None:
            calving_hflx = jnp.zeros(shape, state.bergs.dtype)
        return self._run(state, frc, calving, calving_hflx)

    # -- the full icebergs_run sequence -------------------------------------

    def _run_impl(self, state: ModelState, frc: Forcing, calving,
                  calving_hflx):
        return run_coupling_sequence(
            self.cfg, self.grid, state, frc, calving, calving_hflx,
            nbr_radius=self._nbr_radius, max_per_cell=self.max_per_cell,
            neighbor_mode=self.neighbor_mode,
            fused_interpret=self.fused_interpret, fused_kw=self.fused_kw)

    # -- coupler queries -----------------------------------------------------

    def stock_pe(self, state: ModelState):
        """Water/heat stocks (icebergs_stock_pe, icebergs.F90:8102-8133)."""
        b = compute_budgets(state.bergs, state.calving)
        water = b.mass + b.mass_of_bits + b.stored_ice
        heat = -(water * C.HLF)   # frozen water holds negative latent heat
        return water, heat

    def incr_mass(self, state: ModelState, mass_field, frc: Forcing):
        """Add spread berg weight to an ocean mass field
        (icebergs_incr_mass, icebergs.F90:6046-6075)."""
        if self.cfg.passive_mode or not self.cfg.add_weight_to_ocean:
            return mass_field
        sp = _spread.create_gridded_icebergs_fields(
            state.bergs, self.grid, frc, self.cfg)
        return mass_field + sp.spread_mass

    def save_restart(self, state: ModelState, directory: str = "."):
        """Write the restart triplet (icebergs_save_restart)."""
        import os
        from .io import restart as rio
        os.makedirs(directory, exist_ok=True)
        rio.write_restart_bergs(os.path.join(directory, "icebergs.res.nc"),
                                state.bergs, self.cfg)
        if self.cfg.iceberg_bonds_on:
            rio.write_restart_bonds(
                os.path.join(directory, "bonds_iceberg.res.nc"),
                state.bergs, self.cfg)
        rio.write_restart_calving(
            os.path.join(directory, "calving.res.nc"), state.calving,
            self.grid)

    def end(self, state: ModelState, directory: str = ".",
            traj_buffer=None):
        """icebergs_end: flush trajectories + final budgets."""
        from .io import trajectory as tio
        if traj_buffer is not None and not self.cfg.ignore_traj:
            import os
            tio.write_trajectories(
                os.path.join(directory, self.cfg.traj_name), traj_buffer,
                self.cfg)
        return compute_budgets(state.bergs, state.calving)
