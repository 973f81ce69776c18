"""Checksums, budgets and state reporting.

TPU-native equivalents of ``bergs_chksum``/``list_chksum``/``grd_chksum2``
(``src/icebergs_framework.F90:6606-7070``) and the budget tables of
``icebergs_run`` (``src/icebergs.F90:5683-5995``).

Checksums are order-invariant integer reductions over the particle slab
(sum of float bit patterns mod 2^32), so they are independent of slot
order and device layout — the same property the reference engineers via
ordered list insertion (``parallel_reprod``).
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# fields hashed by bergs_chksum (the reference hashes the full particle
# payload; chksum2 excludes ine/jne, chksum3/4 position-only variants)
CHKSUM_FIELDS = ("lon", "lat", "uvel", "vvel", "mass", "thickness",
                 "width", "length", "axn", "ayn", "bxn", "byn",
                 "start_lon", "start_lat", "start_day", "start_mass",
                 "mass_scaling", "mass_of_bits", "heat_density")


def berg_chksum(st, fields=CHKSUM_FIELDS):
    """Order-invariant 32-bit hash of live-particle state."""
    total = jnp.zeros((), jnp.uint32)
    alive = st.alive & (st.halo_berg < 0.5)
    for f in fields:
        arr = getattr(st, f)
        if arr.dtype == jnp.float32:
            bits = jax.lax.bitcast_convert_type(arr, jnp.uint32)
        elif arr.dtype == jnp.float64:
            b2 = jax.lax.bitcast_convert_type(arr, jnp.uint32)
            bits = b2[..., 0] + b2[..., 1]
        else:
            bits = arr.astype(jnp.uint32)
        total = total + jnp.sum(jnp.where(alive, bits, jnp.uint32(0)),
                                dtype=jnp.uint32)
    n = jnp.sum(alive.astype(jnp.uint32))
    return total, n


def bergs_per_cell(st, grid):
    """Per-cell berg count field (id_count diagnostic,
    icebergs.F90:5620-5627)."""
    alive = st.alive & (st.halo_berg < 0.5)
    I, J = st.ine + 1, st.jne + 1
    return jnp.zeros((grid.nx + 2, grid.ny + 2), jnp.int32).at[I, J].add(
        jnp.where(alive, 1, 0).astype(jnp.int32))


def list_chksum_per_cell(st, grid, fields=CHKSUM_FIELDS):
    """Per-cell particle-state hash field (id_chksum diagnostic,
    icebergs.F90:5628-5634; list_chksum framework:6889-...)."""
    alive = st.alive & (st.halo_berg < 0.5)
    total = jnp.zeros(st.lon.shape, jnp.uint32)
    for f in fields:
        arr = getattr(st, f)
        if arr.dtype == jnp.float32:
            bits = jax.lax.bitcast_convert_type(arr, jnp.uint32)
        elif arr.dtype == jnp.float64:
            b2 = jax.lax.bitcast_convert_type(arr, jnp.uint32)
            bits = b2[..., 0] + b2[..., 1]
        else:
            bits = arr.astype(jnp.uint32)
        total = total + jnp.where(alive, bits, jnp.uint32(0))
    I, J = st.ine + 1, st.jne + 1
    out = jnp.zeros((grid.nx + 2, grid.ny + 2), jnp.uint32).at[I, J].add(
        jnp.where(alive, total, jnp.uint32(0)))
    return out.astype(jnp.int32)


def grd_chksum2(field):
    """Gridded-field hash + stats (grd_chksum2)."""
    if field.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(field, jnp.uint32)
    else:
        bits = field.astype(jnp.uint32)
    return dict(chksum=jnp.sum(bits, dtype=jnp.uint32),
                minv=jnp.min(field), maxv=jnp.max(field),
                mean=jnp.mean(field),
                rms=jnp.sqrt(jnp.mean(field.astype(jnp.float32) ** 2)))


def grd_chksum3(field):
    """Class-resolved 3-D gridded-field hash + per-class stats — the
    ``grd_chksum3`` analog (icebergs_framework.F90:6606-7070 family)
    for ``stored_ice(:,:,:nclasses)``-shaped arrays.

    Returns the total hash plus a per-class (last axis) chksum vector,
    so a change confined to one calving class is attributable."""
    assert field.ndim == 3, field.shape
    if field.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(field, jnp.uint32)
    else:
        bits = field.astype(jnp.uint32)
    per_class = jnp.sum(bits, axis=(0, 1), dtype=jnp.uint32)
    return dict(chksum=jnp.sum(per_class, dtype=jnp.uint32),
                per_class=per_class,
                minv=jnp.min(field), maxv=jnp.max(field),
                mean=jnp.mean(field),
                rms=jnp.sqrt(jnp.mean(field.astype(jnp.float32) ** 2)))


def calving_chksum(calv):
    """Order-invariant hash of the full Eulerian calving state — the
    ``write_restart_calving`` payload (stored_ice, stored_heat,
    rmean_calving, rmean_calving_hflx; icebergs_fms2io.F90:1484-1598) —
    so golden anchors guard the bucket state too (VERDICT r4 #8).

    Returns (total u32 hash, stored_ice grd_chksum3 dict)."""
    c3 = grd_chksum3(calv.stored_ice)
    total = c3["chksum"]
    for f in (calv.stored_heat, calv.rmean_calving,
              calv.rmean_calving_hflx):
        bits = (jax.lax.bitcast_convert_type(f, jnp.uint32)
                if f.dtype == jnp.float32 else f.astype(jnp.uint32))
        total = total + jnp.sum(bits, dtype=jnp.uint32)
    return total, c3


def check_state(st, grid, cfg, label: str = "", fatal: bool = True):
    """Runtime invariant checks (the debug-mode analogs of
    ``check_position`` / duplicate detection / NaN scrubbing,
    icebergs.F90:7117-7131, icebergs_framework.F90:7344-7453).

    Host-side; returns a list of problem strings (and raises when fatal).
    """
    problems = []
    alive = np.asarray(st.alive)
    if alive.any():
        for f in ("lon", "lat", "uvel", "vvel", "mass", "thickness"):
            a = np.asarray(getattr(st, f))[alive]
            if not np.all(np.isfinite(a)):
                problems.append(f"non-finite {f}")
        ine = np.asarray(st.ine)[alive]
        jne = np.asarray(st.jne)[alive]
        if (ine < 0).any() or (ine >= grid.nx).any() \
                or (jne < 0).any() or (jne >= grid.ny).any():
            problems.append("cell index out of range")
        xi = np.asarray(st.xi)[alive]
        yj = np.asarray(st.yj)[alive]
        if (xi < -1e-4).any() or (xi > 1 + 1e-4).any() \
                or (yj < -1e-4).any() or (yj > 1 + 1e-4).any():
            problems.append("xi/yj outside the unit cell")
        from .ids import check_for_duplicate_ids
        dups = check_for_duplicate_ids(st)
        if len(dups):
            problems.append(f"{len(dups)} duplicate ids")
        if cfg.iceberg_bonds_on:
            from .ops.forces import check_bond_reciprocity
            nbad = int(check_bond_reciprocity(st))
            if nbad:
                problems.append(f"{nbad} non-reciprocal bonds")
    if problems and fatal:
        raise RuntimeError(f"KID-TPU check_state[{label}]: "
                           + "; ".join(problems))
    return problems


def debug_write_and_stop(st, cfg, path: str = "debug_state.nc",
                         message: str = "debugwriteandstop"):
    """Dump the full particle state and abort (debugwriteandstop,
    icebergs.F90:180-191)."""
    from .io.restart import write_restart_bergs
    write_restart_bergs(path, st, cfg)
    raise RuntimeError(f"KID-TPU {message}: state dumped to {path}")


class Budgets(NamedTuple):
    nbergs: jnp.ndarray
    mass: jnp.ndarray            # berg kg (incl. mass_scaling)
    mass_of_bits: jnp.ndarray    # ALL bits kg (bergy + fl + fl-bergy)
    heat: jnp.ndarray            # J
    stored_ice: jnp.ndarray      # kg in calving buckets
    stored_heat: jnp.ndarray
    # category split (sum_mass justbergs/justbits/justflbits,
    # icebergs_framework.F90:6606-6680) for the full budget tables
    bergy_mass: jnp.ndarray = None       # bergy bits only
    fl_bits_mass: jnp.ndarray = None     # footloose bits (+fl bergy)


def compute_budgets(st, calv=None) -> Budgets:
    """Global sums for the budget table (sum_mass/sum_heat,
    icebergs_framework.F90:6606-6680)."""
    own = st.alive & (st.halo_berg < 0.5)
    mass = jnp.sum(jnp.where(own, st.mass * st.mass_scaling, 0.))
    bergy = jnp.sum(jnp.where(own, st.mass_of_bits * st.mass_scaling, 0.))
    flb = jnp.sum(jnp.where(
        own, (st.mass_of_fl_bits + st.mass_of_fl_bergy_bits)
        * st.mass_scaling, 0.))
    # floating heat covers bergs AND their bits (sum_heat with no
    # flags, icebergs_framework.F90:6636-6666: (mass + all bits) *
    # heat_density)
    heat = jnp.sum(jnp.where(
        own, (st.mass + st.mass_of_bits + st.mass_of_fl_bits
              + st.mass_of_fl_bergy_bits) * st.mass_scaling
        * st.heat_density, 0.))
    z = jnp.zeros(())
    return Budgets(
        nbergs=jnp.sum(own.astype(jnp.int32)),
        mass=mass, mass_of_bits=bergy + flb, heat=heat,
        stored_ice=jnp.sum(calv.stored_ice) if calv is not None else z,
        stored_heat=jnp.sum(calv.stored_heat) if calv is not None else z,
        bergy_mass=bergy, fl_bits_mass=flb)


def report_budget(tag: str, b0: Budgets, b1: Budgets, dt_total: float,
                  melt_kg=0.0, calving_in_kg=0.0):
    """Print a budget-closure table in the spirit of ``report_budget``
    (icebergs.F90:5890-5995): start/end stocks per category, deltas,
    boundary fluxes and the closure error."""
    dm = float(b1.mass + b1.stored_ice - b0.mass - b0.stored_ice)
    rhs = float(calving_in_kg) - float(melt_kg)
    err = dm - rhs
    denom = max(abs(float(b1.mass)), 1.0)

    def row(name, v0, v1, unit):
        print(f"KID-TPU budget | {name:<14} | {float(v0):14.7e} | "
              f"{float(v1):14.7e} | {float(v1) - float(v0):+12.5e} {unit}")

    print(f"KID-TPU budget [{tag}] over {dt_total:.0f} s "
          f"(start | end | delta):")
    row("bergs", b0.nbergs, b1.nbergs, "#")
    row("berg mass", b0.mass, b1.mass, "kg")
    row("bits mass", b0.mass_of_bits, b1.mass_of_bits, "kg")
    row("stored ice", b0.stored_ice, b1.stored_ice, "kg")
    row("stored heat", b0.stored_heat, b1.stored_heat, "J")
    row("heat content", b0.heat, b1.heat, "J")
    print(f"KID-TPU budget | in-out={rhs:+.5e} kg  dM={dm:+.5e} kg  "
          f"err={err:+.3e} kg (rel {err / denom:+.3e})")
    return err


class IntervalBudget:
    """Interval source/sink accumulators for the reference's
    category-resolved budget tables (the ``lbudget`` block,
    icebergs.F90:5700-5860).

    The driver (or any coupling loop) feeds one step's diagnostics in
    after every step; :func:`report_full_budget` prints the tables each
    ``verbose_hrs`` and the accumulators reset — exactly the reference's
    cadence.  All values are plain Python floats (host-side)."""

    SCALARS = (
        "nbergs_calved",          # bucket spawns granted
        "nbergs_calved_fl",       # footloose children spawned
        "nbergs_melted",          # deaths by melt
        "nspeeding_tickets",
        "net_calving_used",       # kg drawn from the buckets
        "net_incoming_calving_heat_used",   # J drawn from stored heat
        "net_calving_to_bergs",   # kg given to newborn bergs
        "net_heat_to_bergs",      # J given to newborn bergs
        "net_melt",               # kg total floating -> ocean
        "berg_melt",              # kg melted off bergs proper
        "bergy_src",              # kg eroded into bergy bits
        "bergy_melt",             # kg bergy bits -> ocean
        "fl_bits_src",            # kg footloose-calved into fl bits
        "fl_bits_melt",           # kg fl bits -> ocean
        "fl_to_berg_kg",          # kg fl bits promoted into new bergs
        "flb_to_bergy_kg",        # kg fl bergy bits -> bergy bits
        "net_heat_to_ocean",      # J
    )

    def __init__(self):
        self.reset()

    def reset(self):
        for k in self.SCALARS:
            setattr(self, k, 0.0)

    def _field_kg(self, field, grid, dt):
        """(nx+2, ny+2) kg/m2/s rate field -> interval kg."""
        if field is None:
            return 0.0
        import numpy as np
        return float(np.sum(np.asarray(field * grid.area))) * dt

    def add_step(self, d, grid, dt):
        """Accumulate one step's ``StepDiags`` / ``RunOutputs``-like
        diagnostics (missing attributes count as zero).

        The mass sinks use the STRICT per-category scalars carried on
        the diags (net_melt_kg/berg_melt_kg/... from
        ops.thermo.MeltDiags) — the gridded melt fields lump the
        fl-internal erosion like the reference's diagnostics do, which
        would break exact per-category closure."""
        import numpy as np

        def sc(name):
            v = getattr(d, name, None)
            return float(np.asarray(v)) if v is not None else 0.0

        self.nbergs_calved += sc("nbergs_calved")
        self.nbergs_calved_fl += sc("nbergs_calved_fl")
        self.nbergs_melted += sc("nbergs_melted") + sc("nbergs_deleted_fl")
        self.nspeeding_tickets += sc("tickets")
        self.net_calving_used += sc("net_calving_used")
        self.net_incoming_calving_heat_used += sc("heat_used")
        self.net_calving_to_bergs += sc("calving_to_bergs")
        self.net_heat_to_bergs += sc("heat_to_bergs")
        self.net_heat_to_ocean += sc("net_melt_heat")
        self.net_melt += sc("net_melt_kg")
        self.berg_melt += sc("berg_melt_kg")
        self.bergy_src += sc("bergy_src_kg")
        self.bergy_melt += sc("bergy_melt_kg")
        # fl-category outflow: fl-bits loss MINUS the part eroded into
        # fl bergy bits (stays in the category) PLUS fl-bergy-bits melt
        self.fl_bits_melt += (sc("fl_bits_melt_kg")
                              - sc("flb_internal_eros_kg")
                              + sc("flb_bergy_melt_kg"))
        # footloose shed mass enters the fl category via the rate field
        # (NET of the promoted mass, which the two promotion scalars
        # then re-route into the berg and bergy categories)
        self.fl_bits_src += self._field_kg(
            getattr(d, "fl_bits_src", None), grid, dt)
        self.fl_to_berg_kg += sc("fl_to_berg_kg")
        self.flb_to_bergy_kg += sc("flb_to_bergy_kg")


def report_full_budget(tag: str, b0: Budgets, b1: Budgets,
                       acc: IntervalBudget, file=None):
    """The reference's category-resolved budget tables
    (report_state / report_istate / report_ibudget / report_budget,
    icebergs.F90:5780-5860) over one verbose interval.

    Rows print in the reference's order with the same in/out term
    decomposition; every ``budget`` row carries the reference's
    normalized closure error.  Returns ``{row_title: error}`` so tests
    can assert term-by-term closure."""
    import sys
    out = file or sys.stdout
    errs = {}

    def p(line):
        print(f"KID-TPU: {line}", file=out)

    def f(v):
        return f"{float(v):14.7e}"

    def state(title, v0, v1, unit, nbergs=None):
        tail = (f", # of bergs={int(nbergs):8d}"
                if nbergs is not None else "")
        p(f"{title + ' state:':<22}start={f(v0)} {unit}, end={f(v1)} "
          f"{unit}, Delta={f(v1 - v0)} {unit}{tail}")

    def istate(title, v0, v1):
        p(f"{title + ' state:':<22}start={int(v0):14d}, "
          f"end={int(v1):14d}, Delta={int(v1 - v0):14d}")

    def budget(title, unit, in_s, inv, out_s, outv, v0, v1):
        d_state = float(v1) - float(v0)
        d_flux = float(inv) - float(outv)
        err = (d_state - d_flux) / max(1e-30, max(abs(d_state),
                                                  abs(d_flux)))
        errs[title] = err
        p(f"{title + ' budget:':<22}{in_s} in={f(inv)} {unit}, "
          f"{out_s} out={f(outv)} {unit}, Delta={f(d_flux)} {unit}, "
          f"error={err:10.3e} nd")

    def ibudget(title, in1_s, in1, in2_s, in2, out_s, outv, v0, v1):
        d = int(in1) + int(in2) - int(outv)
        err = (int(v1) - int(v0)) - d
        errs[title] = err
        p(f"{title + ' budget:':<22}{in1_s} in={int(in1):10d}, "
          f"{in2_s} in={int(in2):10d}, {out_s} out={int(outv):10d}, "
          f"Delta={d:10d}, error={err:10d}")

    def consistant(title, unit, a_s, av, b_s, bv):
        err = (float(bv) - float(av)) / (float(bv) + float(av) + 1e-30)
        errs[f"{title} check"] = err
        p(f"{title + ' check:':<22}{a_s}={f(av)} {unit}, "
          f"{b_s}={f(bv)} {unit}, error={err:10.3e} nd")

    floating0 = float(b0.mass) + float(b0.mass_of_bits)
    floating1 = float(b1.mass) + float(b1.mass_of_bits)
    p(f"budget tables [{tag}]")
    state("stored ice", b0.stored_ice, b1.stored_ice, "kg")
    state("floating", floating0, floating1, "kg", nbergs=b1.nbergs)
    state("icebergs", b0.mass, b1.mass, "kg")
    state("bits", b0.bergy_mass, b1.bergy_mass, "kg")
    state("fl_bits", b0.fl_bits_mass, b1.fl_bits_mass, "kg")
    istate("berg #", b0.nbergs, b1.nbergs)
    ibudget("berg #", "calved", acc.nbergs_calved,
            "FL calved", acc.nbergs_calved_fl,
            "melted", acc.nbergs_melted, b0.nbergs, b1.nbergs)
    budget("stored mass", "kg", "calving used", acc.net_calving_used,
           "bergs", acc.net_calving_to_bergs,
           b0.stored_ice, b1.stored_ice)
    budget("floating mass", "kg", "calving used",
           acc.net_calving_to_bergs, "melt", acc.net_melt,
           floating0, floating1)
    budget("berg mass", "kg", "calving+promo",
           acc.net_calving_to_bergs + acc.fl_to_berg_kg,
           "melt+eros+fl", acc.berg_melt + acc.fl_bits_src
           + acc.fl_to_berg_kg, b0.mass, b1.mass)
    budget("bits mass", "kg", "eros used",
           acc.bergy_src + acc.flb_to_bergy_kg,
           "bergs", acc.bergy_melt, b0.bergy_mass, b1.bergy_mass)
    budget("fl bits mass", "kg", "fl calving", acc.fl_bits_src,
           "fl melt+eros", acc.fl_bits_melt + acc.flb_to_bergy_kg,
           b0.fl_bits_mass, b1.fl_bits_mass)
    state("stored heat", b0.stored_heat, b1.stored_heat, "J")
    state("floating heat", b0.heat, b1.heat, "J")
    budget("stored heat", "J", "calving used",
           acc.net_incoming_calving_heat_used, "bergs",
           acc.net_heat_to_bergs, b0.stored_heat, b1.stored_heat)
    budget("flting heat", "J", "calved", acc.net_heat_to_bergs,
           "melt", acc.net_heat_to_ocean, b0.heat, b1.heat)
    if acc.nspeeding_tickets > 0:
        p(f"speeding tickets issued = {int(acc.nspeeding_tickets):4d}")
    return errs


class PhaseClocks:
    """Per-phase wall-clock accumulator — the ``mpp_clock`` analog.

    The reference registers one component clock plus sub-clocks for
    momentum / thermodynamics / interface / calving / communication /
    footloose / I-O / diagnostics (icebergs_framework.F90:896-908) and
    FMS prints the summary at the end of the run.  Here each phase is a
    context manager; :meth:`report` prints the same kind of table.

    JAX dispatch is asynchronous, so a phase that launches device work
    should pass ``sync=`` a value to block on (the phase then measures
    device time, not dispatch time); host-only phases omit it.
    """

    def __init__(self):
        self._tot = {}
        self._max = {}
        self._n = {}
        self._t0 = {}

    def begin(self, name: str):
        import time
        self._t0[name] = time.perf_counter()

    def end(self, name: str, sync=None):
        import time
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0.pop(name)
        self._tot[name] = self._tot.get(name, 0.0) + dt
        self._max[name] = max(self._max.get(name, 0.0), dt)
        self._n[name] = self._n.get(name, 0) + 1
        return dt

    @_contextmanager
    def __call__(self, name: str, sync_fn=None):
        self.begin(name)
        try:
            yield
        finally:
            self.end(name, sync=sync_fn() if sync_fn is not None else None)

    def report(self, tag: str = "clocks"):
        """Print the end-of-run clock table (mpp_clock summary analog)."""
        if not self._tot:
            return
        print(f"KID-TPU {tag} | {'phase':<24} | {'calls':>7} | "
              f"{'total s':>10} | {'mean ms':>9} | {'max ms':>9}")
        for name, tot in sorted(self._tot.items(), key=lambda kv: -kv[1]):
            n = self._n[name]
            print(f"KID-TPU {tag} | {name:<24} | {n:>7} | {tot:>10.3f} | "
                  f"{1e3 * tot / n:>9.3f} | {1e3 * self._max[name]:>9.3f}")


def dump_halo_state(st, label: str = "", device: int = -1, file=None):
    """``halo_debugging`` analog (icebergs_framework.F90:1828-1838): one
    'A id pe halo_berg i j' line per alive berg (+ its bond stamps), for
    eyeballing replication before/after a halo exchange.

    Accepts a single-device state or a stacked sharded slab (leading
    device axes of any rank); runs on host — call OUTSIDE jit, e.g.
    around ``exchange_particles`` when ``cfg.halo_debugging`` is set.
    """
    import sys
    out = file or sys.stderr

    lead = np.asarray(jax.device_get(st.alive))
    ndev = int(np.prod(lead.shape[:-1])) if lead.ndim > 1 else 1
    cap = lead.shape[-1]
    alive = lead.reshape(ndev, cap)
    idc = np.asarray(jax.device_get(st.id_cnt)).reshape(ndev, cap)
    idij = np.asarray(jax.device_get(st.id_ij)).reshape(ndev, cap)
    hb = np.asarray(jax.device_get(st.halo_berg)).reshape(ndev, cap)
    ine = np.asarray(jax.device_get(st.ine)).reshape(ndev, cap)
    jne = np.asarray(jax.device_get(st.jne)).reshape(ndev, cap)
    nb = np.asarray(jax.device_get(st.n_bonds)).reshape(ndev, cap)
    if label:
        print(f"halo_debugging [{label}]", file=out)
    for d in range(ndev):
        if device >= 0 and d != device:
            continue
        for k in np.nonzero(alive[d])[0]:
            print(f"A {int(idc[d, k])}:{int(idij[d, k])} pe={d} "
                  f"halo={int(hb[d, k])} i={int(ine[d, k])} "
                  f"j={int(jne[d, k])} bonds={int(nb[d, k])}", file=out)
