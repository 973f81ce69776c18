"""Gridded diagnostics manager: the diag_manager analog.

The reference registers ~50 gridded fields with FMS diag_manager
(``register_diag_field``/``send_data``, icebergs.F90:5529-5634; id fields
icebergs_framework.F90:210-224) and lets a ``diag_table`` select which are
written.  Here a :class:`DiagManager` holds a registry of named fields,
accumulates per-step values (instantaneous or time-averaged), and drains
them to a NetCDF history file.

All accumulation happens on device (pure pytree state); only ``flush``
touches the host.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from scipy.io import netcdf_file

# the reference's diagnostic catalog (register_diag_field names,
# icebergs_framework.F90:210-229 registrations / send_data block
# icebergs.F90:5529-5634).  One row per reference field; `melt` is the
# reference's name for floating_melt's registered field and
# melt_m_per_year its unit-converted twin (icebergs.F90:5551-5553).
CATALOG = (
    # calving pipeline
    "calving", "calving_hflx", "calving_hflx_in", "accum_calving",
    "unused_calving", "real_calving", "stored_ice", "stored_heat",
    "running_mean_calving", "running_mean_calving_hflx",
    # melt
    "melt", "melt_m_per_year", "floating_melt", "berg_melt", "melt_buoy",
    "melt_eros", "melt_conv", "melt_by_class", "melt_buoy_fl",
    "melt_eros_fl", "melt_conv_fl", "fl_parent_melt", "fl_child_melt",
    # bits
    "bergy_src", "bergy_melt", "bergy_mass", "fl_bits_src", "fl_bits_melt",
    "fl_bits_mass", "fl_bergy_bits_mass",
    # spread / gridded state
    "spread_mass", "spread_area", "spread_uvel", "spread_vvel",
    "ustar_iceberg", "mass_on_ocean", "mass", "virtual_area", "u_iceberg",
    "v_iceberg",
    # forcing copies (icebergs.F90:5529-5548, 5604-5610)
    "uo", "vo", "ui", "vi", "ua", "va", "sst", "sss", "cn", "hi", "ssh",
    "taux", "tauy", "depth",
    # per-cell bookkeeping (icebergs.F90:5620-5634)
    "berg_count", "bergs_per_cell", "list_chksum",
)


class DiagState(NamedTuple):
    sums: Dict[str, jnp.ndarray]    # accumulated fields
    count: jnp.ndarray               # steps accumulated


class DiagManager:
    """Register fields, accumulate per step, flush to NetCDF."""

    def __init__(self, grid, selected=None, average: bool = True):
        self.grid = grid
        self.names = tuple(selected) if selected is not None else CATALOG
        self.average = average
        self._created: set = set()   # paths this manager created this run
        self._acc_cache: dict = {}   # jitted accumulators by field set

    def init_state(self, dtype=jnp.float32) -> DiagState:
        shape = (self.grid.nx + 2, self.grid.ny + 2)
        return DiagState(
            sums={n: jnp.zeros(shape, dtype) for n in self.names},
            count=jnp.zeros((), jnp.int32))

    def send_data(self, dstate: DiagState, fields: dict) -> DiagState:
        """Accumulate a step's diagnostics (send_data analog).
        Unknown/None fields are ignored; 3-D fields are summed over the
        class axis.

        The whole accumulation runs as ONE jitted dispatch (cached per
        present-field set): ~30 eager adds per step dominated long
        driver runs (69k-step footloose config: minutes of dispatch
        overhead)."""
        import jax
        present = tuple(n for n in self.names
                        if fields.get(n) is not None)
        fn = self._acc_cache.get(present)
        if fn is None:
            def acc(sums, count, vals):
                new = dict(sums)
                for n, v in vals.items():
                    if v.ndim == 3:
                        v = jnp.sum(v, axis=-1)
                    new[n] = new[n] + v
                return new, count + 1
            fn = jax.jit(acc)
            self._acc_cache[present] = fn
        vals = {n: jnp.asarray(fields[n]) for n in present}
        sums, count = fn(dict(dstate.sums), dstate.count, vals)
        return DiagState(sums=sums, count=count)

    def flush(self, dstate: DiagState, path: str, time_value: float = 0.):
        """Append the accumulated (time-averaged) record to the NetCDF
        history file and reset the accumulator.  Repeated flushes grow
        the unlimited Time axis in place (the diag_manager history-file
        behavior) — O(record) memory and I/O per flush, nothing retained
        on the host between flushes."""
        n = max(int(dstate.count), 1)
        rec = {}
        for name, arr in dstate.sums.items():
            a = np.asarray(arr)[1:-1, 1:-1]
            if self.average:
                a = a / n
            rec[name] = a

        first = path not in self._created
        self._created.add(path)
        with netcdf_file(path, "w" if first else "a") as f:
            if first:
                f.createDimension("Time", None)  # unlimited; must be first
                f.createDimension("xaxis_1", self.grid.nx)
                f.createDimension("yaxis_1", self.grid.ny)
                tv = f.createVariable("Time", "d", ("Time",))
                for name in rec:
                    f.createVariable(name, "d",
                                     ("Time", "yaxis_1", "xaxis_1"))
            tv = f.variables["Time"]
            t = tv.shape[0] if tv.shape and tv.shape[0] else 0
            tv[t] = float(time_value)
            for name, a in rec.items():
                f.variables[name][t] = a.T
        return self.init_state(next(iter(dstate.sums.values())).dtype)


def collect_forcing_fields(frc=None, grid=None) -> dict:
    """Forcing-copy diagnostic fields (icebergs.F90:5529-5548) + grid
    depth.  Split from :func:`collect_step_fields` so driver loops with
    CONSTANT forcing compute them once, not per step (pass the result
    via ``forcing_fields=``)."""
    d = {}
    if frc is not None:
        # corner (B-grid) velocities averaged to centers so every catalog
        # field shares the (nx+2, ny+2) cell shape
        def to_center(a):
            c = 0.25 * (a[:-1, :-1] + a[1:, :-1] + a[:-1, 1:] + a[1:, 1:])
            out = jnp.zeros((c.shape[0] + 2, c.shape[1] + 2), a.dtype)
            return out.at[1:-1, 1:-1].set(c)
        for n in ("uo", "vo", "ui", "vi", "ua", "va"):
            v = getattr(frc, n, None)
            if v is not None:
                d[n] = to_center(v)
        for n in ("sst", "sss", "cn", "hi", "ssh"):
            v = getattr(frc, n, None)
            if v is not None:
                d[n] = v
        for n in ("taux", "tauy"):
            v = getattr(frc, n, None)
            if v is not None:
                d[n] = to_center(v) if v.ndim == 2 and \
                    v.shape[0] != d.get("sst", v).shape[0] else v
    if grid is not None and getattr(grid, "ocean_depth", None) is not None:
        d["depth"] = grid.ocean_depth
    return d


_PERCELL_JIT: dict = {}


def _percell_fields(st, grid):
    """Jitted per-cell count/chksum fields (icebergs.F90:5620-5634) —
    one dispatch per step instead of eager scatter chains."""
    import jax
    key = (int(st.capacity), int(grid.nx), int(grid.ny))
    fn = _PERCELL_JIT.get(key)
    if fn is None:
        from .diag import bergs_per_cell, list_chksum_per_cell
        fn = jax.jit(lambda s, g: (bergs_per_cell(s, g),
                                   list_chksum_per_cell(s, g)))
        _PERCELL_JIT[key] = fn
    return fn(st, grid)


def collect_step_fields(outputs, extra: Optional[dict] = None, *,
                        frc=None, grid=None, st=None, cfg=None,
                        forcing_fields: Optional[dict] = None) -> dict:
    """Build the send_data field dict from RunOutputs / StepDiags.

    Optionally adds the forcing-copy fields (icebergs.F90:5529-5548),
    grid depth, and the per-cell count/chksum fields (5620-5634).
    ``forcing_fields`` takes a precomputed :func:`collect_forcing_fields`
    dict (drivers with constant forcing hoist it out of the loop)."""
    d = {}
    for name in CATALOG:
        v = getattr(outputs, name, None)
        if v is not None:
            d[name] = v
    fm = d.get("floating_melt")
    if fm is not None:
        d.setdefault("melt", fm)
        if cfg is not None:
            d.setdefault("melt_m_per_year",
                         fm * (86400.0 * 365.0 / cfg.rho_bergs))
    if forcing_fields is not None:
        d.update(forcing_fields)
    elif frc is not None or grid is not None:
        d.update(collect_forcing_fields(frc, grid))
    if st is not None and grid is not None:
        d["bergs_per_cell"], d["list_chksum"] = _percell_fields(st, grid)
    if extra:
        d.update(extra)
    return d


def monitor_a_berg(st, berg_id: int, label: str = ""):
    """Single-particle tracing (monitor_a_berg / debug_iceberg_with_id,
    icebergs_framework.F90:4245-4269): print the berg's vitals if present.
    Host-side diagnostic."""
    from .ids import ids_of_state
    ids = np.asarray(ids_of_state(st))
    alive = np.asarray(st.alive)
    hit = np.nonzero(alive & (ids == berg_id))[0]
    for s in hit:
        print(f"KID-TPU monitor[{label}] id={berg_id} slot={s} "
              f"lon={float(np.asarray(st.lon)[s]):.6f} "
              f"lat={float(np.asarray(st.lat)[s]):.6f} "
              f"u={float(np.asarray(st.uvel)[s]):.6f} "
              f"v={float(np.asarray(st.vvel)[s]):.6f} "
              f"mass={float(np.asarray(st.mass)[s]):.6e}")
    return len(hit) > 0
