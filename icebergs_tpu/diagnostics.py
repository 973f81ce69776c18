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

# the reference's diagnostic catalog (subset of register_diag_field names,
# icebergs_framework.F90:210-224 / icebergs.F90:5529-5634)
CATALOG = (
    "calving", "calving_hflx", "floating_melt", "berg_melt", "melt_buoy",
    "melt_eros", "melt_conv", "bergy_src", "bergy_melt", "fl_bits_melt",
    "fl_bits_src", "spread_mass", "spread_area", "spread_uvel",
    "spread_vvel", "ustar_iceberg", "mass_on_ocean", "u_iceberg",
    "v_iceberg", "real_calving", "stored_ice", "stored_heat", "berg_count",
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

    def init_state(self, dtype=jnp.float32) -> DiagState:
        shape = (self.grid.nx + 2, self.grid.ny + 2)
        return DiagState(
            sums={n: jnp.zeros(shape, dtype) for n in self.names},
            count=jnp.zeros((), jnp.int32))

    def send_data(self, dstate: DiagState, fields: dict) -> DiagState:
        """Accumulate a step's diagnostics (send_data analog).
        Unknown/None fields are ignored; 3-D fields are summed over the
        class axis."""
        sums = dict(dstate.sums)
        for name in self.names:
            v = fields.get(name)
            if v is None:
                continue
            if v.ndim == 3:
                v = jnp.sum(v, axis=-1)
            sums[name] = sums[name] + v
        return DiagState(sums=sums, count=dstate.count + 1)

    def flush(self, dstate: DiagState, path: str, time_value: float = 0.):
        """Write accumulated (time-averaged) fields to a history NetCDF
        and reset the accumulator."""
        n = max(int(dstate.count), 1)
        mode = "w"
        with netcdf_file(path, mode) as f:
            f.createDimension("xaxis_1", self.grid.nx)
            f.createDimension("yaxis_1", self.grid.ny)
            f.createDimension("Time", 1)
            tv = f.createVariable("Time", "d", ("Time",))
            tv[:] = [time_value]
            for name, arr in dstate.sums.items():
                a = np.asarray(arr)[1:-1, 1:-1]
                if self.average:
                    a = a / n
                v = f.createVariable(name, "d",
                                     ("Time", "yaxis_1", "xaxis_1"))
                v[:] = a.T[None]
        return self.init_state(next(iter(dstate.sums.values())).dtype)


def collect_step_fields(outputs, extra: Optional[dict] = None) -> dict:
    """Build the send_data field dict from RunOutputs / StepDiags."""
    d = {}
    for name in CATALOG:
        v = getattr(outputs, name, None)
        if v is not None:
            d[name] = v
    if extra:
        d.update(extra)
    return d


def monitor_a_berg(st, berg_id: int, label: str = ""):
    """Single-particle tracing (monitor_a_berg / debug_iceberg_with_id,
    icebergs_framework.F90:4245-4269): print the berg's vitals if present.
    Host-side diagnostic."""
    ids = np.asarray(st.id_cnt).astype(np.int64) * (2 ** 32) \
        + np.asarray(st.id_ij)
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
