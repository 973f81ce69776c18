"""icebergs_tpu: a TPU-native Lagrangian iceberg dynamics framework.

A ground-up JAX/XLA re-design with the capabilities of NOAA-GFDL/icebergs
("KID"): point & finite-extent bergs (Martin & Adcroft 2010, Stern et al
2016/2017), bonded conglomerates and the iKID bonded-particle DEM with
multiple time stepping (Huth et al 2022b), footloose calving (Huth et al
2022a), thermodynamics, calving buckets, restarts and trajectories —
re-architected as fixed-capacity structure-of-arrays state stepped by a
single jit-compiled function, domain-decomposed with ``jax.sharding`` +
``shard_map`` instead of MPI.
"""

from .config import IcebergsConfig, NCLASSES
from .grid import Grid, make_uniform_grid, make_curvilinear_grid
from .state import (BergState, empty_state, create_bergs,
                    allocate_slots, grow_capacity)
from .forcing import (Forcing, uniform_forcing, forcing_from_arrays,
                      swirl_forcing)
from .model import (make_step, make_multi_step, step_dynamics,
                    interp_to_bergs, StepDiags)

__version__ = "0.1.0"

__all__ = [
    "IcebergsConfig", "NCLASSES",
    "Grid", "make_uniform_grid", "make_curvilinear_grid",
    "BergState", "empty_state", "create_bergs", "allocate_slots",
    "grow_capacity",
    "Forcing", "uniform_forcing", "forcing_from_arrays",
    "swirl_forcing",
    "make_step", "make_multi_step", "step_dynamics", "interp_to_bergs",
    "StepDiags",
    # lazily-importable subsystems: api, diag, diagnostics, calving,
    # footloose, mts, ids, timeutils, geometry, io.*, parallel.*
]


def __getattr__(name):
    """Lazy access to heavier submodules (icebergs_tpu.api etc.)."""
    import importlib
    if name in ("api", "diag", "diagnostics", "calving", "footloose",
                "mts", "ids", "timeutils", "geometry", "driver"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
