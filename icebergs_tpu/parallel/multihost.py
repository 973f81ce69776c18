"""Multi-host execution scaffolding (the jax.distributed layer).

The reference scales across nodes with FMS/MPI (`mpp_init`,
icebergs_framework.F90:10-14); the TPU-native equivalent is
`jax.distributed` + a global `Mesh` spanning every process's devices.
Every shard_map program in :mod:`icebergs_tpu.parallel.domain` is
layout-agnostic: the SAME `make_sharded_step` / `make_sharded_run` /
`make_sharded_mts_step` compiles over a multi-host mesh unchanged —
collectives ride ICI within a slice and DCN across slices, inserted by
XLA from the mesh topology.

Host-side init/IO boundaries (shard_state, shard_forcing, restart
writes) address only the local process's shard through
``jax.local_devices()``; the distributed-restart files
(io/restart.write_restart_bergs_tiled) already map one file per tile,
which is one file per process-local device here.

This module is exercised single-process in the test suite (the
n_processes == 1 path is the identity); multi-process bring-up needs a
real multi-host allocation.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Initialize jax.distributed when running as one of many processes.

    Environment-driven (TPU pods set everything automatically when the
    arguments are None).  A single-process run (no coordinator and no
    cluster env) is a no-op.  Returns the process count.
    """
    import os
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS",
            os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        # single-process run (dev boxes may still carry TPU pod env vars
        # from the device plugin — they do not imply a coordinator)
        return 1
    # 300 s init leash: the default 30 s Gloo rendezvous deadline flakes
    # when many xdist workers compile concurrently on one core
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               initialization_timeout=300)
    return jax.process_count()


def make_global_mesh(axis: str = "x", devices=None) -> Mesh:
    """1-D mesh over ALL devices of ALL processes, ordered so each
    process's devices are contiguous along the ring (tile d of the
    domain decomposition lives on global device d; neighboring tiles
    are same-process or DCN/ICI neighbors)."""
    if devices is None:
        devices = sorted(jax.devices(),
                         key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devices), (axis,))


def make_global_mesh_2d(ndx: int, ndy: int, axes=("x", "y"),
                        devices=None) -> Mesh:
    """(ndx, ndy) mesh over all processes' devices (x-major: a row of
    tiles per process when ndy == local device count)."""
    if devices is None:
        devices = sorted(jax.devices(),
                         key=lambda d: (d.process_index, d.id))
    assert len(devices) >= ndx * ndy, "not enough devices for the mesh"
    arr = np.array(devices[:ndx * ndy]).reshape(ndx, ndy)
    return Mesh(arr, axes)


def local_tile_range(mesh: Mesh):
    """Global tile indices owned by THIS process along the mesh's first
    axis (the host-side IO boundary: which per-tile restart/trajectory
    files this process reads/writes)."""
    devs = mesh.devices.reshape(-1)
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    return (min(mine), max(mine) + 1) if mine else (0, 0)
