"""Deviceless TPU AOT compile harness.

The dev environment's tunneled TPU rejects Mosaic kernels with an opaque
HTTP 500; the locally installed AOT libtpu (`pip libtpu`) runs the full
Mosaic backend pipeline client-side via jax.experimental.topologies, so
compiling here surfaces the real diagnostics without any TPU attached.

Usage: functions here build a fake v5e device mesh; wrap your function
with `aot_compile(fn, *shape_dtype_structs)` and read the exception.
"""

from __future__ import annotations

import numpy as np


_TOPO = None


def v5e_devices(n: int = 1):
    """n fake v5e devices from a deviceless 2x2 topology description."""
    global _TOPO
    import jax
    from jax.experimental import topologies

    if _TOPO is None:
        _TOPO = topologies.get_topology_desc(platform="tpu",
                                             topology_name="v5e:2x2")
    devs = list(_TOPO.devices)
    if n > len(devs):
        raise ValueError(f"only {len(devs)} fake v5e devices, asked {n}")
    return devs[:n]


def aot_compile(fn, *args, static_argnums=()):
    """AOT-compile fn for one fake v5e chip; returns the Compiled object.

    args are jax.ShapeDtypeStruct (or arrays, converted). Raises with the
    full Mosaic diagnostic on kernel rejection.
    """
    import jax
    from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

    mesh = Mesh(np.array(v5e_devices(1)), ("x",))
    sh = NamedSharding(mesh, P())

    def to_sds(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
        a = np.asarray(a)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)

    sds = [a if i in static_argnums else jax.tree.map(to_sds, a)
           for i, a in enumerate(args)]
    fj = jax.jit(fn, static_argnums=static_argnums)
    return fj.lower(*sds).compile()


def flops_and_bytes(compiled):
    """Cost analysis dict of an AOT-compiled executable."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return {k: ca.get(k) for k in ("flops", "bytes accessed",
                                   "transcendentals")}
