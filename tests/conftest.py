"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors how the reference tests multi-node behavior on 1-4 MPI ranks of one
node (tests/*/RUN): we use XLA's host-platform device partitioning so the
sharded code paths compile and run without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the container's sitecustomize force-registers the axon TPU plugin and
# overrides JAX_PLATFORMS; the config knob below wins over both
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: this box has one CPU core, compiles dominate
# (KID_NO_CACHE=1 disables it — cross-machine XLA:CPU AOT entries are
# not portable and have produced buffer-count mismatches)
if not os.environ.get("KID_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
