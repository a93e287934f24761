"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host CPU devices instead (same XLA partitioner, same
collectives).  Set AVL_TPU_TESTS=1 to run on real TPU devices instead.
"""

import os

if not os.environ.get("AVL_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # the axon TPU plugin ignores JAX_PLATFORMS; force via config too,
    # before any backend initialization (otherwise the whole suite
    # silently dispatches over the TPU tunnel)
    import jax
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
