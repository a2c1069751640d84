"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform device-count override (the standard way to test pjit/shard_map
without a pod). Must be set before jax is imported anywhere.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon site hook (PYTHONPATH sitecustomize) forces the TPU platform even
# when JAX_PLATFORMS=cpu is set; override through jax.config, which wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
