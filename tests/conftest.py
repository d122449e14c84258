"""Test configuration: run on a virtual 8-device CPU mesh.

Set platform/device-count env vars before jax initializes so sharding
tests exercise real multi-device code paths without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(__file__))

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via the config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
