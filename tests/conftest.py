"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed): the sharding tests
exercise the same pjit/shard_map code paths the driver dry-runs, and CPU
keeps the suite hermetic and fast.  Must run before any other jax import.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
