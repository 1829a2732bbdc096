"""Test harness configuration.

Default tier: tests run on a virtual 8-device CPU mesh (no TPU needed) —
the sharding tests exercise the same pjit/shard_map code paths the driver
dry-runs, and CPU keeps the suite hermetic and fast.  Must run before any
other jax import.

TPU tier: ``LDPC_TEST_TPU=1 python -m pytest -m tpu -n0`` leaves the
platform alone (the axon TPU tunnel) so the tests marked ``tpu`` run the
COMPILED pallas kernel — not interpret mode — against the XLA oracles.
Use ``-n0``: the suite must never run more than one TPU process at a time
(the relay queues and everything slows 10-100x).  Tests marked ``tpu``
self-skip when the backend is not a TPU, so the default CPU tier ignores
them.
"""
import os

if not os.environ.get("LDPC_TEST_TPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
