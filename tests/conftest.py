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

# Persistent compilation cache: the suite is compile-bound (every jitted
# config is a fresh XLA compile) and test configs are stable across runs,
# so warm runs of the quick tier skip almost all compilation.  File-based,
# safely shared by xdist workers; keyed on HLO + compiler version, so
# semantics changes recompile exactly what they touch.
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the XLA CPU JIT code arena per worker.

    Every jitted config is a large fresh compile; a long-lived xdist worker
    accumulates executables until LLVM's contiguous code-section arena
    overflows ("Unable to allocate section memory!" — observed as a
    'node down' worker death).  Dropping executable references at module
    boundaries lets the arena recycle; cross-module cache reuse is ~nil
    anyway (each module compiles its own configs).
    """
    yield
    import jax

    jax.clear_caches()
