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


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_every_test():
    """Bound the XLA CPU JIT code arena per worker — green-by-construction.

    Every jitted config is a large fresh compile (or, warm, an AOT load
    from the persistent cache); XLA:CPU maps ALL of them into one finite
    contiguous code arena per process, and a long-lived xdist worker that
    accumulates executables dies — "Unable to allocate section memory!" at
    compile time, or a SIGSEGV inside the compilation-cache READ path at
    AOT-load time (diagnosed round 4).  Releasing executable references
    after EVERY test bounds arena pressure to a single test's programs, so
    no future test module can reintroduce the crash by forgetting a
    module-local fixture (the round-4 mitigation this replaces).

    Cost: in-memory executable reuse across tests is lost, but tests jit
    through fresh closures/partials (no cross-test pjit cache hits anyway)
    and the persistent .jax_cache turns any repeat into a disk read.
    Measured round 5 with this fixture: full suite 15:28-17:41 warm over
    4 consecutive clean runs (round-4 module-scope baseline: 18:55), with
    per-worker map counts sampled through a run oscillating ~1k-28k —
    ~2.3x under the 65,530 vm.max_map_count ceiling the crash lives at
    (CLAUDE.md).
    """
    yield
    import jax

    jax.clear_caches()
