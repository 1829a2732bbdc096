"""Profiling helpers.

The reference has no profiling at all (SURVEY.md section 5).  Here:

- ``trace(path)``: context manager around jax.profiler for XProf traces of
  the jitted sim step (view with tensorboard / xprof).
- ``slope_time(f, x)``: per-call device time of a jitted function measured
  by chaining K calls inside one jit and fetching a scalar — the only
  reliable way to time through an async / remote dispatch layer where
  block_until_ready may not block and host fetches pay transfer costs.
"""
from __future__ import annotations

import contextlib
import time
from functools import partial

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(path: str = "/tmp/ldpc_tpu_trace"):
    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def slope_time(f, x, k_lo: int = 2, k_hi: int = 18, reps: int = 5) -> float:
    """Per-call seconds of ``f(x)`` (f must map an array to a pytree)."""

    def chained(x, k):
        def body(i, acc):
            y = f(x + acc * 1e-30)
            leaf = jax.tree_util.tree_leaves(y)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    lo = jax.jit(partial(chained, k=k_lo))
    hi = jax.jit(partial(chained, k=k_hi))
    float(lo(x))
    float(hi(x))  # compile both

    def best(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (k_hi - k_lo)
