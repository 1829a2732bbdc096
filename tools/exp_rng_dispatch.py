#!/usr/bin/env python3
"""One-off TPU experiment: rbg-vs-threefry noise cost + dispatch pipelining."""
import os
import sys
import time
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    batch = 512
    G = 25272

    x = jax.jit(lambda: jnp.zeros((batch, 128)))()

    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            def draw(v, impl=impl):
                k = jax.random.key(0, impl=impl)
                k = jax.random.fold_in(k, jnp.sum(v).astype(jnp.int32) % 7)
                return jax.random.normal(k, (batch, G // 2, 2))

            t = slope_time(draw, x)
            print(f"normal[{impl:12s}]: {t*1e3:7.3f} ms ({t/batch*1e6:5.2f} us/cw)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"normal[{impl}]: FAILED {type(e).__name__}: {e}", flush=True)

    # dispatch pipelining: N sim calls submitted back-to-back, one fetch
    p = LDPCParams(BG=1, A=8424, G=G, Q_m=2)
    cfg = ChainConfig(params=p, modulation="QPSK", rv_sequence=(0,),
                      iterations=12, algorithm="min-sum",
                      early_termination=True, backend="pallas",
                      schedule="layered")
    steps = 8

    def sim_many(key, esn0_db):
        def body(i, acc):
            r = simulate_batch(cfg, jax.random.fold_in(key, i), esn0_db, batch)
            return acc + r.block_errors
        return jax.lax.fori_loop(0, steps, body, jnp.zeros((), jnp.int32))

    sim = jax.jit(sim_many)
    e = jnp.asarray(1.0, jnp.float32)
    _ = int(sim(jax.random.PRNGKey(0), e))  # compile+warm

    # sequential fetch (current bench style)
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        _ = int(sim(jax.random.PRNGKey(i + 1), e))
        ts.append(time.perf_counter() - t0)
    seq = min(ts)
    print(f"sequential-fetch: {seq*1e3:.1f} ms/call "
          f"-> {batch*steps/seq:,.0f} TB/s", flush=True)

    # pipelined: submit R calls, one summed fetch
    for R in (4, 8):
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            outs = [sim(jax.random.PRNGKey(100 + rep * R + i), e)
                    for i in range(R)]
            total = int(jnp.sum(jnp.stack(outs)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per = best / R
        print(f"pipelined x{R}:   {per*1e3:.1f} ms/call "
              f"-> {batch*steps/per:,.0f} TB/s (errors {total})", flush=True)


if __name__ == "__main__":
    main()
