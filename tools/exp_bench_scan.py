#!/usr/bin/env python3
"""TPU experiment: (batch, steps) dispatch-surface scan for bench.py.

Re-scan after the batch-dispatch economics finding (DESIGN.md section 8b):
the chain's per-dispatch fixed cost is flat in the batch for multiples of
128 up to ~512, so larger batches with shallower fori loops may now beat
the round-2 optimum 128x1024.  Same measurement discipline as bench.py
(back-to-back dispatches, one aggregate host fetch, best of trials).

Usage: exp_bench_scan.py [batch:steps ...]
"""
import os
import sys
import time

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.rng import fast_key

    enable_compilation_cache()
    A, rate, qm = 8424, 1 / 3, 2
    G = round(A / rate / qm) * qm
    params = LDPCParams(BG=1, A=A, G=G, Q_m=qm)
    cfg = ChainConfig(
        params=params, modulation="QPSK", rv_sequence=(0,), iterations=12,
        algorithm="min-sum", early_termination=True, backend="auto",
        schedule="layered",
    )
    esn0 = jnp.float32(1.0)
    pairs = [tuple(int(x) for x in s.split(":")) for s in sys.argv[1:]] or [
        (128, 1024), (256, 512), (384, 256), (512, 256),
    ]

    for batch, steps in pairs:
        def sim_many(key, e, batch=batch, steps=steps):
            def body(i, acc):
                r = simulate_batch(cfg, jax.random.fold_in(key, i), e, batch)
                return (acc[0] + r.blocks, acc[1] + r.block_errors)
            zero = jnp.zeros((), jnp.int32)
            return jax.lax.fori_loop(0, steps, body, (zero, zero))

        sim = jax.jit(sim_many)
        _ = int(sim(fast_key(0), esn0)[1])  # compile + warm
        reps, trials = 6, 3
        times = []
        for t in range(trials):
            t0 = time.perf_counter()
            outs = [sim(fast_key(1 + t * reps + i), esn0) for i in range(reps)]
            _ = int(sum(o[1] for o in outs))
            times.append((time.perf_counter() - t0) / reps)
        best = min(times)
        tbs = batch * steps / best
        print(f"batch={batch:4d} steps={steps:5d}: {tbs/1e3:7.1f}k TB/s "
              f"({tbs*A/1e9:.3f} Gbit/s info)", flush=True)


if __name__ == "__main__":
    main()
