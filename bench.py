#!/usr/bin/env python3
"""Headline benchmark: decoded info throughput on one chip.

Config per BASELINE.json north star: BG1, Z=384 (A=8448), rate 1/3, QPSK,
normalized min-sum, full end-to-end chain (encode + modulate + AWGN + exact
LLR demod + BP decode + CRC gating) at an Es/N0 near the waterfall so early
termination reflects realistic iteration counts.

Prints one JSON line:
  {"metric": "decoded_info_mbps_per_chip", "value": N, "unit": "Mbit/s",
   "vs_baseline": N}

vs_baseline is measured codewords/s divided by an estimated MATLAB
single-threaded rate for the same config (comm.LDPCDecoder sum-product,
~25k-bit codewords at tens of iterations ~= 20 codewords/s; the reference
publishes no numbers — BASELINE.json "published": {}).  Target is >= 100x.

vs_measured_scalar_cpu is the fully MEASURED companion ratio: the same
config decoded by the independent single-core scalar C++ oracle
(native/golden.cpp nr_golden_decode, flooding BP with parity-check early
termination), timed on this host right before the TPU measurement.
"""
import json
import time

import jax
import jax.numpy as jnp


MATLAB_CODEWORDS_PER_SEC_EST = 20.0  # documented assumption, see module docstring


def measure_scalar_cpu(A, G, qm, esn0_db, iterations, min_seconds=1.5):
    """Measured single-core scalar CPU baseline: the independent C++ oracle.

    Times native/golden.cpp's full TB decode chain (nr_golden_decode —
    deliberately different algorithms from the TPU path: scalar
    lifted-adjacency flooding BP with parity-check early termination) at the
    bench config, on host-generated QPSK channel LLRs at the same Es/N0, for
    both normalized min-sum and sum-product.  This anchors ``vs_baseline``
    with a measured number; the 20 cw/s MATLAB estimate stays as a
    cross-check only.  Returns {algorithm: codewords_per_sec}.
    """
    import numpy as np

    from ldpc_3gpp_tpu.utils.golden import golden_decode, golden_encode

    rng = np.random.default_rng(0)
    a = rng.integers(0, 2, size=A).astype(np.uint8)
    g = golden_encode(1, A, G, qm, a)
    # exact QPSK LLRs (positive => bit 0): y = s + n, llr = 2*sqrt(2)*y/var
    var = 10.0 ** (-esn0_db / 10.0)
    y = (1.0 - 2.0 * g.astype(np.float64)) / np.sqrt(2.0)
    y = y + rng.normal(0.0, np.sqrt(var / 2.0), size=G)
    llr = (2.0 * np.sqrt(2.0) / var * y).astype(np.float32)

    rates = {}
    for algorithm in ("min-sum", "sum-product"):
        # warmup (also forces the make build outside the timed region)
        golden_decode(1, A, G, qm, llr, iterations=iterations,
                      algorithm=algorithm)
        n, elapsed = 0, 0.0
        t0 = time.perf_counter()
        while elapsed < min_seconds:
            golden_decode(1, A, G, qm, llr, iterations=iterations,
                          algorithm=algorithm)
            n += 1
            elapsed = time.perf_counter() - t0
        rates[algorithm] = n / elapsed
    return rates


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.rng import fast_key

    enable_compilation_cache()

    # A=8424 -> B=8448=K_cb: single code block, K'=8448, Z=384 (the north-star
    # kernel shape: BG1, Z=384, min-sum).
    A, rate, qm = 8424, 1 / 3, 2
    G = round(A / rate / qm) * qm
    params = LDPCParams(BG=1, A=A, G=G, Q_m=qm)
    assert params.Z_c == 384 and params.C == 1
    cfg = ChainConfig(
        params=params,
        modulation="QPSK",
        rv_sequence=(0,),
        iterations=12,
        algorithm="min-sum",
        early_termination=True,
        backend="auto",  # pallas kernel for Z=384
        schedule="layered",  # BASELINE config #2: layered normalized min-sum
    )

    batch = 128
    # sim steps per dispatch: amortises host->device launch latency.  The
    # (batch, steps) surface was re-scanned after the round-3 kernel/IO
    # fusions (tools/exp_bench_scan.py): 128x1024 319.0k, 128x2048 320.7k,
    # 128x4096 321.6k, 256x1024 317.4k TB/s — the deeper loops shave the
    # tunnel's fixed per-dispatch cost, with diminishing returns; 2048
    # balances that against bench wall time.  Non-power-of-two batches are
    # auto-padded by simulate_batch (DESIGN.md 8b); batch >= 1024 loses
    # ~20% (round-2 scan).
    steps = 2048
    esn0 = 1.0  # near the BG1 R=1/3 waterfall: realistic iteration mix

    def sim_many(key, esn0_db):
        def body(i, acc):
            r = simulate_batch(cfg, jax.random.fold_in(key, i), esn0_db, batch)
            return (acc[0] + r.blocks, acc[1] + r.block_errors)

        zero = jnp.zeros((), jnp.int32)
        return jax.lax.fori_loop(0, steps, body, (zero, zero))

    sim = jax.jit(sim_many)

    # compile + warmup (int() forces a host round trip — on the remote-TPU
    # tunnel block_until_ready alone does not guarantee execution finished)
    e = jnp.asarray(esn0, jnp.float32)
    r = sim(fast_key(0), e)
    _ = int(r[1])

    # The tunnel's fixed ~30 ms dispatch round trip would be ~50% of a
    # single call at these sizes, so submit each trial's calls back-to-back
    # and fetch ONE aggregate scalar (the only reliable sync point over the
    # tunnel) — on-device work then pipelines behind the transfers.  Best of
    # several trials rides out the shared pool's queueing variance.
    trials, reps = 4, 4  # 2x-deeper dispatches: half the reps, same blocks
    times = []
    errs = 0
    for t in range(trials):
        t0 = time.perf_counter()
        outs = [sim(fast_key(1 + t * reps + i), e) for i in range(reps)]
        errs += int(sum(o[1] for o in outs))  # host fetch = hard sync point
        times.append(time.perf_counter() - t0)

    blocks_per_call = batch * steps
    blocks = trials * reps * blocks_per_call
    best = min(times) / reps
    blocks_per_sec = blocks_per_call / best
    info_mbps = blocks_per_sec * A / 1e6

    # Measured single-core scalar C++ baseline at the same config (the
    # independent oracle; see measure_scalar_cpu).  Guarded: the bench's
    # headline number must never depend on the host toolchain.
    try:
        cpu = measure_scalar_cpu(A, G, qm, esn0, cfg.iterations)
    except Exception as e:  # noqa: BLE001
        cpu = {}
        print(f"# scalar-cpu baseline unavailable: {type(e).__name__}: {e}")
    print(
        json.dumps(
            {
                "metric": "decoded_info_mbps_per_chip",
                "value": round(info_mbps, 3),
                "unit": "Mbit/s",
                "vs_baseline": round(blocks_per_sec / MATLAB_CODEWORDS_PER_SEC_EST, 2),
                # measured ratio vs the single-core scalar C++ oracle decoding
                # the SAME config (normalized min-sum, 12 it, early term);
                # the MATLAB 20 cw/s figure above is only an estimate
                "vs_measured_scalar_cpu": (
                    round(blocks_per_sec / cpu["min-sum"], 2)
                    if "min-sum" in cpu else None
                ),
                "detail": {
                    "scalar_cpu_codewords_per_sec": {
                        k: round(v, 3) for k, v in cpu.items()
                    },
                    "config": "BG1 A=8424 Z=384 R=1/3 QPSK min-sum 12it early-term",
                    "esn0_db": esn0,
                    "transport_blocks_per_sec": round(blocks_per_sec, 2),
                    "block_errors": errs,
                    "blocks": blocks,
                    "rep_time_min_s": round(best, 4),
                    "rep_time_median_s": round(
                        sorted(times)[len(times) // 2] / reps, 4
                    ),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
