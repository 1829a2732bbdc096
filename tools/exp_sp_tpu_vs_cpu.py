#!/usr/bin/env python3
"""Measure whether the TPU sum-product trajectory matches the CPU oracle.

The SP bit-exactness contract (VALIDATION.md section 1) is scoped to
XLA:CPU — native/golden.cpp's phi reproduces XLA:CPU's f32 tanh/log
rounding, and conformance runs on that backend.  This experiment answers,
with a measurement, the companion question: does the SAME decode on the TPU
backend (XLA 'fast' path and the compiled Pallas kernel) produce the same
bits / parity flags / iteration counts as the CPU oracle, or does TPU
transcendental rounding diverge the trajectory?

Protocol: batches of noisy QPSK codewords at a near-waterfall Es/N0 (where
posteriors linger near zero and rounding differences can flip signs) are
decoded by (a) the CPU oracle (golden_decode_core), (b) the TPU XLA 'fast'
flooding SP path, (c) the TPU Pallas flooding SP kernel.  Reported per
pair: fraction of codewords with identical hard bits, identical parity
flags, identical iteration counts, and the max |posterior| at any
disagreeing bit (a tiny value means the flip happened inside the noise
floor of an ambiguous posterior, i.e. rounding, not a bug).

Run on the TPU:  python tools/exp_sp_tpu_vs_cpu.py
Result (measured 2026-08, v5e over the axon tunnel) is recorded in
VALIDATION.md section 1.
"""
import json

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)


def main():
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldpc_3gpp_tpu.ops import decoder_fast
    from ldpc_3gpp_tpu.ops.encoder import encode
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as decode_pallas
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.golden import golden_decode_core

    assert jax.default_backend() == "tpu", "run this on the TPU"

    p = LDPCParams(BG=2, A=2048, G=6144, Q_m=2)  # Z=208, the SP bench row
    iters = 8
    esn0 = 0.6  # near the 8-it SP waterfall: ambiguous posteriors abound
    batch, batches = 64, 4

    enc = jax.jit(partial(encode, p))

    def make_llrs(seed):
        rng = np.random.default_rng(seed)
        bits = rng.integers(0, 2, (batch, p.K)).astype(np.uint8)
        bits[:, p.K_prime:] = 0  # fillers encode as 0 (NRLDPCEncoder.m:150)
        # full lifted codewords via the (conformance-tested) JAX encoder
        cw = np.asarray(enc(jnp.asarray(bits)))
        var = 10.0 ** (-esn0 / 10.0)
        y = (1.0 - 2.0 * cw.astype(np.float64))
        y = y + rng.normal(0.0, np.sqrt(var), cw.shape)
        llr = (2.0 / var * y).astype(np.float32)
        # punctured first 2Z columns carry no channel information
        llr[:, : 2 * p.Z_c] = 0.0
        if p.K_prime < p.K:
            llr[:, p.K_prime : p.K] = np.float32(1e20)
        return llr

    fast_fn = jax.jit(
        partial(decoder_fast.decode, p, iterations=iters,
                algorithm="sum-product")
    )
    pallas_fn = jax.jit(
        partial(decode_pallas, p, iterations=iters, algorithm="sum-product",
                schedule="flooding")
    )

    stats = {k: dict(bits_same=0, parity_same=0, iters_same=0, n=0,
                     max_posterior_at_diff=0.0)
             for k in ("fast_vs_cpu", "pallas_vs_cpu", "pallas_vs_fast")}

    for b in range(batches):
        llr = make_llrs(100 + b)
        gb, gok, git, gtot = golden_decode_core(
            2, p.Z_c, llr, iterations=iters, algorithm="sum-product",
            return_totals=True,
        )
        rf = fast_fn(jnp.asarray(llr))
        rp = pallas_fn(jnp.asarray(llr))
        sides = {
            "fast_vs_cpu": (np.asarray(rf.bits), np.asarray(rf.parity_ok),
                            np.asarray(rf.iterations), gb, gok, git),
            "pallas_vs_cpu": (np.asarray(rp.bits), np.asarray(rp.parity_ok),
                              np.asarray(rp.iterations), gb, gok, git),
            "pallas_vs_fast": (np.asarray(rp.bits), np.asarray(rp.parity_ok),
                               np.asarray(rp.iterations), np.asarray(rf.bits),
                               np.asarray(rf.parity_ok),
                               np.asarray(rf.iterations)),
        }
        for k, (b1, ok1, it1, b2, ok2, it2) in sides.items():
            s = stats[k]
            same_bits = (b1 == b2).all(axis=-1)
            s["bits_same"] += int(same_bits.sum())
            s["parity_same"] += int((ok1 == ok2).sum())
            s["iters_same"] += int((it1 == it2).sum())
            s["n"] += batch
            diff = b1 != b2
            if diff.any():
                s["max_posterior_at_diff"] = max(
                    s["max_posterior_at_diff"],
                    float(np.abs(gtot[diff]).max()),
                )

    out = {
        "config": {"BG": 2, "A": 2048, "Z": p.Z_c, "esn0_db": esn0,
                   "iterations": iters, "algorithm": "sum-product",
                   "codewords": batches * batch},
        "pairs": {
            k: {
                "frac_bits_identical": round(v["bits_same"] / v["n"], 4),
                "frac_parity_identical": round(v["parity_same"] / v["n"], 4),
                "frac_iters_identical": round(v["iters_same"] / v["n"], 4),
                "max_|posterior|_at_any_bit_diff":
                    round(v["max_posterior_at_diff"], 4),
            }
            for k, v in stats.items()
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
