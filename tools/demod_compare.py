#!/usr/bin/env python3
"""Measure exact-vs-max-log LLR demodulation BLER on a 64QAM link (TPU).

The reference's NRDemodulator exposes DecisionMethod = 'Log-likelihood
ratio' | 'Approximate log-likelihood ratio' (NRDemodulator.m:10); this
artifact demonstrates the same knob end-to-end: two BLER waterfalls on an
identical 64QAM BG1 link differing only in demod method.  Expected: the
max-log curve sits within ~0.1 dB of exact at these rates.

Writes golden/demod_methods_64QAM.json.
"""
import json
import os
import sys

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


def main():
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ldpc_3gpp_tpu.parallel.sweep import bler_vs_snr

    out = {
        "description": (
            "Exact vs max-log ('Approximate log-likelihood ratio', "
            "NRDemodulator.m:10) soft demodulation on a 64QAM link: BG1 "
            "A=4008 R=1/2 (G=8016), layered normalized min-sum 12 "
            "iterations, >=100 block errors per point, seed 0, TPU v5e."
        ),
    }
    for method in ("exact", "maxlog"):
        pts = bler_vs_snr(
            A=[4008], rate=[1 / 2], bg=[1], modulation="64QAM",
            iterations=12, target_block_errors=100, target_bler=1e-3,
            esn0_start=8.0, esn0_delta=0.25, seed=0, algorithm="min-sum",
            backend="pallas", schedule="layered", demod_method=method,
            batch_per_device=1024, steps_per_call=2, results_dir="results",
        )[(1, 1 / 2, 4008)]
        out[method] = {
            "esn0_db": [p.esn0_db for p in pts],
            "bler": [p.bler for p in pts],
            "blocks": [p.blocks for p in pts],
        }
    path = os.path.join(GOLDEN, "demod_methods_64QAM.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
