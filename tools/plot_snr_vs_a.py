#!/usr/bin/env python3
"""CLI mirror of the reference's plot_SNR_vs_A.m.

Run with no arguments for the reference's default experiment
(plot_SNR_vs_A.m:37-49): A=1000..8000, BG1, R=1/3, QPSK, 50 iterations,
required Es/N0 at BLER 1e-2.  Writes results/*.txt (A<TAB>EsN0) and a PNG.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--A", type=int, nargs="+",
                    default=list(range(1000, 8001, 1000)))
    ap.add_argument("--rate", type=float, nargs="+", default=[1 / 3])
    ap.add_argument("--bg", type=int, default=1)
    ap.add_argument("--modulation", default="QPSK",
                    choices=["BPSK", "QPSK", "16QAM", "64QAM", "256QAM"])
    ap.add_argument("--rv-sequence", type=int, nargs="+", default=[0])
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--target-block-errors", type=int, default=100)
    ap.add_argument("--target-bler", type=float, default=1e-2)
    ap.add_argument("--esn0-start", type=float, default=-2.0)
    ap.add_argument("--esn0-delta", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--algorithm", default="sum-product",
                    choices=["sum-product", "min-sum", "offset-min-sum"])
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--schedule", default="flooding",
                    choices=["flooding", "layered"])
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--steps-per-call", type=int, default=2)
    ap.add_argument("--results-dir", default="results")
    ap.add_argument("--no-plot", action="store_true")
    args = ap.parse_args()

    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ldpc_3gpp_tpu.parallel.sweep import snr_vs_a

    curves = snr_vs_a(
        A=tuple(args.A), rate=tuple(args.rate), bg=args.bg,
        modulation=args.modulation, rv_sequence=tuple(args.rv_sequence),
        iterations=args.iterations,
        target_block_errors=args.target_block_errors,
        target_bler=args.target_bler, esn0_start=args.esn0_start,
        esn0_delta=args.esn0_delta, seed=args.seed, algorithm=args.algorithm,
        backend=args.backend, schedule=args.schedule,
        batch_per_device=args.batch_per_device,
        steps_per_call=args.steps_per_call, results_dir=args.results_dir,
    )
    if not args.no_plot and curves:
        from ldpc_3gpp_tpu.utils.plotting import plot_snr_vs_a

        path = plot_snr_vs_a(
            curves, out_path=os.path.join(args.results_dir, "SNR_vs_A.png")
        )
        print(f"plot: {path}")


if __name__ == "__main__":
    main()
