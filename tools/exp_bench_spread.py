#!/usr/bin/env python3
"""Measure run-to-run wall-clock spread of the on-chip throughput gate.

VERDICT round-4 item 6: test_bench_sweep_golden gates fresh throughput at
>= 70% of golden, justified by tunnel-queueing variance that was never
quantified.  This experiment measures the actual spread of repeated
``measure_throughput`` calls (each already best-of-``trials``) over the
axon tunnel, for the gated rows, so the band can either be tightened to
the measured spread or kept wide with a recorded justification
(DESIGN.md section 8d).

Usage:  python tools/exp_bench_spread.py [--repeats 8] [--trials 2]
"""
import argparse
import json

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--repeats", type=int, default=8,
                    help="independent measure_throughput calls per row")
    ap.add_argument("--trials", type=int, default=2,
                    help="trials per call (the gate uses 2)")
    args = ap.parse_args()

    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ldpc_3gpp_tpu.bench import measure_throughput, sweep_rows

    check = ("flagship_esn0_+1.0", "bg2_z208_sumproduct_flooding",
             "bg2_z208_sumproduct_layered", "bg2_z72_packed_layered")
    rows = {r["name"]: r for r in sweep_rows() if r["name"] in check}
    out = {}
    for name in check:
        row = rows[name]
        rates = []
        for _ in range(args.repeats):
            tb_per_sec, _, _, _ = measure_throughput(
                row["cfg"], row["esn0"], batch=row["batch"],
                steps=row["steps"], trials=args.trials, reps=2,
            )
            rates.append(tb_per_sec)
        lo, hi = min(rates), max(rates)
        med = sorted(rates)[len(rates) // 2]
        out[name] = {
            "rates_tb_per_sec": [round(r, 1) for r in rates],
            "min": round(lo, 1), "median": round(med, 1),
            "max": round(hi, 1),
            "spread_vs_median_pct": round(100 * (hi - lo) / med, 2),
            "min_vs_median_pct": round(100 * (med - lo) / med, 2),
        }
        print(json.dumps({name: out[name]}))
    worst = max(v["min_vs_median_pct"] for v in out.values())
    print(json.dumps({"worst_min_below_median_pct": worst,
                      "repeats": args.repeats, "trials": args.trials}))


if __name__ == "__main__":
    main()
