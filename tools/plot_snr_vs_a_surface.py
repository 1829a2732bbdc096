#!/usr/bin/env python3
"""Plot the measured SNR-vs-A surface golden (BASELINE config #4).

Reads golden/SNR_vs_A_surface.json (written by tools/regen_goldens.py
surface) and renders one panel per BLER target: required Es/N0 vs A, one
curve per rate, sum-product solid and normalized min-sum dashed, so the
min-sum penalty is visible per point.

Usage: python tools/plot_snr_vs_a_surface.py [--out golden/plots/...]
"""
import argparse
import json
import os
import sys

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RATES = [("0.2", "R=1/5"), ("0.333333", "R=1/3"),
         ("0.5", "R=1/2"), ("0.666667", "R=2/3")]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--golden", default=os.path.join(
        os.path.dirname(__file__), "..", "golden", "SNR_vs_A_surface.json"))
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "golden", "plots",
        "snr_vs_a_surface.png"))
    args = ap.parse_args()

    with open(args.golden) as f:
        g = json.load(f)
    A = g["A"]

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5), sharey=True)
    for ax, target in zip(axes, ("0.1", "0.01")):
        for i, (rk, label) in enumerate(RATES):
            color = f"C{i}"
            for algo, style in (("sum-product", "-"), ("min-sum", "--")):
                c = g["curves"][f"{algo}/{rk}"][f"required_esn0_db_at_{target}"]
                ax.plot(A, c, style, color=color,
                        label=f"{label} {algo}" if target == "0.1" else None)
        ax.set_title(f"required Es/N0 at BLER = {target}")
        ax.set_xlabel("A (transport block bits)")
        ax.grid(True, alpha=0.3)
    axes[0].set_ylabel("Es/N0 (dB)")
    axes[0].legend(fontsize=7, ncol=2)
    fig.suptitle("BG1 QPSK, flooding BP 50 it — SP solid, NMS dashed")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
