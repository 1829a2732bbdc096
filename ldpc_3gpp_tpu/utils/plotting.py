"""Plot helpers mirroring the reference's live figures.

The reference updates MATLAB figures while sweeping (plot_BLER_vs_SNR.m:157-160,
plot_SNR_vs_A.m:177-184).  Headless TPU hosts render to PNG instead: call these
on sweep results (or on the results/*.txt files they wrote).
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple


def plot_bler_curves(
    curves: Dict[tuple, list],
    out_path: str = "results/BLER_vs_SNR.png",
    title: str = "3GPP New Radio LDPC code, AWGN",
) -> str:
    """curves: {(bg, rate, A): [SweepPoint, ...]} from sweep.bler_vs_snr."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for (bg, rate, A), pts in sorted(curves.items()):
        xs = [p.esn0_db for p in pts if p.blocks > 0 and p.bler > 0]
        ys = [p.bler for p in pts if p.blocks > 0 and p.bler > 0]
        ax.semilogy(xs, ys, marker="o", label=f"BG{bg} R={rate:.3g} A={A}")
    ax.set_xlabel("$E_s/N_0$ [dB]")
    ax.set_ylabel("BLER")
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.4)
    ax.legend(loc="lower left")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_snr_vs_a(
    curves: Dict[float, List[Tuple[int, float]]],
    out_path: str = "results/SNR_vs_A.png",
    title: str = "Required $E_s/N_0$ vs A",
) -> str:
    """curves: {rate: [(A, required_esn0), ...]} from sweep.snr_vs_a."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for rate, pts in sorted(curves.items()):
        xs = [a for a, _ in pts]
        ys = [s for _, s in pts]
        ax.plot(xs, ys, marker="s", label=f"R={rate:.3g}")
    ax.set_xlabel("A")
    ax.set_ylabel("Required $E_s/N_0$ [dB]")
    ax.set_title(title)
    ax.grid(True, alpha=0.4)
    ax.legend(loc="best")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_base_graph(bg: int, i_ls: int = 0, out_path: str = "results/base_graph.png") -> str:
    """Spy plot of a base graph (the reference's plot_base_graph.m)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from ..spec.tables import BG_DIMS, base_graph

    rows, cols, _ = base_graph(bg, i_ls)
    nr, nc, _ = BG_DIMS[bg]
    m = np.zeros((nr, nc))
    m[rows, cols] = 1
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.spy(m, markersize=4)
    ax.set_title(f"TS38.212 base graph {bg} (i_LS={i_ls})")
    ax.set_xlabel("variable node block")
    ax.set_ylabel("check node block")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
