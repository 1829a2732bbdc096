"""Adaptive Monte-Carlo sweep drivers.

Host-side equivalents of the reference's experiment layer: the sequential
SNR-stepping decisions stay in Python (they are inherently adaptive,
plot_BLER_vs_SNR.m:104-171), while every inner trial batch runs as one
sharded, jitted device program (parallel/montecarlo.py).

- ``bler_vs_snr``: BLER waterfall per (BG, R, A), stepping Es/N0 upward by
  ``esn0_delta`` until BLER <= ``target_bler``  (plot_BLER_vs_SNR.m).
- ``snr_vs_a``: required Es/N0 at ``target_bler`` as a function of A, with
  the reference's log-domain interpolation       (plot_SNR_vs_A.m:175).

Results append to tab-separated files under ``results/`` with the same
layout as the reference (EsN0\\tBLER per line / A\\tEsN0 per line), so its
downstream plotting/aggregation workflow carries over.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np

from ..models.chain import ChainConfig
from ..ops.modulation import Q_M
from ..spec.params import LDPCParams
from ..spec.tables import UnsupportedParameters
from ..utils.rng import fast_key
from .montecarlo import MonteCarlo


def _scan_resume_file(fname, parse) -> Dict:
    """Parse a results file for resume, tolerating a torn final line.

    The file is append+flush-per-point, so the very crash resume recovers
    from can leave a partial or blank last line; skip anything that does
    not parse as exactly two well-formed fields instead of failing resume.
    """
    done = {}
    with open(fname) as fid:
        for line in fid:
            parts = line.split()
            if len(parts) != 2:
                continue
            try:
                k, v = parse(parts)
            except ValueError:
                continue
            done[k] = v
    return done


@dataclasses.dataclass
class SweepPoint:
    esn0_db: float
    blocks: int
    block_errors: int
    bit_errors: int
    iterations: int

    @property
    def bler(self) -> float:
        return self.block_errors / max(self.blocks, 1)


def _make_config(
    A: int,
    rate: float,
    bg: int,
    modulation: str,
    rv_sequence: Sequence[int],
    iterations: int,
    algorithm: str,
    **kw,
) -> ChainConfig:
    qm = Q_M[modulation]
    G = round(A / rate / qm) * qm  # plot_BLER_vs_SNR.m:94
    params = LDPCParams(BG=bg, A=A, G=G, Q_m=qm)
    return ChainConfig(
        params=params,
        modulation=modulation,
        rv_sequence=tuple(rv_sequence),
        iterations=iterations,
        algorithm=algorithm,
        **kw,
    )


def _simulate_point(
    mc: MonteCarlo,
    key: jax.Array,
    esn0: float,
    target_block_errors: int,
    found_start: bool,
    max_blocks: int,
    max_window: int = 8,
    prior_bler: float = 0.0,
) -> Tuple[SweepPoint, bool, jax.Array]:
    """Accumulate batches at one SNR until enough block errors are seen.

    Implements the reference's found-start fast-forward in batched form:
    before the first-ever success for this curve, a batch with zero
    successes abandons the point immediately (plot_BLER_vs_SNR.m:139-141).

    Once the point is known to need more samples, dispatches are pipelined
    in windows sized from the observed error rate (one host fetch per
    window — the fetch round trip would otherwise idle a remote TPU ~50%
    of the time at low BLER).
    """
    pt = SweepPoint(esn0, 0, 0, 0, 0)
    while pt.block_errors < target_block_errors and pt.blocks < max_blocks:
        key, sub = jax.random.split(key)
        if not found_start or max_window <= 1:
            c = mc.run(sub, esn0)
            if not found_start and c["block_errors"] == c["blocks"]:
                # no success yet anywhere, batch all errors: skip ahead
                pt = SweepPoint(esn0, c["blocks"], c["block_errors"],
                                c["bit_errors"], c["iterations"])
                return pt, False, key
            found_start = True
        else:
            need = target_block_errors - pt.block_errors
            if pt.block_errors > 0:
                rate = pt.block_errors / pt.blocks
            else:
                # previous point's BLER upper-bounds this (higher-SNR) one,
                # so the window it implies undershoots — safely so
                rate = prior_bler
            if rate > 0:
                per_call = rate * mc.blocks_per_run
                window = int(-(-need // max(per_call, 1e-9)))
            else:
                window = max_window  # no information: BLER is low, go wide
            headroom = -(-(max_blocks - pt.blocks) // mc.blocks_per_run)
            window = max(1, min(window, max_window, headroom))
            c = mc.run_pipelined(sub, esn0, window)
        pt.blocks += c["blocks"]
        pt.block_errors += c["block_errors"]
        pt.bit_errors += c["bit_errors"]
        pt.iterations += c["iterations"]
    return pt, found_start, key


def bler_vs_snr(
    A: Sequence[int] = (3842,),
    rate: Sequence[float] = (1 / 3,),
    bg: Sequence[int] = (2,),
    modulation: str = "QPSK",
    rv_sequence: Sequence[int] = (0,),
    iterations: int = 8,
    target_block_errors: int = 3,
    target_bler: float = 1e-3,
    esn0_start: float = 0.0,
    esn0_delta: float = 0.5,
    seed: int = 0,
    algorithm: str = "sum-product",
    batch_per_device: int = 256,
    steps_per_call: int = 1,
    max_blocks_per_point: int = 1_000_000,
    results_dir: str = "results",
    resume: bool = False,
    verbose: bool = True,
    live_plot: bool = False,
    **chain_kw,
) -> Dict[tuple, List[SweepPoint]]:
    """BLER-vs-Es/N0 waterfalls; defaults match plot_BLER_vs_SNR.m:30-42.

    ``resume=True`` skips Es/N0 points already present in the results file
    (the reference's append-per-point crash recovery, plot_BLER_vs_SNR.m:165,
    made explicit).

    ``live_plot=True`` re-renders ``results_dir/BLER_vs_SNR_live.png`` after
    every completed point — the headless equivalent of the reference's
    per-block figure updates (plot_BLER_vs_SNR.m:157-160); watch the file
    to monitor a long sweep.
    """
    os.makedirs(results_dir, exist_ok=True)
    out: Dict[tuple, List[SweepPoint]] = {}
    for bg_i in bg:
        for r_i in rate:
            for a_i in A:
                try:
                    cfg = _make_config(
                        a_i, r_i, bg_i, modulation, rv_sequence, iterations,
                        algorithm, **chain_kw,
                    )
                except UnsupportedParameters as e:
                    if verbose:
                        print(f"skip BG{bg_i} R={r_i} A={a_i}: {e}")
                    continue
                mc = MonteCarlo(
                    cfg,
                    batch_per_device=batch_per_device,
                    steps_per_call=steps_per_call,
                )
                fname = os.path.join(
                    results_dir,
                    f"BLER_vs_SNR_{a_i}_{r_i:g}_{bg_i}_{modulation}_"
                    f"{iterations}_{target_block_errors}_{esn0_start:g}_{seed}.txt",
                )
                done_points = {}
                if resume and os.path.exists(fname):
                    done_points = _scan_resume_file(
                        fname, lambda p: (round(float(p[0]), 6), float(p[1]))
                    )
                key = fast_key(seed)
                points: List[SweepPoint] = []
                esn0, bler, found_start = esn0_start, 1.0, False
                with open(fname, "a" if resume else "w") as fid:
                    while bler > target_bler:
                        if round(esn0, 6) in done_points:
                            bler = done_points[round(esn0, 6)]
                            found_start = found_start or bler < 1
                            if verbose:
                                print(f"resume: skipping {esn0:+.2f} dB "
                                      f"(BLER={bler:.3e})")
                            esn0 += esn0_delta
                            continue
                        pt, found_start, key = _simulate_point(
                            mc, key, esn0, target_block_errors,
                            found_start, max_blocks_per_point,
                            prior_bler=bler if bler < 1 else 0.0,
                        )
                        points.append(pt)
                        bler = pt.bler
                        if bler < 1:
                            fid.write(f"{esn0:f}\t{bler:e}\n")
                            fid.flush()
                        if live_plot:
                            from ..utils.plotting import plot_bler_curves

                            live = dict(out)
                            live[(bg_i, r_i, a_i)] = points
                            plot_bler_curves(
                                live,
                                os.path.join(results_dir,
                                             "BLER_vs_SNR_live.png"),
                            )
                        if verbose:
                            mean_it = pt.iterations / max(pt.blocks * cfg.params.C, 1)
                            print(
                                f"BG{bg_i} R={r_i:.3g} A={a_i} "
                                f"Es/N0={esn0:+.2f} dB  BLER={bler:.3e} "
                                f"({pt.block_errors}/{pt.blocks}, "
                                f"{mean_it:.1f} it/CB)"
                            )
                        esn0 += esn0_delta
                out[(bg_i, r_i, a_i)] = points
    return out


def snr_vs_a(
    A: Sequence[int] = tuple(range(1000, 8001, 1000)),
    rate: Sequence[float] = (1 / 3,),
    bg: int = 1,
    modulation: str = "QPSK",
    rv_sequence: Sequence[int] = (0,),
    iterations: int = 50,
    target_block_errors: int = 100,
    target_bler: float = 1e-2,
    esn0_start: float = -2.0,
    esn0_delta: float = 0.1,
    seed: int = 0,
    algorithm: str = "sum-product",
    batch_per_device: int = 256,
    steps_per_call: int = 1,
    max_blocks_per_point: int = 1_000_000,
    results_dir: str = "results",
    resume: bool = False,
    verbose: bool = True,
    live_plot: bool = False,
    **chain_kw,
) -> Dict[float, List[Tuple[int, float]]]:
    """Required Es/N0 at target BLER vs A; defaults match plot_SNR_vs_A.m:37-49.

    ``resume=True`` skips A values already present in the results file
    (append-per-point crash recovery, same contract as ``bler_vs_snr``).

    ``live_plot=True`` re-renders ``results_dir/SNR_vs_A_live.png`` after
    every completed A (headless equivalent of plot_SNR_vs_A.m:177-183).
    """
    os.makedirs(results_dir, exist_ok=True)
    out: Dict[float, List[Tuple[int, float]]] = {}
    for r_i in rate:
        fname = os.path.join(
            results_dir,
            f"SNR_vs_A_{target_bler:g}_{r_i:g}_{bg}_{modulation}_"
            f"{iterations}_{target_block_errors}_{seed}.txt",
        )
        done_as: Dict[int, float] = {}
        if resume and os.path.exists(fname):
            done_as = _scan_resume_file(
                fname, lambda p: (int(p[0]), float(p[1]))
            )
        curve: List[Tuple[int, float]] = []
        with open(fname, "a" if resume else "w") as fid:
            for a_i in A:
                if a_i in done_as:
                    curve.append((a_i, done_as[a_i]))
                    if verbose:
                        print(f"resume: skipping A={a_i} "
                              f"(required Es/N0 = {done_as[a_i]:.3f} dB)")
                    continue
                try:
                    cfg = _make_config(
                        a_i, r_i, bg, modulation, rv_sequence, iterations,
                        algorithm, **chain_kw,
                    )
                except UnsupportedParameters as e:
                    if verbose:
                        print(f"skip A={a_i}: {e}")
                    continue
                mc = MonteCarlo(
                    cfg,
                    batch_per_device=batch_per_device,
                    steps_per_call=steps_per_call,
                )
                key = fast_key(seed)
                esn0 = esn0_start - esn0_delta
                bler, prev_bler, prev_esn0 = 1.0, float("nan"), float("nan")
                found_start = False
                while bler > target_bler:
                    prev_esn0, esn0 = esn0, esn0 + esn0_delta
                    pt, found_start, key = _simulate_point(
                        mc, key, esn0, target_block_errors,
                        found_start, max_blocks_per_point,
                        prior_bler=bler if bler < 1 else 0.0,
                    )
                    prev_bler, bler = bler, pt.bler
                # log-domain interpolation to the target (plot_SNR_vs_A.m:175).
                # A zero-error final point has no measurable BLER; floor it at
                # the resolution of the sample size so log10 stays finite
                # (otherwise interp would return prev_esn0 — an SNR whose
                # measured BLER was ABOVE target).
                bler_f = max(bler, 0.5 / max(pt.blocks, 1))
                required = float(
                    np.interp(
                        np.log10(target_bler),
                        [np.log10(bler_f), np.log10(prev_bler)],
                        [esn0, prev_esn0],
                    )
                )
                curve.append((a_i, required))
                fid.write(f"{a_i}\t{required:f}\n")
                fid.flush()
                if live_plot:
                    from ..utils.plotting import plot_snr_vs_a as _plot

                    live = dict(out)
                    live[r_i] = curve
                    _plot(live, os.path.join(results_dir, "SNR_vs_A_live.png"))
                if verbose:
                    print(f"A={a_i}: required Es/N0 = {required:.3f} dB")
        out[r_i] = curve
    return out
