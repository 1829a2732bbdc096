"""BLER regression against the golden headline curve.

golden/BLER_vs_SNR_BG2_A3842_R13_QPSK_8it_sumproduct.json records the
reference configuration's waterfall measured with high statistics (up to 700k
blocks/point) — the framework's equivalent of the MATLAB curve, since the
fast backend implements the identical flooding sum-product algorithm.

The CPU test re-simulates one mid-waterfall point with modest statistics and
checks the measured BLER lies inside a generous binomial confidence interval
of the golden value.  A drift in any chain stage (LLR scaling, rate matching,
decoder math) shows up here as a waterfall shift.
"""
import json
import os
from functools import partial

import jax
import numpy as np

from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
from ldpc_3gpp_tpu.spec.params import LDPCParams

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "golden",
    "BLER_vs_SNR_BG2_A3842_R13_QPSK_8it_sumproduct.json",
)


def test_mid_waterfall_point_matches_golden():
    with open(GOLDEN) as f:
        g = json.load(f)
    # 0.25 dB point: golden BLER 0.157 — steep region, sensitive to any shift
    idx = g["esn0_db"].index(0.25)
    p_expected = g["bler"][idx]

    params = LDPCParams(BG=2, A=3842, G=11526, Q_m=2)
    cfg = ChainConfig(
        params=params, modulation="QPSK", iterations=8,
        algorithm="sum-product", backend="fast",
    )
    batch, reps = 64, 4
    sim = jax.jit(partial(simulate_batch, cfg, batch=batch))
    errors = blocks = 0
    for i in range(reps):
        r = sim(jax.random.PRNGKey(1000 + i), 0.25)
        errors += int(np.asarray(r.block_errors))
        blocks += int(np.asarray(r.blocks))

    bler = errors / blocks
    # 99.9% binomial interval around the golden probability for `blocks` trials
    sd = np.sqrt(p_expected * (1 - p_expected) / blocks)
    assert abs(bler - p_expected) < 4.5 * sd + 1e-9, (
        f"measured BLER {bler:.4f} vs golden {p_expected:.4f} "
        f"({errors}/{blocks} errors) — waterfall shifted?"
    )
