"""External anchor: measured surface vs the PPV normal approximation.

The golden/ BLER surface is self-measured; this pins it against a published,
independently recomputable quantity — the Polyanskiy-Poor-Verdu normal
approximation for the BI-AWGN channel (see tools/na_bound.py and
VALIDATION.md section 4b).  Pure numpy: no JAX, no device.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.na_bound import biawgn_c_v, na_required_esn0_db  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


def _load(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return json.load(f)


def test_biawgn_capacity_known_values():
    """Quadrature sanity vs textbook BI-AWGN capacities."""
    C0, V0 = biawgn_c_v(1.0)  # 0 dB
    assert abs(C0 - 0.4861) < 2e-3
    assert 0.5 < V0 < 0.75
    # capacity is monotone in SNR and approaches 1 bit
    C_hi, _ = biawgn_c_v(10 ** (8 / 10.0))
    assert C_hi > 0.97
    C_lo, _ = biawgn_c_v(10 ** (-10 / 10.0))
    assert C_lo < 0.1


def test_na_bound_artifact_consistent():
    """golden/na_bound.json bound values recompute from scratch."""
    art = _load("na_bound.json")
    A_list = art["A"]
    # spot-check three (rate, target, A) cells against a fresh computation
    for r_key, rate, t_key, eps, idx in (
        ("0.333333", 1 / 3, "0.01", 1e-2, 0),
        ("0.5", 1 / 2, "0.1", 1e-1, 3),
        ("0.666667", 2 / 3, "0.01", 1e-2, 7),
    ):
        A = A_list[idx]
        G = int(round(A / rate / 2) * 2)
        fresh = na_required_esn0_db(A, G, eps)
        stored = art["bound_esn0_db"][f"{r_key}/{t_key}"][idx]
        assert abs(fresh - stored) < 1e-3, (r_key, t_key, A, fresh, stored)


def test_measured_gaps_inside_published_envelope():
    """Every measured surface point sits a plausible, positive distance
    above the PPV bound: the literature envelope for NR-LDPC flooding BP
    (~0.4-1.7 dB at these block lengths), SP dominating min-sum."""
    art = _load("na_bound.json")
    for key, gaps in art["gap_db"].items():
        algo = key.split("/")[0]
        lo, hi = (0.2, 1.4) if algo == "sum-product" else (0.4, 2.2)
        vals = [g for g in gaps if g is not None]
        assert vals, key
        assert min(vals) > lo, f"{key}: gap {min(vals)} suspiciously small"
        assert max(vals) < hi, f"{key}: gap {max(vals)} too large"
    # SP is uniformly at least as close to the bound as normalized min-sum
    for r_key in ("0.2", "0.333333", "0.5", "0.666667"):
        for t_key in ("0.1", "0.01"):
            sp = art["gap_db"].get(f"sum-product/{r_key}/{t_key}")
            ms = art["gap_db"].get(f"min-sum/{r_key}/{t_key}")
            if not sp or not ms:
                pytest.skip("surface incomplete")
            for s, m in zip(sp, ms):
                if s is not None and m is not None:
                    assert m - s > -0.05, (r_key, t_key, s, m)


def test_gap_consistent_with_surface_artifact():
    """gap_db really is (measured surface) - (bound): cross-artifact check."""
    art = _load("na_bound.json")
    surface = _load("SNR_vs_A_surface.json")
    key = "sum-product/0.333333"
    meas = surface["curves"][key]["required_esn0_db_at_0.01"]
    bound = art["bound_esn0_db"]["0.333333/0.01"]
    gaps = art["gap_db"]["sum-product/0.333333/0.01"]
    for m, b, g in zip(meas, bound, gaps):
        if m is not None:
            np.testing.assert_allclose(m - b, g, atol=1e-3)
