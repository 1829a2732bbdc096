"""Differential conformance of the modulator/demodulator vs the C++ oracle.

The reference's mod/demod are MathWorks' closed-source, separately-validated
toolbox kernels (NRModulator.m:69-85, NRDemodulator.m:72-88), so its LLR math
is vouched for by a second party.  This suite gives ops/modulation.py the
same property: native/golden.cpp evaluates the TS38.211 Section 5.1
constellations and a full-constellation scalar f64 log-sum-exp / max-log
demodulator (deliberately NOT the JAX path's PAM factorization), and every
modulation x method x noise-variance cell must agree to f32 rounding.

Measured agreement (tools-level fuzz, 2026-08): modulate <= 4e-8 abs
(<=1 ulp of complex64); demod <= 1.6e-6 relative.  The pinned tolerances
below keep ~6x headroom over the measured max while sitting 4+ orders of
magnitude below any real defect (an LLR-scale bug is rel-err O(1) — the
canary test asserts exactly that).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ldpc_3gpp_tpu.ops.modulation import (
    MODULATIONS,
    Q_M,
    demodulate,
    demodulate_planes,
    modulate,
)
from ldpc_3gpp_tpu.utils.golden import golden_demodulate, golden_modulate

MOD_ATOL = 1e-7  # abs, unit-power constellation: ~2.5 ulp of complex64
DEMOD_RTOL = 1e-5  # relative to max(|LLR|, 1)

_VARS = (0.05, 0.3, 1.0, 4.0)


def _noisy(rng, mod, n_syms, var):
    bits = rng.integers(0, 2, n_syms * Q_M[mod]).astype(np.uint8)
    y = golden_modulate(bits, mod)
    noise = rng.normal(0, np.sqrt(var / 2), (2, n_syms))
    return bits, y + noise[0] + 1j * noise[1]


@pytest.mark.parametrize("mod", MODULATIONS)
def test_modulate_matches_oracle(mod):
    rng = np.random.default_rng(hash(mod) % 2**32)
    bits = rng.integers(0, 2, 1024 * Q_M[mod]).astype(np.uint8)
    yj = np.asarray(modulate(jnp.asarray(bits), mod))
    yc = golden_modulate(bits, mod)
    assert np.max(np.abs(yj - yc)) <= MOD_ATOL
    # unit average power (TS38.211 normalization), exactly in f64
    m = np.arange(1 << Q_M[mod], dtype=np.uint8)
    allbits = ((m[:, None] >> (Q_M[mod] - 1 - np.arange(Q_M[mod]))) & 1)
    pts = golden_modulate(allbits.astype(np.uint8).reshape(-1), mod)
    assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-12


@pytest.mark.parametrize("mod", MODULATIONS)
@pytest.mark.parametrize("method", ["exact", "maxlog"])
def test_demodulate_matches_oracle(mod, method):
    rng = np.random.default_rng(hash((mod, method)) % 2**32)
    for var in _VARS:
        bits, y = _noisy(rng, mod, 800, var)
        lj = np.asarray(
            demodulate(jnp.asarray(y.astype(np.complex64)), mod, var, method)
        )
        lc = golden_demodulate(y, mod, var, method)
        rel = np.abs(lj - lc) / np.maximum(np.abs(lc), 1.0)
        assert np.max(rel) <= DEMOD_RTOL, (mod, method, var, np.max(rel))


@pytest.mark.parametrize("mod", MODULATIONS)
def test_demodulate_hard_matches_oracle(mod):
    """Hard decisions agree wherever the max-log LLR isn't at a knife edge."""
    rng = np.random.default_rng(7)
    _, y = _noisy(rng, mod, 800, 0.5)
    lj = np.asarray(
        demodulate(jnp.asarray(y.astype(np.complex64)), mod, 0.5, "hard")
    )
    lc = golden_demodulate(y, mod, 0.5, "hard")
    margin = np.abs(golden_demodulate(y, mod, 0.5, "maxlog"))
    decided = margin > 1e-4  # f32/f64 rounding can flip exact-zero crossings
    assert np.array_equal(np.sign(lj[decided]), np.sign(lc[decided]))


@pytest.mark.parametrize("mod", MODULATIONS)
def test_demodulate_planes_matches_oracle(mod):
    """The fused plane demod (the path the chain actually runs) also
    agrees with the oracle once planes are re-flattened to stream order."""
    rng = np.random.default_rng(11)
    var = 0.7
    _, y = _noisy(rng, mod, 512, var)
    qm = Q_M[mod]
    planes = np.asarray(
        demodulate_planes(jnp.asarray(y.astype(np.complex64)), mod, var)
    )  # (qm, S): plane i = bit position i of every symbol
    lj = planes.T.reshape(-1)  # back to per-symbol bit order
    lc = golden_demodulate(y, mod, var, "exact")
    rel = np.abs(lj - lc) / np.maximum(np.abs(lc), 1.0)
    assert planes.shape == (qm, y.size)
    assert np.max(rel) <= DEMOD_RTOL


def test_injected_scale_bug_fails():
    """Canary: the tolerance must actually catch an LLR-scale defect.

    Demodulating with the wrong noise variance (2x) models the classic
    missing-factor bug; it must blow through DEMOD_RTOL by orders of
    magnitude, proving the differential fuzz is not vacuously loose.
    """
    rng = np.random.default_rng(3)
    var = 0.5
    _, y = _noisy(rng, "64QAM", 400, var)
    lj = np.asarray(
        demodulate(jnp.asarray(y.astype(np.complex64)), "64QAM", 2 * var, "exact")
    )
    lc = golden_demodulate(y, "64QAM", var, "exact")
    rel = np.abs(lj - lc) / np.maximum(np.abs(lc), 1.0)
    assert np.max(rel) > 1e3 * DEMOD_RTOL
