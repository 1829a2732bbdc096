"""NR constellations and LLR demodulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
from ldpc_3gpp_tpu.ops.modulation import (
    MODULATIONS,
    Q_M,
    constellation,
    demodulate,
    modulate,
)

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("mod", MODULATIONS)
def test_unit_average_power(mod):
    c = constellation(mod)
    assert c.shape == (1 << Q_M[mod],)
    np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 1.0, rtol=1e-6)
    # all points distinct
    assert len(np.unique(np.round(c, 9))) == len(c)


def test_bpsk_qpsk_ts38211_points():
    b = constellation("BPSK")
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(b, [s + 1j * s, -s - 1j * s], rtol=1e-6)
    q = constellation("QPSK")
    np.testing.assert_allclose(
        q, [s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s], rtol=1e-6
    )


def test_16qam_ts38211_formula():
    c = constellation("16QAM")
    # spot values from TS38.211 Table: bits 0000 -> (1+1j)/sqrt(10)
    np.testing.assert_allclose(c[0], (1 + 1j) / np.sqrt(10), rtol=1e-6)
    # bits 1111 -> (-3-3j)/sqrt(10)? b0=1:re sign -, b2=1: 2-( -1)=3
    np.testing.assert_allclose(c[0b1111], (-3 - 3j) / np.sqrt(10), rtol=1e-6)


@pytest.mark.parametrize("mod", MODULATIONS)
def test_mod_demod_roundtrip_noiseless(mod):
    qm = Q_M[mod]
    bits = RNG.integers(0, 2, size=(4, 30 * qm)).astype(np.int8)
    tx = modulate(jnp.asarray(bits), mod)
    llr = np.asarray(demodulate(tx, mod, 0.01, "exact"))
    hard = (llr < 0).astype(np.int8)  # positive LLR => bit 0
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("mod", MODULATIONS)
@pytest.mark.parametrize("method", ["exact", "maxlog"])
def test_llr_sign_convention_and_magnitude(mod, method):
    """At high SNR both methods agree in sign; exact ~ maxlog."""
    qm = Q_M[mod]
    bits = RNG.integers(0, 2, size=(2, 100 * qm)).astype(np.int8)
    tx = modulate(jnp.asarray(bits), mod)
    # high enough that even 256QAM has (essentially) no symbol errors
    var = esn0_to_variance(38.0)
    rx = awgn(jax.random.PRNGKey(0), tx, var)
    llr = np.asarray(demodulate(rx, mod, var, method))
    np.testing.assert_array_equal((llr < 0).astype(np.int8), bits)


def test_exact_llr_bpsk_closed_form():
    """BPSK exact LLR = 4/sigma^2 * Re[y * conj(pt0)] / ... closed form check."""
    y = jnp.asarray(np.array([0.3 + 0.1j, -0.5 - 0.2j], np.complex64))
    var = 0.5
    llr = np.asarray(demodulate(y, "BPSK", var, "exact"))
    pts = constellation("BPSK")
    d0 = np.abs(np.asarray(y) - pts[0]) ** 2
    d1 = np.abs(np.asarray(y) - pts[1]) ** 2
    np.testing.assert_allclose(llr, (d1 - d0) / var, rtol=1e-5)


def test_hard_decision():
    bits = RNG.integers(0, 2, size=(1, 64 * 4)).astype(np.int8)
    tx = modulate(jnp.asarray(bits), "16QAM")
    llr = np.asarray(demodulate(tx, "16QAM", 1.0, "hard"))
    assert set(np.unique(np.sign(llr))) <= {-1.0, 1.0}
    np.testing.assert_array_equal((llr < 0).astype(np.int8), bits)


def test_awgn_statistics():
    tx = jnp.zeros((200_000,), jnp.complex64)
    var = esn0_to_variance(3.0)
    rx = np.asarray(awgn(jax.random.PRNGKey(1), tx, var))
    measured = np.mean(np.abs(rx) ** 2)
    np.testing.assert_allclose(measured, float(var), rtol=0.02)
    # I/Q split evenly
    np.testing.assert_allclose(np.var(rx.real), float(var) / 2, rtol=0.03)
