"""NR modulation and soft demodulation (TS38.211 Section 5.1).

The reference wraps comm.PSK/RectangularQAM Modulator/Demodulator objects with
hardcoded custom symbol mappings (NRModulator.m:72-84, NRDemodulator.m:75-84).
Those custom mappings are exactly the TS38.211 Section 5.1 constellations, so
here the constellations are generated directly from the 38.211 formulas:

- BPSK:    d = ((1-2b) + j(1-2b)) / sqrt(2)                     (pi/4 PSK)
- QPSK:    d = ((1-2b0) + j(1-2b1)) / sqrt(2)
- 16QAM:   d = ((1-2b0)(2-(1-2b2)) + j(1-2b1)(2-(1-2b3))) / sqrt(10)
- 64QAM / 256QAM: the corresponding nested Gray constructions.

LLR convention matches MATLAB comm demodulators: LLR = log P(b=0) - log P(b=1),
so a POSITIVE LLR means bit 0 (this is why fillers are pinned to +inf,
NRLDPCDecoder.m:264).  ``noise_var`` is the total complex noise variance
(the reference sets Variance = 10^(-EsN0/10), plot_BLER_vs_SNR.m:106).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MODULATIONS: Tuple[str, ...] = ("BPSK", "QPSK", "16QAM", "64QAM", "256QAM")

Q_M = {"BPSK": 1, "QPSK": 2, "16QAM": 4, "64QAM": 6, "256QAM": 8}


@functools.lru_cache(maxsize=None)
def constellation(modulation: str) -> np.ndarray:
    """Complex constellation indexed by the symbol's bits MSB-first.

    Index m corresponds to bits (b0, ..., b_{Qm-1}) with b0 the MSB, matching
    the TS38.211 convention that b(Q_m*i) is the first bit of symbol i.
    """
    qm = Q_M[modulation]
    m = np.arange(1 << qm)
    b = ((m[:, None] >> (qm - 1 - np.arange(qm))) & 1).astype(np.float64)
    s = 1.0 - 2.0 * b  # bit -> sign: 0 -> +1, 1 -> -1

    if modulation == "BPSK":
        re = im = s[:, 0]
        norm = np.sqrt(2.0)
    elif modulation == "QPSK":
        re, im = s[:, 0], s[:, 1]
        norm = np.sqrt(2.0)
    elif modulation == "16QAM":
        re = s[:, 0] * (2.0 - s[:, 2])
        im = s[:, 1] * (2.0 - s[:, 3])
        norm = np.sqrt(10.0)
    elif modulation == "64QAM":
        re = s[:, 0] * (4.0 - s[:, 2] * (2.0 - s[:, 4]))
        im = s[:, 1] * (4.0 - s[:, 3] * (2.0 - s[:, 5]))
        norm = np.sqrt(42.0)
    elif modulation == "256QAM":
        re = s[:, 0] * (8.0 - s[:, 2] * (4.0 - s[:, 4] * (2.0 - s[:, 6])))
        im = s[:, 1] * (8.0 - s[:, 3] * (4.0 - s[:, 5] * (2.0 - s[:, 7])))
        norm = np.sqrt(170.0)
    else:
        raise ValueError(f"unsupported modulation {modulation}")

    return ((re + 1j * im) / norm).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _bit_masks(modulation: str) -> np.ndarray:
    """(2^Qm, Qm) 0/1 matrix: bit value of each constellation point."""
    qm = Q_M[modulation]
    m = np.arange(1 << qm)
    return ((m[:, None] >> (qm - 1 - np.arange(qm))) & 1).astype(np.float32)


def modulate(bits: jax.Array, modulation: str) -> jax.Array:
    """Map (..., G) bits to (..., G/Q_m) complex symbols."""
    qm = Q_M[modulation]
    G = bits.shape[-1]
    assert G % qm == 0, "bit count must be a multiple of Q_m"
    if modulation in ("BPSK", "QPSK"):
        # closed form beats the table gather: just sign flips and a scale
        s = (1.0 - 2.0 * bits.astype(jnp.float32)) / np.float32(np.sqrt(2.0))
        if modulation == "BPSK":
            return jax.lax.complex(s, s)
        pairs = s.reshape(s.shape[:-1] + (G // 2, 2))
        return jax.lax.complex(pairs[..., 0], pairs[..., 1])
    groups = bits.reshape(bits.shape[:-1] + (G // qm, qm)).astype(jnp.int32)
    weights = jnp.asarray(1 << (qm - 1 - np.arange(qm)), dtype=jnp.int32)
    idx = jnp.sum(groups * weights, axis=-1)
    table = jnp.asarray(constellation(modulation))
    return table[idx]


def modulate_planes(e_planes: jax.Array, modulation: str) -> jax.Array:
    """``modulate(interleave(e))`` with both element-shuffles fused away.

    The Section 5.4.2.2 interleaver (ops/rate_match.interleave) places
    deinterleaved stream i of ``e`` at bit position i of every symbol, and
    TS38.211 square constellations map even/odd bit positions to the
    Re/Im axes independently — so symbols are a function of the Q_m
    CONTIGUOUS planes of ``e``, and the per-element (S, Q_m) transpose the
    interleaver implies never needs to materialize.

    e_planes: (..., Q_m, S) bits, plane i = e[i*S : (i+1)*S].
    Returns (..., S) symbols == ``modulate(interleave(e), modulation)``
    bit-exactly (QPSK/BPSK by identical arithmetic; QAM reads the same
    per-axis level table the constellation defines).
    """
    qm = Q_M[modulation]
    assert e_planes.shape[-2] == qm
    s = 1.0 - 2.0 * e_planes.astype(jnp.float32)
    if modulation == "BPSK":
        v = s[..., 0, :] / np.float32(np.sqrt(2.0))
        return jax.lax.complex(v, v)
    if modulation == "QPSK":
        v = s / np.float32(np.sqrt(2.0))
        return jax.lax.complex(v[..., 0, :], v[..., 1, :])
    # Square QAM: per-axis level from the even (Re) / odd (Im) bit planes,
    # read from the SAME f32 level table demodulation uses (exactly the
    # constellation() values, so table-gather modulate agrees bit-for-bit).
    levels, _ = _pam_levels(modulation)
    lv = jnp.asarray(levels)
    half = qm // 2

    def axis_level(planes):  # (..., half, S) bits -> (..., S) level
        idx = jnp.zeros(planes.shape[:-2] + planes.shape[-1:], jnp.int32)
        for k in range(half):
            idx = idx + (planes[..., k, :].astype(jnp.int32) << (half - 1 - k))
        return lv[idx]

    bits = e_planes.astype(jnp.int32)
    return jax.lax.complex(
        axis_level(bits[..., 0::2, :]), axis_level(bits[..., 1::2, :])
    )


def demodulate_planes(
    y: jax.Array, modulation: str, noise_var, method: str = "exact"
) -> jax.Array:
    """``deinterleave(demodulate(y))`` reshaped to LLR planes, shuffle-free.

    Returns (..., Q_m, S) where plane i holds the LLRs of deinterleaved
    stream i (bit position i of every symbol) — exactly
    ``deinterleave(demodulate(y, ...), Q_m).reshape(..., Q_m, S)`` but
    assembled from the demodulator's native per-axis outputs with
    S-contiguous plane concatenation instead of two element-granular
    transposes.  Values are bit-identical (same per-element arithmetic).
    """
    qm = Q_M[modulation]
    if modulation in ("BPSK", "QPSK") and method in ("exact", "maxlog"):
        scale = 2.0 * np.sqrt(2.0) / noise_var
        if modulation == "BPSK":
            return (scale * (jnp.real(y) + jnp.imag(y)))[..., None, :]
        return jnp.stack(
            [scale * jnp.real(y), scale * jnp.imag(y)], axis=-2
        )
    if qm >= 2:
        re_p = _pam_axis_planes(jnp.real(y), modulation, noise_var, method)
        im_p = _pam_axis_planes(jnp.imag(y), modulation, noise_var, method)
        # plane order re0, im0, re1, im1, ... = bit positions 0, 1, 2, 3, ...
        llr = jnp.stack([re_p, im_p], axis=-2).reshape(
            y.shape[:-1] + (qm,) + y.shape[-1:]
        )
        if method == "hard":
            big = jnp.asarray(jnp.finfo(llr.dtype).max, llr.dtype)
            llr = jnp.where(llr >= 0, big, -big)
        return llr
    # General fallback (BPSK 'hard'): one explicit transpose.
    llr = demodulate(y, modulation, noise_var, method)
    return jnp.swapaxes(
        llr.reshape(llr.shape[:-1] + (y.shape[-1], qm)), -1, -2
    )


@functools.lru_cache(maxsize=None)
def _pam_levels(modulation: str):
    """Per-axis PAM decomposition of a square NR QAM constellation.

    TS38.211 square QAMs are Gray-mapped independently per axis: even bits
    (b0, b2, ...) determine Re, odd bits (b1, b3, ...) determine Im, with
    identical level mappings.  Returns (levels (L,), bits (L, Qm/2)).
    """
    qm = Q_M[modulation]
    assert qm % 2 == 0 and qm >= 2
    half = qm // 2
    pts = constellation(modulation)
    # levels for even-bit patterns with odd bits fixed to 0
    m = np.arange(1 << half)
    bits = ((m[:, None] >> (half - 1 - np.arange(half))) & 1).astype(np.float32)
    # interleave the even-bit pattern into the full symbol index (odd bits 0)
    idx = np.zeros(1 << half, dtype=np.int64)
    for k in range(half):
        idx |= ((m >> (half - 1 - k)) & 1) << (qm - 1 - 2 * k)
    levels = np.real(pts[idx]).astype(np.float32)
    return levels, bits


def demodulate(
    y: jax.Array,
    modulation: str,
    noise_var,
    method: str = "exact",
) -> jax.Array:
    """Soft demodulate (..., S) symbols to (..., S*Q_m) LLRs.

    method: 'exact'  — true log-sum-exp LLR (MATLAB 'Log-likelihood ratio')
            'maxlog' — max-log approximation ('Approximate log-likelihood ratio')
            'hard'   — +/-inf hard decisions ('Hard decision')

    Square QAMs decompose into independent per-axis PAM demodulation
    (TS38.211 Gray mapping), turning the 2^Qm-point metric into two
    2^(Qm/2)-level ones — 16x less work for 256QAM, bit-identical LLRs.
    """
    qm = Q_M[modulation]
    if modulation in ("BPSK", "QPSK") and method in ("exact", "maxlog"):
        # 2-level PAM per bit: exact LLR is linear in y (and equals max-log).
        #   BPSK: LLR = (|y-p1|^2 - |y-p0|^2)/var = 4 Re(y conj(p0))/var
        #              = 2 sqrt(2) (Re + Im)/var     (p0 = (1+j)/sqrt2)
        #   QPSK: b0 on Re, b1 on Im with levels +-1/sqrt2:
        #         LLR_bi = 4 a coord / var = 2 sqrt(2) coord / var
        scale = 2.0 * np.sqrt(2.0) / noise_var
        if modulation == "BPSK":
            llr = (scale * (jnp.real(y) + jnp.imag(y)))[..., None]
        else:
            llr = jnp.stack(
                [scale * jnp.real(y), scale * jnp.imag(y)], axis=-1
            )
        return llr.reshape(y.shape[:-1] + (y.shape[-1] * qm,))
    if qm >= 2:
        return _demodulate_pam(y, modulation, noise_var, method)
    return _demodulate_full(y, modulation, noise_var, method)


def _pam_axis_planes(coord, modulation, noise_var, method):
    """One axis's PAM LLRs as bit planes: (..., S) real -> (..., half, S)."""
    levels, bits = _pam_levels(modulation)  # (L,), (L, qm/2)
    lv = jnp.asarray(levels)
    metric = -jnp.square(coord[..., None] - lv) / noise_var  # (..., S, L)
    planes = []
    for b in range(bits.shape[1]):
        m0 = jnp.where(jnp.asarray(bits[:, b]) > 0.5, -jnp.inf, 0.0)  # (L,)
        m1 = jnp.where(jnp.asarray(bits[:, b]) > 0.5, 0.0, -jnp.inf)
        if method == "exact":
            llr0 = jax.nn.logsumexp(metric + m0, axis=-1)
            llr1 = jax.nn.logsumexp(metric + m1, axis=-1)
        elif method in ("maxlog", "hard"):
            llr0 = jnp.max(metric + m0, axis=-1)
            llr1 = jnp.max(metric + m1, axis=-1)
        else:
            raise ValueError(f"unsupported method {method}")
        planes.append(llr0 - llr1)
    return jnp.stack(planes, axis=-2)  # (..., half, S)


def _demodulate_pam(y, modulation, noise_var, method):
    qm = Q_M[modulation]
    re = _pam_axis_planes(jnp.real(y), modulation, noise_var, method)
    im = _pam_axis_planes(jnp.imag(y), modulation, noise_var, method)
    # interleave: even bit positions from Re, odd from Im
    llr = jnp.stack([re, im], axis=-2)  # (..., half, 2, S)
    llr = jnp.moveaxis(
        llr.reshape(y.shape[:-1] + (qm,) + y.shape[-1:]), -2, -1
    )  # (..., S, qm)
    if method == "hard":
        big = jnp.asarray(jnp.finfo(llr.dtype).max, llr.dtype)
        llr = jnp.where(llr >= 0, big, -big)
    return llr.reshape(y.shape[:-1] + (y.shape[-1] * qm,))


def _demodulate_full(y, modulation, noise_var, method):
    qm = Q_M[modulation]
    pts = jnp.asarray(constellation(modulation))  # (M,)
    bits = jnp.asarray(_bit_masks(modulation))  # (M, qm)

    # Squared distance to every constellation point, scaled by noise.
    d2 = jnp.square(jnp.abs(y[..., None] - pts)) / noise_var  # (..., S, M)
    metric = -d2

    big = jnp.asarray(jnp.finfo(metric.dtype).max, metric.dtype)
    m0 = jnp.where(bits.T[:, None, :] > 0.5, -jnp.inf, 0.0)  # (qm, 1, M) mask b=0
    m1 = jnp.where(bits.T[:, None, :] > 0.5, 0.0, -jnp.inf)

    # (..., S, 1, M) + (qm, M) broadcast -> reduce over M.
    if method == "exact":
        llr0 = jax.nn.logsumexp(metric[..., None, :] + m0.squeeze(1), axis=-1)
        llr1 = jax.nn.logsumexp(metric[..., None, :] + m1.squeeze(1), axis=-1)
    elif method in ("maxlog", "hard"):
        llr0 = jnp.max(metric[..., None, :] + m0.squeeze(1), axis=-1)
        llr1 = jnp.max(metric[..., None, :] + m1.squeeze(1), axis=-1)
    else:
        raise ValueError(f"unsupported method {method}")

    llr = llr0 - llr1  # (..., S, qm); positive => bit 0
    if method == "hard":
        llr = jnp.where(llr >= 0, big, -big)
    return llr.reshape(y.shape[:-1] + (y.shape[-1] * qm,))
