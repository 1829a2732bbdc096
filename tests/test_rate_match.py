"""Rate matching: gather indices vs a literal transcription of the spec loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.ops.rate_match import (
    accumulate_llrs,
    deinterleave,
    interleave,
    select_bits,
    selection_indices,
)
from ldpc_3gpp_tpu.spec.params import LDPCParams

RNG = np.random.default_rng(3)


def _oracle_indices(params, E):
    """Direct transcription of the TS38.212 Section 5.4.2.1 while-loop."""
    lo, hi = params.filler_range_d
    out = []
    j = 0
    while len(out) < E:
        p = (params.k_0 + j) % params.N_cb
        if not (lo <= p < hi):
            out.append(p)
        j += 1
    return np.array(out)


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
@pytest.mark.parametrize("bg", [1, 2])
def test_selection_indices_match_spec_loop(bg, rv):
    p = LDPCParams(BG=bg, A=1001, G=1500, Q_m=2, rv_id=rv)
    E = p.E_r[0]
    np.testing.assert_array_equal(selection_indices(p, E), _oracle_indices(p, E))


def test_selection_with_repetition():
    # G much larger than N: the circular buffer wraps several times.
    p = LDPCParams(BG=2, A=100, G=4000, Q_m=2)
    E = p.E_r[0]
    assert E > p.N - p.num_filler  # really wraps
    np.testing.assert_array_equal(selection_indices(p, E), _oracle_indices(p, E))


def test_selection_with_lbrm():
    p = LDPCParams(BG=1, A=4000, G=6000, Q_m=2, I_LBRM=1, TBS_LBRM=4000, rv_id=2)
    assert p.N_cb < p.N
    E = p.E_r[0]
    idx = selection_indices(p, E)
    assert idx.max() < p.N_cb
    np.testing.assert_array_equal(idx, _oracle_indices(p, E))


@pytest.mark.parametrize("Q_m", [1, 2, 4, 6, 8])
def test_interleave_roundtrip(Q_m):
    E = Q_m * 30
    e = jnp.asarray(RNG.normal(size=(5, E)).astype(np.float32))
    f = interleave(e, Q_m)
    np.testing.assert_array_equal(np.asarray(deinterleave(f, Q_m)), np.asarray(e))


def test_interleave_matches_spec_formula():
    # f[i + j*Q_m] = e[i*(E/Q_m) + j]  (NRLDPCEncoder.m:219-223)
    Q_m, E = 4, 24
    e = np.arange(E, dtype=np.float32)
    f = np.asarray(interleave(jnp.asarray(e[None]), Q_m))[0]
    for j in range(E // Q_m):
        for i in range(Q_m):
            assert f[i + j * Q_m] == e[i * (E // Q_m) + j]


def test_chase_combining():
    """Repeated circular-buffer positions accumulate LLRs on the decode side."""
    p = LDPCParams(BG=2, A=100, G=4000, Q_m=2)
    E = p.E_r[0]
    llrs = jnp.asarray(RNG.normal(size=(2, E)).astype(np.float32))
    d = np.asarray(accumulate_llrs(p, llrs, E))
    idx = selection_indices(p, E)
    expected = np.zeros((2, p.N), np.float32)
    for k, pos in enumerate(idx):
        expected[:, pos] += np.asarray(llrs)[:, k]
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_select_then_accumulate_inverse():
    """select -> accumulate recovers each transmitted position's multiplicity."""
    p = LDPCParams(BG=1, A=500, G=1000, Q_m=2, rv_id=1)
    E = p.E_r[0]
    d = jnp.asarray(RNG.normal(size=(p.N,)).astype(np.float32))
    e = select_bits(p, d[None], E)
    back = np.asarray(accumulate_llrs(p, e, E))[0]
    idx = selection_indices(p, E)
    counts = np.bincount(idx, minlength=p.N)
    np.testing.assert_allclose(back, counts * np.asarray(d), rtol=1e-5)


@pytest.mark.parametrize("rv", [0, 1, 2, 3])
@pytest.mark.parametrize(
    "kw",
    [
        dict(BG=1, A=1001, G=1500, Q_m=2),            # fillers, BG1
        dict(BG=2, A=201, G=900, Q_m=4),              # fillers, BG2
        dict(BG=2, A=100, G=4000, Q_m=2),             # repetition (wraps)
        dict(BG=1, A=4000, G=6000, Q_m=2, I_LBRM=1, TBS_LBRM=4000),  # N_cb < N
        dict(BG=1, A=8424, G=25272, Q_m=2),           # no fillers (bench cfg)
    ],
    ids=["bg1-fillers", "bg2-fillers", "repetition", "lbrm", "no-fillers"],
)
def test_sliced_paths_match_index_oracle(kw, rv):
    """select_bits/accumulate_llrs (slice+roll form) == explicit index math."""
    p = LDPCParams(rv_id=rv, **kw)
    E = p.E_r[0]
    idx = selection_indices(p, E)
    np.testing.assert_array_equal(idx, _oracle_indices(p, E))

    d = RNG.normal(size=(3, p.N)).astype(np.float32)
    e = np.asarray(select_bits(p, jnp.asarray(d), E))
    np.testing.assert_array_equal(e, d[:, idx])

    llrs = RNG.normal(size=(3, E)).astype(np.float32)
    back = np.asarray(accumulate_llrs(p, jnp.asarray(llrs), E))
    expected = np.zeros((3, p.N), np.float32)
    np.add.at(expected, (slice(None), idx), llrs)
    np.testing.assert_allclose(back, expected, rtol=1e-6, atol=1e-6)
