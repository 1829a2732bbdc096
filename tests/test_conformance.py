"""Differential conformance testbench.

TPU-native analogue of the reference's testbench.m: the JAX encoder chain is
compared bit-for-bit against the independent native C++ oracle
(native/golden.cpp — dense GF(2) core solve + literal spec rate-matching
loop) over a randomized parameter space (testbench.m:21-36 draws the same
quantities).  Bounded trials instead of the reference's infinite loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.models.encoder import encode_transport_block
from ldpc_3gpp_tpu.spec.params import LDPCParams
from ldpc_3gpp_tpu.spec.tables import UnsupportedParameters
from ldpc_3gpp_tpu.utils.golden import golden_encode, golden_params

RNG = np.random.default_rng(2024)


def _random_config(rng):
    """Random draw mirroring testbench.m:21-36 (bounded A for test speed)."""
    R = rng.uniform(0.2, 0.95)
    A = int(rng.integers(1, 12000))
    Q_m = int(rng.choice([1, 2, 4, 6, 8]))
    N_L = int(rng.integers(1, 5))
    rv_id = int(rng.integers(0, 4))
    I_LBRM = int(rng.integers(0, 2))
    TBS_LBRM = int(rng.integers(A, 2 * A + 1)) if I_LBRM else None
    # BG selection rule (testbench.m:26-30)
    BG = 2 if (A <= 292 or (A <= 3824 and R <= 0.67) or R <= 0.25) else 1
    G = int(round(A / R / (N_L * Q_m)) * N_L * Q_m)
    return dict(
        BG=BG, A=A, G=G, Q_m=Q_m, N_L=N_L, rv_id=rv_id,
        I_LBRM=I_LBRM, TBS_LBRM=TBS_LBRM,
    )


def test_params_match_oracle():
    checked = 0
    for _ in range(200):
        kw = _random_config(RNG)
        try:
            p = LDPCParams(**kw)
        except UnsupportedParameters:
            continue
        gp = golden_params(
            kw["BG"], kw["A"], kw["G"], kw["Q_m"], kw["N_L"], kw["rv_id"],
            kw["I_LBRM"], kw["TBS_LBRM"],
        )
        assert (p.C, p.K_prime, p.K_b, p.Z_c, p.i_LS, p.K, p.N, p.B) == (
            gp["C"], gp["K_prime"], gp["K_b"], gp["Z_c"], gp["i_LS"],
            gp["K"], gp["N"], gp["B"],
        ), kw
        checked += 1
    assert checked > 100


@pytest.mark.parametrize("trial", range(12))
def test_encoder_bit_exact_vs_oracle(trial):
    rng = np.random.default_rng(500 + trial)
    while True:
        kw = _random_config(rng)
        try:
            p = LDPCParams(**kw)
            break
        except UnsupportedParameters:
            continue
    a = rng.integers(0, 2, p.A, dtype=np.uint8)
    g_jax = np.asarray(
        jax.jit(lambda x: encode_transport_block(p, x))(jnp.asarray(a[None]))
    )[0]
    g_gold = golden_encode(
        kw["BG"], kw["A"], kw["G"], kw["Q_m"], a, kw["N_L"], kw["rv_id"],
        kw["I_LBRM"], kw["TBS_LBRM"],
    )
    np.testing.assert_array_equal(g_jax, g_gold), kw


def test_encoder_bit_exact_with_cbgti():
    """Retransmission with excluded code blocks matches the oracle."""
    A = 20004
    p = LDPCParams(BG=1, A=A, G=3 * A, Q_m=2, rv_id=2, CBGTI=(1,))
    rng = np.random.default_rng(77)
    a = rng.integers(0, 2, A, dtype=np.uint8)
    g_jax = np.asarray(encode_transport_block(p, jnp.asarray(a[None])))[0]
    g_gold = golden_encode(1, A, 3 * A, 2, a, rv_id=2, CBGTI=(1,))
    np.testing.assert_array_equal(g_jax, g_gold)


@pytest.mark.parametrize(
    "bg,A,G,esn0",
    [(2, 100, 300, 2.0), (2, 640, 1280, 0.0), (1, 1000, 3000, 0.5)],
)
def test_decoder_bit_exact_vs_oracle(bg, A, G, esn0):
    """Flooding min-sum decode vs the independent native C++ BP decoder.

    All JAX decoders share the base-graph edge plan (_row_plan);
    nr_golden_decode_core builds the lifted adjacency independently and runs
    the scalar textbook update, so this catches plan/rotation/indexing bugs
    the JAX-vs-JAX cross-checks cannot.  Every flooding min-sum operation is
    exact or single-rounding with a deterministic order, so decoded bits,
    parity flags, AND early-termination iteration counts must match
    bit-for-bit — including non-converging codewords at the iteration cap.
    """
    from functools import partial

    from ldpc_3gpp_tpu.ops import decoder_fast
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.encoder import encode
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.utils.golden import golden_decode_core

    p = LDPCParams(BG=bg, A=A, G=G, Q_m=2)
    rng = np.random.default_rng(bg * 1000 + A)
    batch = 16
    c = rng.integers(0, 2, size=(batch, p.K)).astype(np.uint8)
    c[:, p.K_prime :] = 0
    cw = np.asarray(encode(p, jnp.asarray(c)))
    var = esn0_to_variance(esn0)
    rx = awgn(jax.random.PRNGKey(A), modulate(jnp.asarray(cw), "QPSK"), var)
    llr = np.asarray(demodulate(rx, "QPSK", var, "exact"), np.float32)
    for algorithm in ("min-sum", "offset-min-sum"):
        res = jax.jit(
            partial(decoder_fast.decode, p, iterations=8, algorithm=algorithm)
        )(jnp.asarray(llr))
        gbits, gok, git = golden_decode_core(
            bg, p.Z_c, llr, iterations=8, algorithm=algorithm
        )
        np.testing.assert_array_equal(np.asarray(res.bits), gbits)
        np.testing.assert_array_equal(np.asarray(res.parity_ok), gok)
        np.testing.assert_array_equal(np.asarray(res.iterations), git)
