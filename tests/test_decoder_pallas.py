"""Pallas layered min-sum kernel vs the flooding oracle (interpret mode)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
from ldpc_3gpp_tpu.ops.decoder_fast import decode as decode_fast
from ldpc_3gpp_tpu.ops.decoder_pallas import decode as decode_pallas, supports
from ldpc_3gpp_tpu.ops.encoder import encode
from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
from ldpc_3gpp_tpu.spec.params import LDPCParams

RNG = np.random.default_rng(17)

# BG1 Z=128 (A=2800) is the smallest lane-aligned config — cheap to interpret.
P128 = LDPCParams(BG=1, A=2800, G=8400, Q_m=2)


def _noisy_llrs(p, batch, esn0, key=1):
    c = RNG.integers(0, 2, size=(batch, p.K)).astype(np.uint8)
    c[:, p.K_prime :] = 0
    cw = encode(p, jnp.asarray(c))
    tx = modulate(cw, "QPSK")
    var = esn0_to_variance(esn0)
    rx = awgn(jax.random.PRNGKey(key), tx, var)
    return np.asarray(cw), demodulate(rx, "QPSK", var, "exact")


def test_supports():
    assert supports(P128)
    assert supports(LDPCParams(BG=1, A=8424, G=25272, Q_m=2))  # Z=384
    assert supports(LDPCParams(BG=2, A=100, G=300, Q_m=2))  # Z=20 (padded)
    assert not supports(LDPCParams(BG=2, A=20, G=60, Q_m=2))  # Z=6


@pytest.mark.slow
def test_decodes_noisy_codewords():
    cw, llr = _noisy_llrs(P128, 16, 2.0)
    r = jax.jit(partial(decode_pallas, P128, iterations=15, interpret=True))(llr)
    assert np.asarray(r.parity_ok).all()
    np.testing.assert_array_equal(np.asarray(r.bits), cw)


@pytest.mark.slow
def test_converges_no_slower_than_flooding():
    """Layered schedule should need <= the flooding iteration count."""
    cw, llr = _noisy_llrs(P128, 8, 2.5, key=3)
    rp = jax.jit(partial(decode_pallas, P128, iterations=20, interpret=True))(llr)
    rf = jax.jit(
        partial(decode_fast, P128, iterations=20, algorithm="min-sum")
    )(llr)
    assert np.asarray(rp.parity_ok).all() and np.asarray(rf.parity_ok).all()
    assert np.asarray(rp.iterations).max() <= np.asarray(rf.iterations).max()


@pytest.mark.slow
def test_failure_reported_at_low_snr():
    cw, llr = _noisy_llrs(P128, 8, -10.0, key=4)
    r = jax.jit(partial(decode_pallas, P128, iterations=5, interpret=True))(llr)
    assert not np.asarray(r.parity_ok).any()


@pytest.mark.slow
def test_batch_padding():
    """Batch not a multiple of the tile is padded and unpadded transparently."""
    cw, llr = _noisy_llrs(P128, 5, 3.0, key=5)
    r = jax.jit(partial(decode_pallas, P128, iterations=10, interpret=True))(llr)
    assert np.asarray(r.bits).shape == (5, P128.num_cols * P128.Z_c)
    np.testing.assert_array_equal(np.asarray(r.bits), cw)


@pytest.mark.slow
@pytest.mark.parametrize("algorithm", ["min-sum", "sum-product", "offset-min-sum"])
def test_flooding_schedule_bit_exact_vs_fast(algorithm):
    """kernel(schedule='flooding') must reproduce decoder_fast exactly:
    same bits, same parity flags, same per-codeword iteration counts."""
    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)  # Z=52, exercises padding too
    cw, llr = _noisy_llrs(p, 16, 1.0, key=11)
    rk = jax.jit(
        partial(decode_pallas, p, iterations=12, algorithm=algorithm,
                schedule="flooding", interpret=True)
    )(llr)
    rf = jax.jit(
        partial(decode_fast, p, iterations=12, algorithm=algorithm)
    )(llr)
    np.testing.assert_array_equal(np.asarray(rk.bits), np.asarray(rf.bits))
    np.testing.assert_array_equal(
        np.asarray(rk.parity_ok), np.asarray(rf.parity_ok)
    )
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rf.iterations)
    )


def test_padded_z_lane_wraparound():
    """Z not a lane multiple uses the double-roll wraparound path."""
    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)  # Z=52, W=128
    assert p.Z_c % 128 != 0
    # interpret-mode cost scales with the iteration budget; 3.5 dB is far
    # enough above the R=1/3 waterfall that 8 sweeps always converge
    cw, llr = _noisy_llrs(p, 8, 3.5, key=9)
    r = jax.jit(partial(decode_pallas, p, iterations=8, interpret=True))(llr)
    assert np.asarray(r.parity_ok).all()
    np.testing.assert_array_equal(np.asarray(r.bits), cw)


@pytest.mark.slow
@pytest.mark.parametrize("algorithm", ["min-sum", "sum-product"])
def test_layered_schedule_bit_exact_vs_xla_layered(algorithm):
    """kernel(schedule='layered') must reproduce the XLA layered oracle
    (ops/decoder_layered.py) exactly: same bits, parity flags, and
    per-codeword sweep counts — the layered analogue of the flooding
    bit-exactness test against decoder_fast."""
    from ldpc_3gpp_tpu.ops.decoder_layered import decode as decode_layered

    for p, key in ((P128, 31), (LDPCParams(BG=2, A=400, G=1200, Q_m=2), 32)):
        cw, llr = _noisy_llrs(p, 16, 1.0, key=key)
        rk = jax.jit(
            partial(decode_pallas, p, iterations=12, algorithm=algorithm,
                    schedule="layered", interpret=True)
        )(llr)
        rx = jax.jit(
            partial(decode_layered, p, iterations=12, algorithm=algorithm)
        )(llr)
        np.testing.assert_array_equal(np.asarray(rk.bits), np.asarray(rx.bits))
        np.testing.assert_array_equal(
            np.asarray(rk.parity_ok), np.asarray(rx.parity_ok)
        )
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rx.iterations)
        )


@pytest.mark.slow
def test_bf16_messages_decode():
    """bf16 decoder state (message_dtype='bfloat16') still corrects noisy
    codewords; it is a VMEM/throughput knob, not a semantics change."""
    cw, llr = _noisy_llrs(P128, 8, 2.0, key=21)
    r = jax.jit(
        partial(decode_pallas, P128, iterations=15, interpret=True,
                message_dtype="bfloat16")
    )(llr)
    assert np.asarray(r.parity_ok).all()
    np.testing.assert_array_equal(np.asarray(r.bits), cw)
    # padded-Z wraparound path in bf16 too
    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)  # Z=52, W=128
    cw, llr = _noisy_llrs(p, 4, 2.5, key=22)
    r = jax.jit(
        partial(decode_pallas, p, iterations=15, interpret=True,
                message_dtype="bfloat16")
    )(llr)
    assert np.asarray(r.parity_ok).all()
    np.testing.assert_array_equal(np.asarray(r.bits), cw)


def test_bf16_rejects_sum_product():
    with pytest.raises(ValueError):
        decode_pallas(
            P128, jnp.zeros((4, P128.num_cols * P128.Z_c)),
            algorithm="sum-product", message_dtype="bfloat16",
        )


@pytest.mark.slow
def test_lane_packing_matches_unpacked():
    """Packed decoding (P codewords per lane-axis tile) is bit-identical,
    codeword for codeword, to lane_pack=1 — including parity flags,
    per-codeword iteration counts, odd batch sizes, and packs that cross
    128-lane register boundaries (Z=72: P=7 segments over W=512)."""
    from ldpc_3gpp_tpu.ops.decoder_pallas import _auto_pack

    for p, batch in (
        (LDPCParams(BG=2, A=400, G=1200, Q_m=2), 7),   # Z=52,  P=2
        (LDPCParams(BG=2, A=32, G=96, Q_m=2), 11),     # Z=8,   P=16
        (LDPCParams(BG=2, A=640, G=1920, Q_m=2), 5),   # Z=72,  P=7, W=512
    ):
        assert _auto_pack(p.Z_c) > 1
        cw, llr = _noisy_llrs(p, batch, 2.5, key=41 + p.Z_c)
        packed = jax.jit(
            partial(decode_pallas, p, iterations=15, interpret=True)
        )(llr)
        unpacked = jax.jit(
            partial(decode_pallas, p, iterations=15, interpret=True,
                    lane_pack=1)
        )(llr)
        np.testing.assert_array_equal(
            np.asarray(packed.bits), np.asarray(unpacked.bits)
        )
        np.testing.assert_array_equal(
            np.asarray(packed.parity_ok), np.asarray(unpacked.parity_ok)
        )
        np.testing.assert_array_equal(
            np.asarray(packed.iterations), np.asarray(unpacked.iterations)
        )
        assert np.asarray(packed.parity_ok).all()
        np.testing.assert_array_equal(np.asarray(packed.bits), cw)


@pytest.mark.slow
@pytest.mark.parametrize("early_termination", [True, False])
def test_early_termination_flag_cross_backend(early_termination):
    """Both flag values give the same semantics on every backend.

    early_termination=False means run-to-budget: exactly `iterations`
    update sweeps with nothing frozen, bits from the final state, parity =
    its syndrome, iteration count = the full budget — NOT
    early-stop-with-relabeled counters.  The operating point mixes
    codewords converging at different sweep counts, so the ET=True counters
    vary while ET=False must report the full budget; bits/flags/counters
    are pinned exactly against the matching XLA oracle for BOTH values
    (flooding vs decoder_fast, layered vs decoder_layered)."""
    from ldpc_3gpp_tpu.ops.decoder_layered import decode as decode_layered

    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)  # Z=52
    cw, llr = _noisy_llrs(p, 16, 0.0, key=77)
    for schedule, oracle in (
        ("flooding", decode_fast),
        ("layered", decode_layered),
    ):
        rk = jax.jit(
            partial(decode_pallas, p, iterations=6, algorithm="min-sum",
                    schedule=schedule, interpret=True,
                    early_termination=early_termination)
        )(llr)
        rf = jax.jit(
            partial(oracle, p, iterations=6, algorithm="min-sum",
                    early_termination=early_termination)
        )(llr)
        np.testing.assert_array_equal(np.asarray(rk.bits), np.asarray(rf.bits))
        np.testing.assert_array_equal(
            np.asarray(rk.parity_ok), np.asarray(rf.parity_ok)
        )
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rf.iterations)
        )
        if early_termination:
            # the point must actually discriminate: varied convergence times
            assert np.unique(np.asarray(rk.iterations)).size > 1
        else:
            assert (np.asarray(rk.iterations) == 6).all()


@pytest.mark.slow
def test_layer_order_cross_backend():
    """Row processing order: kernel and XLA layered oracle stay bit-exact
    for 'natural', 'reversed' (default), and an explicit permutation; the
    reversed order must converge at least as fast as natural on average
    (the measured rationale for making it the default)."""
    from ldpc_3gpp_tpu.ops.decoder_layered import decode as decode_layered

    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)
    cw, llr = _noisy_llrs(p, 16, 1.5, key=61)
    explicit = tuple(range(1, p.num_rows)) + (0,)
    sums = {}
    for order in ("natural", "reversed", explicit):
        rk = jax.jit(
            partial(decode_pallas, p, iterations=12, schedule="layered",
                    interpret=True, layer_order=order)
        )(llr)
        rx = jax.jit(
            partial(decode_layered, p, iterations=12, layer_order=order)
        )(llr)
        np.testing.assert_array_equal(np.asarray(rk.bits), np.asarray(rx.bits))
        np.testing.assert_array_equal(
            np.asarray(rk.iterations), np.asarray(rx.iterations)
        )
        sums[order] = int(np.asarray(rk.iterations).sum())
        assert np.asarray(rk.parity_ok).all()
        np.testing.assert_array_equal(np.asarray(rk.bits), cw)
    assert sums["reversed"] <= sums["natural"]
    with pytest.raises(ValueError):
        decode_pallas(p, jnp.asarray(llr), layer_order=(0, 1, 2))


def test_rejects_tiny_z():
    p = LDPCParams(BG=2, A=20, G=60, Q_m=2)  # Z < 8
    assert p.Z_c < 8
    with pytest.raises(ValueError):
        decode_pallas(p, jnp.zeros((4, p.num_cols * p.Z_c)))


def test_auto_backend_dispatch():
    from ldpc_3gpp_tpu.models.decoder import DECODE_BACKENDS

    # on CPU the auto backend must use the flooding path (pallas is TPU-only)
    p = LDPCParams(BG=2, A=100, G=300, Q_m=2)
    llr = jnp.asarray(RNG.normal(size=(4, p.num_cols * p.Z_c)).astype(np.float32))
    r = DECODE_BACKENDS["auto"](p, llr, algorithm="min-sum", iterations=3)
    assert r.bits.shape == (4, p.num_cols * p.Z_c)


def _d_and_cw_llrs(p, batch, seed=11):
    """Random circular-buffer LLRs d~ and the equivalent materialized cw."""
    from ldpc_3gpp_tpu.models.decoder import FILLER_LLR

    rng = np.random.default_rng(seed)
    N = (p.num_cols - 2) * p.Z_c
    d = rng.normal(scale=3.0, size=(batch, N)).astype(np.float32)
    cw = np.concatenate([np.zeros((batch, 2 * p.Z_c), np.float32), d], axis=-1)
    if p.K_prime < p.K:
        cw[:, p.K_prime : p.K] = FILLER_LLR
    return jnp.asarray(d), jnp.asarray(cw)


@pytest.mark.slow
@pytest.mark.parametrize("schedule", ["layered", "flooding"])
def test_channel_format_d_matches_cw(schedule):
    """channel_format='d' (in-kernel punctured zeros + filler pinning) is
    bit-exact vs the materialized 'cw' input on a filler-bearing, packed
    config — every output field.  Slow tier: the quick tier's
    test_output_format_sys_matches_cw_prefix[layered] exercises the same
    'd' input fusion jointly with the 'sys' output fusion."""
    p = LDPCParams(BG=2, A=100, G=300, Q_m=2)  # Z=20: fillers AND lane packing
    assert p.K_prime < p.K and p.K_prime >= 2 * p.Z_c
    d, cw = _d_and_cw_llrs(p, 3)
    kw = dict(iterations=4, schedule=schedule, interpret=True)
    rd = jax.jit(partial(decode_pallas, p, channel_format="d", **kw))(d)
    rc = jax.jit(partial(decode_pallas, p, **kw))(cw)
    np.testing.assert_array_equal(np.asarray(rd.bits), np.asarray(rc.bits))
    np.testing.assert_array_equal(
        np.asarray(rd.parity_ok), np.asarray(rc.parity_ok)
    )
    np.testing.assert_array_equal(
        np.asarray(rd.iterations), np.asarray(rc.iterations)
    )


@pytest.mark.slow
@pytest.mark.parametrize("schedule", ["layered", "flooding"])
@pytest.mark.parametrize("early_termination", [True, False])
def test_channel_format_d_matches_cw_unpacked(schedule, early_termination):
    """Same equivalence on the unpacked lane-aligned bench shape family
    (BG1 Z=128, no fillers) across both early-termination modes.  Together
    with the filler-bearing packed flooding case this covers what the quick
    tier's single layered case doesn't."""
    d, cw = _d_and_cw_llrs(P128, 4, seed=23)
    kw = dict(
        iterations=5, schedule=schedule,
        early_termination=early_termination, interpret=True,
    )
    rd = jax.jit(partial(decode_pallas, P128, channel_format="d", **kw))(d)
    rc = jax.jit(partial(decode_pallas, P128, **kw))(cw)
    np.testing.assert_array_equal(np.asarray(rd.bits), np.asarray(rc.bits))
    np.testing.assert_array_equal(
        np.asarray(rd.parity_ok), np.asarray(rc.parity_ok)
    )
    np.testing.assert_array_equal(
        np.asarray(rd.iterations), np.asarray(rc.iterations)
    )


@pytest.mark.parametrize(
    "schedule",
    ["layered", pytest.param("flooding", marks=pytest.mark.slow)],
)
def test_output_format_sys_matches_cw_prefix(schedule):
    """output_format='sys' returns exactly the first K bits of the 'cw'
    output, with identical flags and iteration counts (parity columns are
    skipped, nothing else changes).  The quick-tier layered case doubles as
    the fused-IO coverage: the 'sys' side also consumes channel_format='d',
    so both bench-path fusions are checked against the materialized
    composition in one compile pair."""
    p = LDPCParams(BG=2, A=100, G=300, Q_m=2)  # Z=20: fillers, lane packing
    d, cw = _d_and_cw_llrs(p, 3, seed=31)
    kw = dict(iterations=4, schedule=schedule, interpret=True)
    rs = jax.jit(
        partial(decode_pallas, p, channel_format="d", output_format="sys", **kw)
    )(d)
    rc = jax.jit(partial(decode_pallas, p, **kw))(cw)
    assert rs.bits.shape == (3, p.K)
    np.testing.assert_array_equal(
        np.asarray(rs.bits), np.asarray(rc.bits)[:, : p.K]
    )
    np.testing.assert_array_equal(
        np.asarray(rs.parity_ok), np.asarray(rc.parity_ok)
    )
    np.testing.assert_array_equal(
        np.asarray(rs.iterations), np.asarray(rc.iterations)
    )


@pytest.mark.slow
def test_alpha_schedule_matches_xla_layered_and_default_is_baseline():
    """alpha_schedule=(alpha0, n0) (iteration-dependent NMS normalization):
    the kernel must reproduce the XLA layered oracle with the identical
    schedule bit-for-bit, and (alpha0, 0) / None must equal the constant-
    alpha baseline exactly (the knob defaults to off and must not perturb
    existing goldens)."""
    from ldpc_3gpp_tpu.ops.decoder_layered import decode as decode_layered

    p = LDPCParams(BG=2, A=400, G=1200, Q_m=2)  # Z=52
    rng = np.random.default_rng(5)
    llr = jnp.asarray(
        rng.normal(scale=2.0, size=(8, p.num_cols * p.Z_c)).astype(np.float32)
    )
    sched = (0.65, 2)
    rk = jax.jit(
        partial(decode_pallas, p, iterations=6, algorithm="min-sum",
                schedule="layered", interpret=True, alpha_schedule=sched)
    )(llr)
    rx = jax.jit(
        partial(decode_layered, p, iterations=6, algorithm="min-sum",
                alpha_schedule=sched)
    )(llr)
    np.testing.assert_array_equal(np.asarray(rk.bits), np.asarray(rx.bits))
    np.testing.assert_array_equal(
        np.asarray(rk.iterations), np.asarray(rx.iterations)
    )
    r0 = jax.jit(
        partial(decode_pallas, p, iterations=6, algorithm="min-sum",
                schedule="layered", interpret=True)
    )(llr)
    r1 = jax.jit(
        partial(decode_pallas, p, iterations=6, algorithm="min-sum",
                schedule="layered", interpret=True, alpha_schedule=(0.5, 0))
    )(llr)
    np.testing.assert_array_equal(np.asarray(r0.bits), np.asarray(r1.bits))
    # the schedule must actually change the trajectory when engaged
    assert not np.array_equal(np.asarray(r0.bits), np.asarray(rk.bits))
