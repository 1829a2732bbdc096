"""System-object-style API: the reference's exact usage pattern must work."""
import numpy as np
import pytest

from ldpc_3gpp_tpu.api import (
    AWGNChannel,
    NRDemodulator,
    NRLDPCDecoder,
    NRLDPCEncoder,
    NRModulator,
)

RNG = np.random.default_rng(23)


@pytest.mark.slow
def test_reference_driver_loop():
    """Line-for-line port of the plot_BLER_vs_SNR inner loop (single block)."""
    A, G = 1000, 3000
    mod = NRModulator("QPSK")
    dem = NRDemodulator("QPSK")
    chan = AWGNChannel(snr_db=2.0, seed=1)
    enc = NRLDPCEncoder(A=A, BG=1, G=G, Q_m=mod.Q_m)
    dec = NRLDPCDecoder(A=A, BG=1, G=G, Q_m=mod.Q_m, I_HARQ=1, iterations=20)

    successes = 0
    for trial in range(4):
        a = RNG.integers(0, 2, A).astype(np.int8)
        dec.reset()
        a_hat = None
        for rv in (0,):
            enc.rv_id = rv
            dec.rv_id = rv
            g = enc.step(a)
            assert g.shape == (G,)
            tx = mod.step(g)
            rx = chan.step(tx)
            dem.variance = 10 ** (-2.0 / 10)
            llr = dem.step(rx)
            a_hat = dec.step(llr)
            if a_hat is not None:
                break
        if a_hat is not None and np.array_equal(a_hat, a):
            successes += 1
    assert successes == 4  # 2 dB is well above the waterfall for R=1/3


def test_decode_failure_returns_none():
    A, G = 100, 300
    enc = NRLDPCEncoder(A=A, BG=2, G=G, Q_m=2)
    dec = NRLDPCDecoder(A=A, BG=2, G=G, Q_m=2, iterations=5)
    a = RNG.integers(0, 2, A).astype(np.int8)
    g = enc.step(a)
    # garbage LLRs: decode must fail and return None (the reference's [])
    llr = RNG.normal(size=G).astype(np.float32) * 0.1
    assert dec.step(llr) is None


def test_derived_properties_exposed():
    enc = NRLDPCEncoder(A=3842, BG=2, G=11526, Q_m=2)
    assert enc.C == 2 and enc.Z_c == 208 and enc.K_prime == 1957
    assert sum(enc.E_r) == enc.G
    enc.rv_id = 2  # tunable, recomputes k_0
    assert enc.k_0 > 0


def test_harq_accumulation_via_api():
    A, G = 100, 300
    mod = NRModulator("QPSK")
    enc = NRLDPCEncoder(A=A, BG=2, G=G, Q_m=2)
    dec = NRLDPCDecoder(A=A, BG=2, G=G, Q_m=2, I_HARQ=1, iterations=20)
    chan = AWGNChannel(snr_db=-1.5, seed=3)
    a = RNG.integers(0, 2, A).astype(np.int8)
    g = enc.step(a)
    dec.reset()
    got = None
    for _ in range(5):  # chase retransmissions accumulate in the decoder
        rx = chan.step(mod.step(g))
        dec_var = 10 ** (1.5 / 10)
        dem = NRDemodulator("QPSK", variance=dec_var)
        got = dec.step(dem.step(rx))
        if got is not None:
            break
    assert got is not None and np.array_equal(got, a)


def test_varying_g_between_harq_steps():
    """G (and rv_id) mutate between retransmissions of one transport block
    — the reason the reference makes them tunable (NRLDPC.m:51-85).  The
    HARQ soft buffer is G-independent, so a short first transmission plus a
    longer, differently-punctured retransmission must combine and decode."""
    A = 500
    stages = [(0, 800), (2, 1200)]  # (rv_id, G): rv0 alone fails at 2 dB
    mod = NRModulator("QPSK")
    enc = NRLDPCEncoder(A=A, BG=1, G=stages[0][1], Q_m=mod.Q_m)
    dec = NRLDPCDecoder(A=A, BG=1, G=stages[0][1], Q_m=mod.Q_m, I_HARQ=1,
                        iterations=12)
    chan = AWGNChannel(snr_db=2.0, seed=11)
    a = RNG.integers(0, 2, A).astype(np.int8)
    dec.reset()
    got = []
    for rv, G in stages:
        enc.rv_id, enc.G = rv, G
        dec.rv_id, dec.G = rv, G
        g = enc.step(a)
        assert g.shape == (G,)
        rx = chan.step(mod.step(g))
        dem = NRDemodulator("QPSK", variance=10 ** (-2.0 / 10))
        got.append(dec.step(dem.step(rx)))
    assert got[0] is None  # high-rate first shot fails...
    assert got[1] is not None and np.array_equal(got[1], a)  # ...IR decodes


def test_batched_step():
    A, G = 100, 300
    enc = NRLDPCEncoder(A=A, BG=2, G=G, Q_m=2)
    a = RNG.integers(0, 2, (8, A)).astype(np.int8)
    g = enc.step(a)
    assert g.shape == (8, G)
    dec = NRLDPCDecoder(A=A, BG=2, G=G, Q_m=2, iterations=10)
    llr = (1.0 - 2.0 * g).astype(np.float32) * 8.0
    a_hat, ok = dec.step(llr)
    assert ok.all()
    np.testing.assert_array_equal(a_hat, a)
