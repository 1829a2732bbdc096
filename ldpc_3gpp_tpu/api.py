"""System-object-style convenience API for users migrating from the reference.

Mirrors the MATLAB objects one-to-one — same construction keywords, the same
``step`` / ``reset`` lifecycle, tunable ``rv_id``/``G``/``Q_m``/``N_L``/
``CBGTI`` between steps (HARQ retransmissions), and the decoder's
empty-on-failure convention (``None`` instead of MATLAB's ``[]``):

    enc = NRLDPCEncoder(BG=2, A=3842, G=11526, Q_m=2)
    dec = NRLDPCDecoder(BG=2, A=3842, G=11526, Q_m=2, I_HARQ=1, iterations=8)
    mod = NRModulator("QPSK"); dem = NRDemodulator("QPSK", variance=0.5)

    g  = enc.step(a)            # (A,) bits -> (G,) bits
    tx = mod.step(g)
    llr = dem.step(rx)
    a_hat = dec.step(llr)       # (A,) bits or None
    dec.reset()                 # clear HARQ buffers for the next block

Internally everything is the functional, jitted chain; these classes only
manage parameter plumbing and HARQ state.  For throughput, use the batched
functional API directly (models.chain / parallel.montecarlo) — per-call
single-codeword stepping cannot amortise dispatch costs.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.decoder import HARQState, decode_transport_block, init_harq_state
from .models.encoder import encode_transport_block
from .ops.channel import awgn, esn0_to_variance
from .ops.modulation import Q_M, demodulate, modulate
from .spec.params import LDPCParams


class _NRLDPCBase:
    """Shared parameter plumbing (the reference's NRLDPC base class)."""

    def __init__(self, BG=1, A=44, G=132, Q_m=1, N_L=1, rv_id=0, I_LBRM=0,
                 TBS_LBRM=None, CBGTI=()):
        self._kw = dict(BG=BG, A=A, G=G, Q_m=Q_m, N_L=N_L, rv_id=rv_id,
                        I_LBRM=I_LBRM, TBS_LBRM=TBS_LBRM, CBGTI=tuple(CBGTI))
        self._params = LDPCParams(**self._kw)

    @property
    def params(self) -> LDPCParams:
        return self._params

    def _set(self, name, value):
        self._kw[name] = value
        self._params = LDPCParams(**self._kw)

    # Tunable properties (NRLDPC.m:51-85) — may change between steps.
    rv_id = property(lambda s: s._params.rv_id,
                     lambda s, v: s._set("rv_id", v))
    G = property(lambda s: s._params.G, lambda s, v: s._set("G", v))
    Q_m = property(lambda s: s._params.Q_m, lambda s, v: s._set("Q_m", v))
    N_L = property(lambda s: s._params.N_L, lambda s, v: s._set("N_L", v))
    CBGTI = property(lambda s: s._params.CBGTI,
                     lambda s, v: s._set("CBGTI", tuple(v)))

    def __getattr__(self, name):
        # expose every derived parameter (A, B, C, K, N, Z_c, E_r, k_0, ...)
        return getattr(object.__getattribute__(self, "_params"), name)


class NRLDPCEncoder(_NRLDPCBase):
    """step(a): (A,) or (batch, A) bits -> (G,) / (batch, G) bits."""

    def step(self, a) -> np.ndarray:
        a = np.asarray(a)
        single = a.ndim == 1
        batch = a[None] if single else a
        fn = _jitted_encode(self._params)
        g = np.asarray(fn(jnp.asarray(batch.astype(np.int8))))
        return g[0] if single else g


class NRLDPCDecoder(_NRLDPCBase):
    """step(llr): (G,) / (batch, G) LLRs -> (A,) bits / (batch, A) or None.

    LLR convention: positive = bit 0 (MATLAB comm).  With I_HARQ != 0,
    successive steps accumulate LLRs for the same transport block until
    ``reset()`` (NRLDPCDecoder.m:21-35, :343-356).  For a single codeword,
    returns None when the transport block failed to decode (the reference
    returns []); for a batch, returns (a_hat, tb_ok).
    """

    def __init__(self, *args, I_HARQ=0, iterations=50,
                 algorithm="sum-product", backend="auto",
                 schedule="flooding", **kw):
        super().__init__(*args, **kw)
        self.I_HARQ = I_HARQ
        self.iterations = iterations
        self.algorithm = algorithm
        self.backend = backend
        self.schedule = schedule
        self._state: Optional[HARQState] = None

    def reset(self) -> None:
        self._state = None

    def step(self, llr):
        llr = np.asarray(llr, dtype=np.float32)
        single = llr.ndim == 1
        batch = llr[None] if single else llr
        state = self._state
        if self.I_HARQ and state is None:
            state = init_harq_state(self._params, (batch.shape[0],))
        fn = _jitted_decode(
            self._params, self.iterations, self.algorithm, self.backend,
            self.schedule, self.I_HARQ != 0,
        )
        a_hat, tb_ok, new_state = fn(jnp.asarray(batch), state)
        if self.I_HARQ:
            self._state = new_state
        a_hat, tb_ok = np.asarray(a_hat), np.asarray(tb_ok)
        if single:
            return a_hat[0] if bool(tb_ok[0]) else None
        return a_hat, tb_ok


class NRModulator:
    """step(bits) -> complex symbols (NRModulator.m)."""

    def __init__(self, modulation: str = "BPSK"):
        self.modulation = modulation
        self.Q_m = Q_M[modulation]

    def step(self, bits):
        return np.asarray(modulate(jnp.asarray(np.asarray(bits, np.int8)),
                                   self.modulation))


class NRDemodulator:
    """step(rx) -> LLRs; tunable noise ``variance`` (NRDemodulator.m:14)."""

    def __init__(self, modulation: str = "BPSK", variance: float = 1.0,
                 decision_method: str = "exact"):
        self.modulation = modulation
        self.Q_m = Q_M[modulation]
        self.variance = variance
        self.decision_method = decision_method

    def step(self, rx):
        return np.asarray(
            demodulate(jnp.asarray(np.asarray(rx, np.complex64)),
                       self.modulation, float(self.variance),
                       self.decision_method)
        )


class AWGNChannel:
    """step(tx) -> rx at the configured Es/N0 (comm.AWGNChannel in SNR mode)."""

    def __init__(self, snr_db: float = 0.0, seed: int = 0):
        self.snr_db = snr_db
        self._key = jax.random.PRNGKey(seed)

    def step(self, tx):
        self._key, sub = jax.random.split(self._key)
        var = esn0_to_variance(self.snr_db)
        return np.asarray(awgn(sub, jnp.asarray(np.asarray(tx, np.complex64)), var))


@functools.lru_cache(maxsize=64)
def _jitted_encode(params: LDPCParams):
    return jax.jit(lambda a: encode_transport_block(params, a))


@functools.lru_cache(maxsize=64)
def _jitted_decode(params, iterations, algorithm, backend, schedule, harq):
    def run(llr, state):
        res = decode_transport_block(
            params, llr, state if harq else None, iterations=iterations,
            algorithm=algorithm, backend=backend, schedule=schedule,
        )
        return res.a_hat, res.tb_ok, res.state

    return jax.jit(run)
