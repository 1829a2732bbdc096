#!/usr/bin/env python3
"""On-device slope profiler for chain stages.

The remote-TPU tunnel makes naive timing useless: block_until_ready may not
block, and fetching a result pays ~30 ms/MB transfer.  This measures each
stage by running it K times INSIDE one jit (serialised by a data dependency)
and fetching only a scalar; the per-call cost is the K-slope.
"""
import os
import sys
import time
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(f, x, k_lo=2, k_hi=18, reps=5):
    """Per-call seconds of jitted f(x) via the K-slope method."""

    def chained(x, k):
        def body(i, acc):
            y = f(x + acc * 1e-30)
            return acc + jnp.sum(y).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    lo = jax.jit(partial(chained, k=k_lo))
    hi = jax.jit(partial(chained, k=k_hi))
    float(lo(x)); float(hi(x))  # compile

    def best(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(hi) - best(lo)) / (k_hi - k_lo)


def main():
    from ldpc_3gpp_tpu.models.decoder import split_rate_matched
    from ldpc_3gpp_tpu.models.encoder import encode_transport_block
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.crc import crc_attach
    from ldpc_3gpp_tpu.ops.decoder_fast import decode as decode_fast
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as decode_pallas
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = LDPCParams(BG=1, A=8424, G=25272, Q_m=2)
    batch = 256
    key = jax.random.PRNGKey(0)
    a = jax.jit(
        lambda k: jax.random.bernoulli(k, 0.5, (batch, p.A)).astype(jnp.float32)
    )(key)

    var = float(esn0_to_variance(1.0))

    stages = []
    stages.append(("crc_attach", lambda x: crc_attach(x, "CRC24A"), a))
    stages.append(
        ("encode_rolls", lambda x: encode_transport_block(p, x.astype(jnp.int8), backend="rolls").astype(jnp.float32), a)
    )
    g = jax.jit(lambda x: encode_transport_block(p, x.astype(jnp.int8), backend="rolls").astype(jnp.float32))(a)
    stages.append(("modulate", lambda x: modulate(x.astype(jnp.int8), "QPSK").real, g))
    tx = jax.jit(lambda x: modulate(x.astype(jnp.int8), "QPSK"))(g)
    stages.append(("awgn+demod", lambda x: demodulate(awgn(key, x.astype(jnp.complex64), var), "QPSK", var, "exact"), tx.real))
    llr = jax.jit(lambda x: demodulate(awgn(key, x, var), "QPSK", var, "exact"))(tx)
    stages.append(("split_rate_matched", lambda x: split_rate_matched(p, x), llr))
    d = jax.jit(lambda x: split_rate_matched(p, x))(llr)
    cw_llr = jax.jit(lambda x: jnp.concatenate([jnp.zeros((batch, 1, 2 * p.Z_c)), x], -1))(d)
    stages.append(
        ("decode_pallas_12", lambda x: decode_pallas(p, x, iterations=12).bits.astype(jnp.float32), cw_llr)
    )
    stages.append(
        ("decode_fast_12", lambda x: decode_fast(p, x, iterations=12, algorithm="min-sum").bits.astype(jnp.float32), cw_llr)
    )

    for name, f, x in stages:
        try:
            t = slope_time(f, x)
            per_cw = t / batch * 1e6
            print(f"{name:22s}: {t*1e3:8.3f} ms/call  ({per_cw:7.2f} us/codeword)")
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
