#!/usr/bin/env python3
"""Slope-profile the full simulate_batch and its non-stage pieces on TPU.

Complements tools/profile_stages.py (which times isolated chain stages):
this times the whole jitted sim step, the PRNG draws, and the decode with
early termination active, to account for every microsecond of the bench.
"""
import os
import sys
import time
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    p = LDPCParams(BG=1, A=8424, G=25272, Q_m=2)
    batch = 512
    cfg = ChainConfig(params=p, modulation="QPSK", rv_sequence=(0,),
                      iterations=12, algorithm="min-sum",
                      early_termination=True, backend="pallas",
                      schedule="layered")

    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (batch, 128)))(key)

    def stage(name, f, arg):
        t = slope_time(f, arg)
        print(f"{name:28s}: {t*1e3:8.3f} ms/call ({t/batch*1e6:7.2f} us/cw)",
              flush=True)

    # full sim step at the bench operating point
    def sim(v):
        k = jax.random.fold_in(key, jnp.sum(v).astype(jnp.int32) % 7)
        r = simulate_batch(cfg, k, 1.0, batch)
        return r.block_errors.astype(jnp.float32)[None] + v[0, :1] * 0

    stage("simulate_batch esn0=1", sim, x)

    def sim_hi(v):
        k = jax.random.fold_in(key, jnp.sum(v).astype(jnp.int32) % 7)
        r = simulate_batch(cfg, k, 6.0, batch)
        return r.block_errors.astype(jnp.float32)[None] + v[0, :1] * 0

    stage("simulate_batch esn0=6", sim_hi, x)

    # PRNG pieces
    def draw_bits(v):
        k = jax.random.fold_in(key, jnp.sum(v).astype(jnp.int32) % 7)
        return jax.random.bernoulli(k, 0.5, (batch, p.A)).astype(jnp.float32)

    stage("bernoulli info bits", draw_bits, x)

    def draw_noise(v):
        k = jax.random.fold_in(key, jnp.sum(v).astype(jnp.int32) % 7)
        return jax.random.normal(k, (batch, p.G // 2, 2))

    stage("normal noise", draw_noise, x)

    # decode with early termination at both operating points
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as dec

    from ldpc_3gpp_tpu.models.encoder import encode_transport_block
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.models.decoder import split_rate_matched

    def make_llr(esn0, _):
        a = jax.random.bernoulli(key, 0.5, (batch, p.A)).astype(jnp.int8)
        g = encode_transport_block(p, a)
        tx = modulate(g, "QPSK")
        var = esn0_to_variance(esn0)
        rx = awgn(key, tx, var)
        llr = demodulate(rx, "QPSK", var, "exact")
        d = split_rate_matched(p, llr)
        return jnp.concatenate(
            [jnp.zeros((batch, 1, 2 * p.Z_c)), d], -1
        ).reshape(batch, -1)

    for esn0 in (1.0, 6.0):
        cw = jax.jit(partial(make_llr, esn0))(jnp.float32(0))
        stage(
            f"decode ET esn0={esn0:g}",
            lambda x: dec(p, x, iterations=12, algorithm="min-sum").bits.astype(
                jnp.float32
            ),
            cw,
        )


if __name__ == "__main__":
    main()
