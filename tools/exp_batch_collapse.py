#!/usr/bin/env python3
"""TPU experiment: diagnose the non-power-of-two batch throughput collapse.

bench.py's tuning scan recorded that the full-chain TB/s at batch 96/160/192
collapses to ~half of batch 128's.  The kernel pads its batch to the tile
size internally (ops/decoder_pallas.py), so the suspect is upstream.  This
script times each stage of the chain separately over a batch scan:

  full    simulate_batch (encode+mod+AWGN+demod+decode+CRC, bench config)
  front   encode + modulate + AWGN + demodulate
  tbdec   decode_transport_block (split/rate-match + kernel + CRC gates)
  kernel  decoder_pallas.decode alone on presized codeword LLRs

Per-codeword time per stage identifies where the collapse lives.
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.models.decoder import decode_transport_block
    from ldpc_3gpp_tpu.models.encoder import encode_transport_block
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as kernel_decode
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    A, rate, qm = 8424, 1 / 3, 2
    G = round(A / rate / qm) * qm
    p = LDPCParams(BG=1, A=A, G=G, Q_m=qm)
    cfg = ChainConfig(
        params=p, modulation="QPSK", rv_sequence=(0,), iterations=12,
        algorithm="min-sum", early_termination=True, backend="auto",
        schedule="layered",
    )
    esn0 = 1.0
    var = esn0_to_variance(esn0)
    key = jax.random.PRNGKey(0)

    batches = (64, 96, 128, 160, 192, 256)
    print(f"{'batch':>6} {'full':>9} {'front':>9} {'tbdec':>9} {'kernel':>9}"
          f"   (us/TB per stage)")
    for batch in batches:
        a = jax.random.bernoulli(key, 0.5, (batch, A)).astype(jnp.int8)

        def front(a):
            g = encode_transport_block(p, a)
            tx = modulate(g, "QPSK")
            rx = awgn(key, tx, var)
            return demodulate(rx, "QPSK", var, "exact")

        llr = jax.jit(front)(a)

        # presized codeword LLRs for the raw kernel
        cw = jax.jit(
            lambda k: 2.0 * jax.random.normal(k, (batch, p.num_cols * p.Z_c))
            + 1.0
        )(key)

        def time_us(f, x):
            return slope_time(f, x) / batch * 1e6

        t_full = time_us(
            lambda k: simulate_batch(
                cfg, k.astype(jnp.uint32), jnp.float32(esn0), batch
            ).block_errors.astype(jnp.float32),
            jax.random.key_data(jax.random.fold_in(key, 7)).astype(jnp.float32),
        )
        t_front = time_us(lambda x: front(x.astype(jnp.int8)).sum(),
                          a.astype(jnp.float32))
        t_tbdec = time_us(
            lambda x: decode_transport_block(
                p, x, None, iterations=12, algorithm="min-sum",
                backend="auto", schedule="layered",
            ).tb_ok.astype(jnp.float32),
            llr,
        )
        t_kern = time_us(
            lambda x: kernel_decode(
                p, x, iterations=12, algorithm="min-sum", schedule="layered"
            ).bits.astype(jnp.float32),
            cw,
        )
        print(f"{batch:>6} {t_full:>9.2f} {t_front:>9.2f} {t_tbdec:>9.2f} "
              f"{t_kern:>9.2f}", flush=True)


if __name__ == "__main__":
    main()
