#!/usr/bin/env python3
"""TPU experiment: diagnose the non-power-of-two batch throughput collapse.

bench.py's tuning scan recorded that the full-chain TB/s at batch 96/160/192
collapses to ~half of batch 128's.  The kernel pads its batch to the tile
size internally (ops/decoder_pallas.py), so the suspect is upstream.

Phase "full" (default): bench-style timing (fori_loop of `steps` sim steps
per dispatch, one aggregate host fetch as the sync point) of the full chain
over a batch scan — reproduces the collapse under the exact conditions the
bench observed it.

Phase "stages": same timing shape for the decode-only and front-only
programs at the interesting batch sizes, to localize the collapse.

Usage: exp_batch_collapse.py [full|stages] [batch ...]
"""
import os
import sys
import time

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def _timed(fn, key_args, reps=6):
    """Median seconds per call of an already-compiled jitted fn."""
    outs = [fn(*a) for a in key_args[:1]]
    _ = float(jax.tree_util.tree_leaves(outs[0])[0].sum())  # warm sync
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in key_args]
        _ = sum(
            float(jax.tree_util.tree_leaves(o)[0].sum()) for o in outs
        )  # host fetch = sync
        times.append((time.perf_counter() - t0) / len(key_args))
    return sorted(times)[len(times) // 2]


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.models.decoder import decode_transport_block
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as kernel_decode
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.rng import fast_key

    enable_compilation_cache()
    phase = sys.argv[1] if len(sys.argv) > 1 else "full"
    batches = [int(b) for b in sys.argv[2:]] or [64, 96, 128, 160, 192]

    A, rate, qm = 8424, 1 / 3, 2
    G = round(A / rate / qm) * qm
    p = LDPCParams(BG=1, A=A, G=G, Q_m=qm)
    cfg = ChainConfig(
        params=p, modulation="QPSK", rv_sequence=(0,), iterations=12,
        algorithm="min-sum", early_termination=True, backend="auto",
        schedule="layered",
    )
    esn0 = jnp.float32(1.0)
    steps = 64

    for batch in batches:
        if phase == "full":
            def sim_many(key, e, batch=batch):
                def body(i, acc):
                    r = simulate_batch(cfg, jax.random.fold_in(key, i), e, batch)
                    return acc + r.block_errors.astype(jnp.float32)
                return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

            fn = jax.jit(sim_many)
            args = [(fast_key(i), esn0) for i in range(4)]
            t = _timed(fn, args) / (batch * steps)
            print(f"full   batch={batch:4d}: {t*1e6:7.2f} us/TB "
                  f"({1/t/1e3:6.1f}k TB/s)", flush=True)
        elif phase == "enc2":
            # encode sub-stages: CRC attach, LDPC core (rolls), rate match
            from ldpc_3gpp_tpu.models.encoder import rate_match, segment
            from ldpc_3gpp_tpu.ops.crc import crc_attach
            from ldpc_3gpp_tpu.ops.encoder import encode as ldpc_encode

            def stage_fns():
                def crc_only(k, batch=batch):
                    a = jax.random.bernoulli(k, 0.5, (batch, A)).astype(jnp.int8)
                    return crc_attach(a, p.tb_crc).sum().astype(jnp.float32)

                def ldpc_only(k, batch=batch):
                    c = jax.random.bernoulli(k, 0.5, (batch, p.K)).astype(jnp.int8)
                    return ldpc_encode(p, c).sum().astype(jnp.float32)

                def rm_only(k, batch=batch):
                    nc = p.num_cols * p.Z_c
                    cw = jax.random.bernoulli(k, 0.5, (batch, nc)).astype(jnp.int8)
                    d = cw[..., 2 * p.Z_c:].reshape(batch, p.C, -1)
                    return rate_match(p, d).sum().astype(jnp.float32)

                return [("crc", crc_only), ("ldpc", ldpc_only), ("rm", rm_only)]

            for name, f in stage_fns():
                def many(key, e, f=f):
                    def body(i, acc):
                        return acc + f(jax.random.fold_in(key, i))
                    return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

                fn = jax.jit(many)
                args = [(fast_key(i), esn0) for i in range(4)]
                t = _timed(fn, args) / (batch * steps)
                print(f"{name:6s} batch={batch:4d}: {t*1e6:7.2f} us/TB "
                      f"({1/t/1e3:6.1f}k TB/s)", flush=True)
        elif phase == "front":
            from ldpc_3gpp_tpu.models.encoder import encode_transport_block
            from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
            from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate

            var = esn0_to_variance(1.0)

            def stage_fns():
                def enc_only(k, batch=batch):
                    a = jax.random.bernoulli(k, 0.5, (batch, A)).astype(jnp.int8)
                    return encode_transport_block(p, a).sum().astype(jnp.float32)

                def front_all(k, batch=batch):
                    a = jax.random.bernoulli(k, 0.5, (batch, A)).astype(jnp.int8)
                    g = encode_transport_block(p, a)
                    tx = modulate(g, "QPSK")
                    rx = awgn(k, tx, var)
                    llr = demodulate(rx, "QPSK", var, "exact")
                    return llr.sum()

                def rng_only(k, batch=batch):
                    a = jax.random.bernoulli(k, 0.5, (batch, A))
                    n = jax.random.normal(k, (batch, G // 2, 2))
                    return a.sum().astype(jnp.float32) + n.sum()

                return [("front", front_all), ("encode", enc_only),
                        ("rng", rng_only)]

            for name, f in stage_fns():
                def many(key, e, f=f):
                    def body(i, acc):
                        return acc + f(jax.random.fold_in(key, i))
                    return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

                fn = jax.jit(many)
                args = [(fast_key(i), esn0) for i in range(4)]
                t = _timed(fn, args) / (batch * steps)
                print(f"{name:6s} batch={batch:4d}: {t*1e6:7.2f} us/TB "
                      f"({1/t/1e3:6.1f}k TB/s)", flush=True)
        else:
            # decode-only: fori_loop over kernel decodes of fresh noisy LLRs
            nv = p.num_cols * p.Z_c

            def dec_many(key, e, batch=batch):
                def body(i, acc):
                    k = jax.random.fold_in(key, i)
                    llr = 2.0 * jax.random.normal(k, (batch, nv)) + 1.0
                    r = kernel_decode(p, llr, iterations=12,
                                      algorithm="min-sum", schedule="layered")
                    return acc + r.iterations.sum().astype(jnp.float32)
                return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

            def tb_many(key, e, batch=batch):
                def body(i, acc):
                    k = jax.random.fold_in(key, i)
                    llr = 2.0 * jax.random.normal(k, (batch, p.G)) + 1.0
                    r = decode_transport_block(
                        p, llr, None, iterations=12, algorithm="min-sum",
                        backend="auto", schedule="layered")
                    return acc + r.iterations.sum().astype(jnp.float32)
                return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

            for name, f in (("kernel", dec_many), ("tbdec", tb_many)):
                fn = jax.jit(f)
                args = [(fast_key(i), esn0) for i in range(4)]
                t = _timed(fn, args) / (batch * steps)
                print(f"{name:6s} batch={batch:4d}: {t*1e6:7.2f} us/TB "
                      f"({1/t/1e3:6.1f}k TB/s)", flush=True)


if __name__ == "__main__":
    main()
