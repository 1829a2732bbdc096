#!/usr/bin/env python3
"""TPU experiment: decode's share of the FUSED bench program, by ablation.

DESIGN.md section 8 notes that isolated per-stage slopes sum to well above
the fused bench time — XLA eliminates non-decode intermediates when the
whole chain compiles as one program, so the isolated profile cannot say how
much of the fused program the BP kernel is.  Device-side xprof traces do
not collect over the axon tunnel, so this measures by ablation instead:

  full     the bench chain (encode -> mod -> AWGN -> demod -> decode -> CRC)
  nodec    the same program with the BP decode replaced by the channel hard
           decision (split_rate_matched + filler pinning + CRC gates kept)
  noharq   full but decode at iterations=1 (one sweep: kernel overhead floor)

decode's fused share = (full - nodec) / full.  Same dispatch shape as
bench.py (fori_loop of steps, one aggregate fetch).
"""
import os
import sys
import time

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.models.chain import ChainConfig, simulate_batch
    from ldpc_3gpp_tpu.models.decoder import (
        FILLER_LLR,
        split_rate_matched_symbols,
    )
    from ldpc_3gpp_tpu.models.encoder import encode_to_symbols
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.crc import crc_check
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.rng import fast_key

    enable_compilation_cache()
    A, rate, qm = 8424, 1 / 3, 2
    G = round(A / rate / qm) * qm
    p = LDPCParams(BG=1, A=A, G=G, Q_m=qm)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = 256
    esn0 = jnp.float32(1.0)
    var = esn0_to_variance(1.0)

    def cfg(iters):
        return ChainConfig(
            params=p, modulation="QPSK", rv_sequence=(0,), iterations=iters,
            algorithm="min-sum", early_termination=True, backend="auto",
            schedule="layered",
        )

    def full_step(key, e, iters):
        r = simulate_batch(cfg(iters), key, e, batch)
        return r.block_errors.astype(jnp.float32)

    def nodec_step(key, e):
        # identical chain, BP ablated: hard-decide the combined channel LLRs
        key_a, key_ch = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        tx = encode_to_symbols(p, a, "QPSK")
        rx = awgn(jax.random.fold_in(key_ch, 0), tx, var)
        d = split_rate_matched_symbols(p, rx, "QPSK", var, "exact")
        cw = jnp.concatenate(
            [jnp.zeros(d.shape[:-1] + (2 * p.Z_c,), jnp.float32), d], axis=-1
        )
        if p.K_prime < p.K:
            cw = cw.at[..., p.K_prime: p.K].set(FILLER_LLR)
        bits = (cw < 0).astype(jnp.int8)[..., : p.K_prime - p.cb_crc_len]
        b_hat = bits.reshape(batch, p.B)
        tb_ok = ~crc_check(b_hat, p.tb_crc)
        return jnp.sum(~tb_ok).astype(jnp.float32)

    def many(f):
        def run(key, e):
            def body(i, acc):
                return acc + f(jax.random.fold_in(key, i), e)
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))
        return jax.jit(run)

    def front_step(key, e):
        # everything upstream of the rate-match inverse (the chain's path)
        key_a, key_ch = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        tx = encode_to_symbols(p, a, "QPSK")
        rx = awgn(jax.random.fold_in(key_ch, 0), tx, var)
        return rx.real.sum()

    def split_step(key, e):
        key_a, key_ch = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        tx = encode_to_symbols(p, a, "QPSK")
        rx = awgn(jax.random.fold_in(key_ch, 0), tx, var)
        d = split_rate_matched_symbols(p, rx, "QPSK", var, "exact")
        return d.sum()

    def front_nonoise_step(key, e):
        # AWGN ablated: is the front RNG-bound (the channel's entropy)?
        key_a, _ = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        tx = encode_to_symbols(p, a, "QPSK")
        rx = tx + (0.1 + 0.1j)
        return rx.real.sum()

    def a_only_step(key, e):
        key_a, _ = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        return a.sum(dtype=jnp.int32).astype(jnp.float32)

    def a_enc_mod_step(key, e):
        key_a, _ = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, p.A)).astype(jnp.int8)
        tx = encode_to_symbols(p, a, "QPSK")
        return tx.real.sum()

    def floor_step(key, e):
        # empty body: the harness/tunnel fixed cost every variant pays
        return jnp.float32(1.0) + e * 0

    variants = [
        ("floor", many(floor_step)),
        ("a-only", many(a_only_step)),
        ("a+enc+mod", many(a_enc_mod_step)),
        ("full-12it", many(lambda k, e: full_step(k, e, 12))),
        ("nodec", many(nodec_step)),
        ("dec-1it", many(lambda k, e: full_step(k, e, 1))),
        ("front", many(front_step)),
        ("front+split", many(split_step)),
        ("front-nonoise", many(front_nonoise_step)),
    ]
    results = {}
    for name, fn in variants:
        _ = float(fn(fast_key(0), esn0))  # compile + warm
        times = []
        for r in range(5):
            t0 = time.perf_counter()
            outs = [fn(fast_key(1 + 4 * r + i), esn0) for i in range(4)]
            _ = sum(float(o) for o in outs)
            times.append((time.perf_counter() - t0) / 4)
        t = sorted(times)[2] / (batch * steps)
        results[name] = t
        print(f"{name:13s}: {t*1e6:6.2f} us/TB ({1/t/1e3:6.1f}k TB/s)",
              flush=True)
    # The harness pays a fixed per-dispatch tunnel round trip (the 'floor'
    # variant: an EMPTY program measures ~26 ms/dispatch); subtract it to
    # get on-device shares.
    fl = results["floor"]
    share = (results["full-12it"] - results["nodec"]) / (
        results["full-12it"] - fl
    )
    print(
        f"decode share of the ON-DEVICE fused program at batch={batch}: "
        f"{share*100:.1f}% (non-decode = "
        f"{(results['nodec'] - fl)*1e6:.2f} us/TB on-device; "
        f"harness floor = {fl*1e6:.2f} us/TB)"
    )


if __name__ == "__main__":
    main()
