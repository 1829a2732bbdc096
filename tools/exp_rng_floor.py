#!/usr/bin/env python3
"""TPU experiment: what does the 0.83 us/TB `a-only` ablation actually pay for?

exp_fused_share.py found that drawing the (batch, A) info bits alone costs
0.83 us/TB of the 1.16 us/TB non-decode total — far above the HBM cost of
the bits themselves (~4 MB/step -> ~5 us, observed ~106 us/step).  This
decomposes the candidates inside the same fori_loop harness:

  floor        body does no RNG at all (acc + f(i))
  key-ops      fold_in + split only, no bit generation
  bern-1call   one bernoulli draw of (batch, A)
  bern-bf16    same draw via raw bits + bitcast (no f32 uniform conversion)
  bern-3sizes  three draws (A, A/2, A/4) — per-call fixed cost scaling
  noise-only   the channel's normal draw (batch, G) — for comparison
"""
import os
import sys
import time

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.rng import fast_key

    enable_compilation_cache()
    A, G = 8424, 25272
    batch = 128
    steps = 256

    def many(f):
        def run(key, e):
            def body(i, acc):
                return acc + f(jax.random.fold_in(key, i), e)
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))
        return jax.jit(run)

    def floor_step(key, e):
        return jnp.float32(1.0) + e * 0

    def key_ops_step(key, e):
        key_a, key_ch = jax.random.split(key)
        d = jax.random.key_data(key_a) ^ jax.random.key_data(
            jax.random.fold_in(key_ch, 0)
        )
        return d.sum().astype(jnp.float32)

    def bern_step(key, e):
        key_a, _ = jax.random.split(key)
        a = jax.random.bernoulli(key_a, 0.5, (batch, A)).astype(jnp.int8)
        return a.sum(dtype=jnp.int32).astype(jnp.float32)

    def bern_bits_step(key, e):
        key_a, _ = jax.random.split(key)
        bits = jax.random.bits(key_a, (batch, A), jnp.uint8)
        a = (bits & 1).astype(jnp.int8)
        return a.sum(dtype=jnp.int32).astype(jnp.float32)

    def bern3_step(key, e):
        key_a, _ = jax.random.split(key)
        s = jnp.float32(0)
        for i, n in enumerate((A, A // 2, A // 4)):
            a = jax.random.bernoulli(
                jax.random.fold_in(key_a, i), 0.5, (batch, n)
            )
            s = s + a.sum(dtype=jnp.int32).astype(jnp.float32)
        return s

    def noise_step(key, e):
        _, key_ch = jax.random.split(key)
        n = jax.random.normal(jax.random.fold_in(key_ch, 0), (batch, G))
        return n.sum()

    variants = [
        ("floor", many(floor_step)),
        ("key-ops", many(key_ops_step)),
        ("bern-1call", many(bern_step)),
        ("bern-bits", many(bern_bits_step)),
        ("bern-3calls", many(bern3_step)),
        ("noise-only", many(noise_step)),
    ]
    for name, fn in variants:
        _ = float(fn(fast_key(0), jnp.float32(1.0)))
        times = []
        for r in range(5):
            t0 = time.perf_counter()
            outs = [fn(fast_key(1 + 4 * r + i), jnp.float32(1.0))
                    for i in range(4)]
            _ = sum(float(o) for o in outs)
            times.append((time.perf_counter() - t0) / 4)
        t = sorted(times)[2] / (batch * steps)
        print(f"{name:11s}: {t*1e6:6.3f} us/TB ({t*batch*1e6:7.1f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
