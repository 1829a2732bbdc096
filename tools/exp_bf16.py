#!/usr/bin/env python3
"""TPU experiment: f32 vs bf16 decoder state (message_dtype) on real traffic.

Measures the pallas layered/flooding min-sum kernel at the bench config
(BG1 Z=384, A=8424, R=1/3, QPSK) on real encoded+AWGN codewords near the
waterfall, comparing message_dtype='float32' vs 'bfloat16' across batch
tiles: throughput (early termination active) and block-error agreement.
"""
import os
import sys
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode
    from ldpc_3gpp_tpu.ops.encoder import encode
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    p = LDPCParams(BG=1, A=8424, G=25272, Q_m=2)
    batch = 512
    esn0 = float(os.environ.get("ESN0", "1.0"))
    var = esn0_to_variance(esn0)

    rng = np.random.default_rng(0)
    c = rng.integers(0, 2, size=(batch, p.K)).astype(np.uint8)
    c[:, p.K_prime :] = 0

    @jax.jit
    def make_llr(cbits, key):
        cw = encode(p, cbits)
        tx = modulate(cw, "QPSK")
        rx = awgn(key, tx, var)
        return cw, demodulate(rx, "QPSK", var, "exact")

    cw, llr = make_llr(jnp.asarray(c), jax.random.PRNGKey(7))
    cw = np.asarray(cw)

    print(f"config: BG1 Z={p.Z_c} A={p.A} QPSK Es/N0={esn0} dB, batch {batch}")
    for schedule in ("layered", "flooding"):
        for dtype, tiles in (("float32", (8, 16)), ("bfloat16", (16, 32, 64))):
            for bt in tiles:
                try:
                    f = partial(
                        decode, p, iterations=12, algorithm="min-sum",
                        schedule=schedule, batch_tile=bt, message_dtype=dtype,
                    )
                    r = f(llr=llr)
                    errs = int(
                        (np.asarray(r.bits) != cw).any(axis=-1).sum()
                    )
                    nok = int((~np.asarray(r.parity_ok)).sum())
                    t = slope_time(
                        lambda x: f(llr=x).bits.astype(jnp.float32), llr
                    )
                    print(
                        f"{schedule:9s} {dtype:9s} Bt={bt:2d}: "
                        f"{t/batch*1e6:6.2f} us/cw ({batch/t/1e3:6.1f}k cw/s)"
                        f"  block errs {errs}/{batch}, parity fails {nok}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    print(
                        f"{schedule:9s} {dtype:9s} Bt={bt:2d}: FAILED "
                        f"{type(e).__name__}: {str(e)[:160]}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
