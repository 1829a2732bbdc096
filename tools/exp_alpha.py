#!/usr/bin/env python3
"""TPU experiment: normalized-min-sum alpha scan at the bench operating point.

Early termination makes mean sweeps (and thus throughput) a function of
the check-node normalization alpha; this scans alpha at the bench config
(BG1 Z=384, R=1/3, QPSK, 12-iteration budget, Es/N0 per ESN0 env var)
and reports mean iterations, block errors, and measured us/codeword.
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
    batch = 2048
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

    print(f"BG1 Z={p.Z_c} QPSK Es/N0={esn0} dB, 12-it layered NMS, batch {batch}")
    for alpha in (0.70, 0.75, 0.8125, 0.875, 0.9375, 1.0):
        f = partial(decode, p, iterations=12, algorithm="min-sum",
                    schedule="layered", alpha=alpha)
        r = f(llr=llr)
        errs = int((np.asarray(r.bits) != cw).any(axis=-1).sum())
        mean_it = float(np.asarray(r.iterations).mean())
        t = slope_time(lambda x: f(llr=x).bits.astype(jnp.float32), llr)
        print(f"alpha={alpha:6.4f}: mean_it {mean_it:5.2f}  "
              f"errs {errs}/{batch}  {t/batch*1e6:5.2f} us/cw "
              f"({batch/t/1e3:6.1f}k cw/s)", flush=True)


if __name__ == "__main__":
    main()
