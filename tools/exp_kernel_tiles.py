#!/usr/bin/env python3
"""TPU experiment: pallas decoder batch-tile scan (layered + flooding)."""
import os
import sys
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp


def main():
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    p = LDPCParams(BG=1, A=8424, G=25272, Q_m=2)
    batch = 512
    key = jax.random.PRNGKey(0)
    # mid-noise LLRs so some codewords converge at different sweeps
    llr = jax.jit(
        lambda k: 2.0 * jax.random.normal(k, (batch, p.num_cols * p.Z_c)) + 1.0
    )(key)

    for schedule in ("layered", "flooding"):
        for bt in (4, 8, 16, 32):
            try:
                f = partial(decode, p, iterations=12, algorithm="min-sum",
                            schedule=schedule, batch_tile=bt)
                t = slope_time(
                    lambda x: f(llr=x).bits.astype(jnp.float32), llr
                )
                print(f"{schedule:9s} Bt={bt:2d}: {t*1e3:7.3f} ms "
                      f"({t/batch*1e6:6.2f} us/cw, "
                      f"{batch/t/1e3:6.1f}k cw/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{schedule:9s} Bt={bt:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
