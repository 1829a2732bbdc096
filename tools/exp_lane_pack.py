#!/usr/bin/env python3
"""TPU experiment: cross-register lane packing vs unpacked, mid-range Z.

Measures the layered min-sum kernel at lifting sizes whose padded width
wastes lanes when unpacked (Z=72 -> 43.75% idle, Z=160 -> 37.5%,
Z=192 -> 25%, Z=208 -> 18.75%, Z=240 -> 6.25%), comparing lane_pack=1
(off), the auto choice, and nearby explicit P values.  Z=384 (W=Z, no
waste) is the control — auto must stay P=1 there.
"""
import os
import sys
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import jax
import jax.numpy as jnp

# (BG, A): A chosen so K' = K_b * Z exactly -> the target Z, single CB
CASES = (
    (2, 336, 44),
    (2, 368, 48),
    (2, 704, 72),
    (1, 3496, 160),
    (1, 4200, 192),
    (1, 4552, 208),
    (1, 5256, 240),
    (1, 8424, 384),
)
BATCH = 2688  # divisible by Bt*P for every P tried below


def main():
    from ldpc_3gpp_tpu.ops.decoder_pallas import _auto_pack, decode
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    enable_compilation_cache()
    for bg, a, z in CASES:
        G = round(a * 3 / 2) * 2
        p = LDPCParams(BG=bg, A=a, G=G, Q_m=2)
        assert p.Z_c == z and p.C == 1, (p.Z_c, p.C)
        key = jax.random.PRNGKey(z)
        llr = jax.jit(
            lambda k: 2.0 * jax.random.normal(k, (BATCH, p.num_cols * p.Z_c))
            + 1.0
        )(key)
        auto = _auto_pack(z)
        tried = sorted({1, auto})
        if "--sweep" in sys.argv:  # nearby explicit P, to audit the heuristic
            tried = sorted(set(tried) | {q for q in (2, 3, 4, 7, 8)
                                         if BATCH % (q * 16) == 0
                                         and q * z <= 1024})
        for P in tried:
            try:
                f = partial(decode, p, iterations=12, algorithm="min-sum",
                            schedule="layered", lane_pack=P)
                t = slope_time(
                    lambda x: f(llr=x).bits.astype(jnp.float32), llr
                )
                tag = " <- auto" if P == auto else ""
                print(f"Z={z:3d} P={P:2d} (W={-(-P*z//128)*128:4d}, "
                      f"util {P*z/(-(-P*z//128)*128):.3f}): "
                      f"{t/BATCH*1e6:6.2f} us/cw, "
                      f"{BATCH/t/1e3:7.1f}k cw/s{tag}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"Z={z:3d} P={P:2d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
