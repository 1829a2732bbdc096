#!/usr/bin/env python3
"""Randomized differential conformance testbench (CLI).

The framework's equivalent of the reference's testbench.m: draws random
TS38.212 parameter combinations (testbench.m:21-36), encodes a random
transport block with the JAX chain, and asserts bit-exact equality against
the independent native C++ oracle (native/golden.cpp).  Runs until the trial
budget is exhausted (or forever with --trials 0), printing one line per
config like the reference (testbench.m:70).

Usage:  python tools/testbench.py [--trials N] [--seed S] [--max-a A]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=100, help="0 = run forever")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-a", type=int, default=100000,
                    help="max transport block size (testbench.m draws <=100000)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ldpc_3gpp_tpu.models.encoder import encode_transport_block
    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.spec.tables import UnsupportedParameters
    from ldpc_3gpp_tpu.utils.golden import golden_encode

    rng = np.random.default_rng(args.seed)
    trial = 0
    tested = 0
    while args.trials == 0 or trial < args.trials:
        trial += 1
        # random draw mirroring testbench.m:21-36
        R = rng.uniform(0.15, 0.95)
        A = int(rng.integers(1, args.max_a + 1))
        Q_m = int(rng.choice([1, 2, 4, 6, 8]))
        N_L = int(rng.integers(1, 5))
        rv_id = int(rng.integers(0, 4))
        I_LBRM = int(rng.integers(0, 2))
        TBS_LBRM = int(rng.integers(A, 2 * A + 1)) if I_LBRM else None
        BG = 2 if (A <= 292 or (A <= 3824 and R <= 0.67) or R <= 0.25) else 1
        G = int(round(A / R / (N_L * Q_m)) * N_L * Q_m)
        try:
            p = LDPCParams(BG=BG, A=A, G=G, Q_m=Q_m, N_L=N_L, rv_id=rv_id,
                           I_LBRM=I_LBRM, TBS_LBRM=TBS_LBRM)
        except UnsupportedParameters as e:
            print(f"[{trial}] skip BG{BG} A={A} G={G}: {e}")
            continue

        a = rng.integers(0, 2, A, dtype=np.uint8)
        g_jax = np.asarray(
            jax.jit(lambda x, p=p: encode_transport_block(p, x))(
                jnp.asarray(a[None])
            )
        )[0]
        g_gold = golden_encode(BG, A, G, Q_m, a, N_L, rv_id, I_LBRM, TBS_LBRM)
        if not np.array_equal(g_jax, g_gold):
            first = int(np.nonzero(g_jax != g_gold)[0][0])
            print(f"[{trial}] MISMATCH at bit {first}: BG{BG} A={A} G={G} "
                  f"Q_m={Q_m} N_L={N_L} rv={rv_id} LBRM={I_LBRM}/{TBS_LBRM}")
            sys.exit(1)
        tested += 1
        print(f"[{trial}] ok BG{BG} A={A} G={G} Q_m={Q_m} N_L={N_L} "
              f"rv={rv_id} C={p.C} Z={p.Z_c} LBRM={I_LBRM}")
    print(f"{tested}/{trial} configs bit-exact vs native oracle")


if __name__ == "__main__":
    main()
