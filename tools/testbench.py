#!/usr/bin/env python3
"""Randomized differential conformance testbench (CLI).

The framework's equivalent of the reference's testbench.m: draws random
TS38.212 parameter combinations (testbench.m:21-36), encodes a random
transport block with the JAX chain, and asserts bit-exact equality against
the independent native C++ oracle (native/golden.cpp).  Runs until the trial
budget is exhausted (or forever with --trials 0), printing one line per
config like the reference (testbench.m:70).

With --decode, fuzzes the BP decoder instead (beyond the reference, whose
testbench covers only the encoder): random configs and channel draws, the
flooding min-sum decode compared bit-for-bit — bits, parity flags, iteration
counts — against the independent scalar C++ decoder (nr_golden_decode_core).

Usage:  python tools/testbench.py [--trials N] [--seed S] [--max-a A] [--decode]
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
    ap.add_argument("--decode", action="store_true",
                    help="fuzz the BP decoder against the C++ oracle instead")
    args = ap.parse_args()
    if args.decode and args.max_a == 100000:
        args.max_a = 8448  # one code block; scalar oracle stays fast

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

        if args.decode:
            from functools import partial

            from ldpc_3gpp_tpu.ops import decoder_fast
            from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
            from ldpc_3gpp_tpu.ops.encoder import encode
            from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
            from ldpc_3gpp_tpu.utils.golden import golden_decode_core

            algorithm = ("min-sum", "offset-min-sum")[trial % 2]
            iters = int(rng.integers(2, 13))
            esn0 = float(rng.uniform(-1.0, 5.0))
            batch = 4
            c = rng.integers(0, 2, size=(batch, p.K), dtype=np.uint8)
            c[:, p.K_prime:] = 0
            cw = np.asarray(encode(p, jnp.asarray(c)))
            var = esn0_to_variance(esn0)
            rx = awgn(jax.random.PRNGKey(trial), modulate(jnp.asarray(cw), "QPSK"), var)
            llr = np.asarray(demodulate(rx, "QPSK", var, "exact"), np.float32)
            res = jax.jit(partial(decoder_fast.decode, p, iterations=iters,
                                  algorithm=algorithm))(jnp.asarray(llr))
            gbits, gok, git = golden_decode_core(
                BG, p.Z_c, llr, iterations=iters, algorithm=algorithm)
            same = (np.array_equal(np.asarray(res.bits), gbits)
                    and np.array_equal(np.asarray(res.parity_ok), gok)
                    and np.array_equal(np.asarray(res.iterations), git))
            if not same:
                print(f"[{trial}] DECODE MISMATCH: BG{BG} Z={p.Z_c} "
                      f"{algorithm} it={iters} Es/N0={esn0:.2f}")
                sys.exit(1)
            tested += 1
            print(f"[{trial}] ok decode BG{BG} Z={p.Z_c} {algorithm} "
                  f"it={iters} Es/N0={esn0:.2f} dB ok={int(gok.sum())}/{batch}")
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
