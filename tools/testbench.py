#!/usr/bin/env python3
"""Randomized differential conformance testbench (CLI).

The framework's equivalent of the reference's testbench.m: draws random
TS38.212 parameter combinations (testbench.m:21-36), encodes a random
transport block with the JAX chain, and asserts bit-exact equality against
the independent native C++ oracle (native/golden.cpp).  Runs until the trial
budget is exhausted (or forever with --trials 0), printing one line per
config like the reference (testbench.m:70).

With --decode, fuzzes the full TB-level decode chain instead (beyond the
reference, whose testbench covers only the encoder): random configs, channel
draws, and HARQ rv sequences; deinterleave, Chase combining, HARQ buffers,
filler pinning, BP decode, CB/TB CRC gating all compared bit-for-bit against
the independent scalar C++ oracle (nr_golden_decode) — every algorithm,
including sum-product (the oracle's phi reproduces XLA:CPU's f32 tanh/log
rounding exactly; see tools/exp_xla_phi.py).

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
    ap.add_argument("--max-a", type=int, default=None,
                    help="max transport block size; defaults to 100000 "
                         "(testbench.m draws <=100000) for encode trials and "
                         "25000 (C up to 3; JAX CPU decode stays fast) for "
                         "--decode trials")
    ap.add_argument("--decode", action="store_true",
                    help="fuzz the TB-level decode chain against the C++ "
                         "oracle instead")
    args = ap.parse_args()
    if args.max_a is None:
        args.max_a = 25000 if args.decode else 100000

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
        if trial % 5 == 0:
            # every random config is a fresh (large) XLA CPU compile; the
            # JIT's code-section arena is finite and overflows after a few
            # dozen ("LLVM ERROR: Unable to allocate section memory!") —
            # dropping executable references lets it recycle sections
            jax.clear_caches()
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
            from ldpc_3gpp_tpu.models.decoder import (
                decode_transport_block, init_harq_state,
            )
            from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
            from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
            from ldpc_3gpp_tpu.utils.golden import golden_decode, golden_init_state

            mod = {1: "BPSK", 2: "QPSK", 4: "16QAM", 6: "64QAM", 8: "256QAM"}[Q_m]
            algorithm = ("min-sum", "offset-min-sum", "sum-product")[trial % 3]
            iters = int(rng.integers(2, 13))
            esn0 = float(rng.uniform(-1.0, 5.0))
            n_rv = int(rng.integers(1, 4))
            rv_seq = [rv_id] + [int(r) for r in rng.integers(0, 4, n_rv - 1)]
            a = rng.integers(0, 2, A, dtype=np.uint8)
            st_j = init_harq_state(p) if n_rv > 1 else None
            st_c = (golden_init_state(BG, A, G, Q_m, N_L, rv_seq[0],
                                      I_LBRM, TBS_LBRM)
                    if n_rv > 1 else None)
            var = esn0_to_variance(esn0)
            for i_rv, rv in enumerate(rv_seq):
                prv = p.with_rv(rv)
                g = np.asarray(encode_transport_block(prv, jnp.asarray(a)))
                rx = awgn(jax.random.PRNGKey(trial * 8 + i_rv),
                          modulate(jnp.asarray(g), mod), var)
                llr = np.asarray(demodulate(rx, mod, var, "exact"), np.float32)
                res_j = decode_transport_block(
                    prv, jnp.asarray(llr), state=st_j,
                    iterations=iters, algorithm=algorithm)
                res_c = golden_decode(
                    BG, A, G, Q_m, llr, N_L, rv, I_LBRM, TBS_LBRM,
                    iterations=iters, algorithm=algorithm, state=st_c)
                if n_rv > 1:
                    st_j, st_c = res_j.state, res_c.state
                same = (
                    np.array_equal(np.asarray(res_j.a_hat), res_c.a_hat)
                    and bool(res_j.tb_ok) == res_c.tb_ok
                    and np.array_equal(np.asarray(res_j.cb_crc_ok),
                                       res_c.cb_crc_ok)
                    and np.array_equal(np.asarray(res_j.parity_ok),
                                       res_c.parity_ok)
                    and np.array_equal(np.asarray(res_j.iterations),
                                       res_c.iterations)
                )
                if not same:
                    print(f"[{trial}] DECODE MISMATCH: BG{BG} A={A} G={G} "
                          f"C={p.C} Z={p.Z_c} {mod} {algorithm} it={iters} "
                          f"rv_seq={rv_seq[:i_rv+1]} Es/N0={esn0:.2f}")
                    sys.exit(1)
            tested += 1
            print(f"[{trial}] ok decode BG{BG} A={A} C={p.C} Z={p.Z_c} {mod} "
                  f"{algorithm} it={iters} rvs={rv_seq} Es/N0={esn0:.2f} dB "
                  f"tb_ok={res_c.tb_ok}")
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
