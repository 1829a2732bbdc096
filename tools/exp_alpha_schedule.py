#!/usr/bin/env python3
"""TPU experiment: iteration-dependent NMS normalization (alpha schedule).

The layered kernel sits at the machine's empirical VPU rate (DESIGN.md
section 9), so the only remaining throughput lever is EXECUTED SWEEPS
(mean 3.8-4.0 at the bench point).  A known NMS convergence trick is a
smaller alpha on the first sweep(s) — damping the optimistic early
messages — then the standard alpha.  This scans (alpha0, n0) at the bench
config and reports, per candidate:

- mean iterations/TB and measured us/cw at the bench operating point
  (Es/N0 = +1.0 dB, the throughput economics),
- BLER at the two pinned mid-waterfall gate points of
  golden/bench_path_bler.json's QPSK_R13 leg (-0.75 dB and -0.5 dB),
  with the binomial CI vs the golden values — a candidate is only
  admissible if both points stay inside the CI (curves unchanged).

Run on the TPU:  python tools/exp_alpha_schedule.py
Conclusions land in DESIGN.md section 8 (win or dead-end, with numbers).
"""
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

    rng = np.random.default_rng(0)
    c = rng.integers(0, 2, size=(batch, p.K)).astype(np.uint8)
    c[:, p.K_prime:] = 0

    def make_llr(esn0, key):
        var = esn0_to_variance(esn0)

        @jax.jit
        def gen(cbits, k):
            cw = encode(p, cbits)
            tx = modulate(cw, "QPSK")
            rx = awgn(k, tx, var)
            return cw, demodulate(rx, "QPSK", var, "exact")

        cw, llr = gen(jnp.asarray(c), jax.random.PRNGKey(key))
        return np.asarray(cw), llr

    # bench operating point (throughput economics)
    cw_b, llr_b = make_llr(1.0, 7)
    # pinned gate points (golden/bench_path_bler.json QPSK_R13)
    gates = []
    for esn0, g_bler, g_err, g_blocks, key in (
        (-0.75, 0.26318359375, 539, 2048, 11),
        (-0.5, 0.0006018350290697674, 159, 264192, 13),
    ):
        gates.append((esn0, g_bler, g_err, g_blocks) + make_llr(esn0, key))

    def measure_bench(sched):
        f = partial(decode, p, iterations=12, algorithm="min-sum",
                    schedule="layered", alpha_schedule=sched)
        r = f(llr=llr_b)
        errs = int((np.asarray(r.bits) != cw_b).any(axis=-1).sum())
        mean_it = float(np.asarray(r.iterations).mean())
        t = slope_time(lambda x: f(llr=x).bits.astype(jnp.float32), llr_b)
        return f, errs, mean_it, t

    candidates = [
        (a0, n0) for n0 in (1, 2, 3) for a0 in (0.55, 0.6, 0.65, 0.7, 0.75)
    ]
    print(f"BG1 Z={p.Z_c} QPSK, 12-it layered NMS alpha=0.8125, "
          f"batch {batch}; screen at +1.0 dB, gates at -0.75/-0.5 dB")
    _, errs0, it0, t0 = measure_bench(None)
    print(f"baseline: mean_it {it0:5.2f}  errs {errs0}  "
          f"{t0/batch*1e6:5.2f} us/cw ({batch/t0/1e3:6.1f}k cw/s)",
          flush=True)
    screened = []
    for sched in candidates:
        f, errs, mean_it, t = measure_bench(sched)
        print(f"sched={sched}: mean_it {mean_it:5.2f}  errs {errs}  "
              f"{t/batch*1e6:5.2f} us/cw ({batch/t/1e3:6.1f}k cw/s)",
              flush=True)
        screened.append((t, mean_it, sched, f))

    # gate the 3 fastest candidates that actually beat the baseline
    screened = sorted(s for s in screened if s[0] < t0)[:3]
    for t, mean_it, sched, f in screened:
        line = f"GATE sched={sched} ({batch/t/1e3:6.1f}k cw/s):"
        for esn0, g_bler, g_err, g_blocks, cw_g, llr_g in gates:
            need = max(int(60 / max(g_bler, 1e-9)), batch)
            need = min(need, 1 << 18)
            errs_g = blocks_g = 0
            k = 0
            while blocks_g < need:
                if k == 0:
                    lg, cg = llr_g, cw_g
                else:
                    cg, lg = make_llr(esn0, 1000 + 31 * k + int(esn0 * 10))
                rg = f(llr=lg)
                errs_g += int((np.asarray(rg.bits) != cg).any(axis=-1).sum())
                blocks_g += batch
                k += 1
            bler = errs_g / blocks_g
            # combined binomial sigma (candidate sample + golden sample)
            sig = float(np.sqrt(g_bler * (1 - g_bler) / blocks_g
                                + g_bler * (1 - g_bler) / g_blocks))
            z = (bler - g_bler) / sig if sig else 0.0
            line += f"  | {esn0:+.2f}dB BLER {bler:.3e} (z={z:+.1f})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
