#!/usr/bin/env python3
"""Roofline analysis of the Pallas BP decode kernel on TPU v5e.

Counts the VPU work one layered/flooding min-sum sweep performs — every
elementwise op on a (Bt, W) vector tile, straight from the kernel source
(ops/decoder_pallas.py::_make_kernel / _check_messages) — then measures
kernel-only throughput at the same operating point and reports achieved
vector-ops/s against the documented v5e VPU ceiling.

Op model (per base row of degree d, per lane, min-sum, ET on):
    rolls          r_nz   one lane-rotation per edge with nonzero delta
                          (layered rests columns at their last shift, so
                          single-row columns roll 0 times; flooding pays a
                          forward AND a backward roll per edge)
    v = t - c2v    d      subtract
    parity         d+1    XOR per edge + OR into the sweep accumulator
    |v| (AND)      d      mask sign bit
    sign XOR       d-1    row sign product
    m1/m2 scan     3(d-1) min + max + min tournament
    scale+sign     5      2 muls (alpha) + 2 XOR + 1 AND, once per row
    per-edge out   4d     compare, select, AND, XOR
    totals update  d      add (layered; flooding pays d roll-backs + d adds
                          into the accumulator + nc channel adds)
Layered arithmetic total: 12d + 2 per row -> sum_r (12 d_r + 2) per sweep.

The VPU ceiling is stated as a documented assumption: a v5e TensorCore VPU
is an (8, 128) vector unit with 4 ALUs per lane position; at the ~1.4-1.75
GHz TensorCore clock range that is 5.7-7.2 Tera vector-ops/s.  We report
achieved ops/s and the fraction of the midpoint (6.4 T).  Lane rotations
ride the cross-lane permute network and are counted separately (they may
overlap ALU work).

Usage: python tools/roofline.py  (TPU; ~2 min, one process only)
"""
import os
import sys
import time
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import numpy as np

VPU_OPS_PER_SEC_MID = 6.4e12  # documented assumption, see module docstring
VPU_OPS_PER_SEC_RANGE = (5.7e12, 7.2e12)


def op_counts(params, schedule="layered"):
    """(arith_ops, rolls) per codeword per sweep for min-sum with ET."""
    from ldpc_3gpp_tpu.ops.decoder_fast import _row_plan
    from ldpc_3gpp_tpu.ops.decoder_pallas import _pad_width

    by_row, _ = _row_plan(params)
    Z = params.Z_c
    nr, nc = params.num_rows, params.num_cols

    arith = 0
    rolls = 0
    if schedule == "layered":
        # replicate the delta computation of _make_kernel
        col_shift = {}
        for r in range(nr):
            for (_, c, s) in by_row[r]:
                col_shift[c] = s
        state = dict(col_shift)
        for r in range(nr):
            d = len(by_row[r])
            for (_, c, s) in by_row[r]:
                if (s - state[c]) % Z != 0:
                    rolls += 1
                state[c] = s
            arith += 12 * d + 2
    else:  # flooding
        for r in range(nr):
            d = len(by_row[r])
            for (_, c, s) in by_row[r]:
                if s % Z != 0:
                    rolls += 2  # forward + backward
            # flooding: same row math; totals update deferred to accumulator
            # (d adds) + nc channel adds + nc selects once per sweep
            arith += 12 * d + 2
        arith += 2 * nc
    # per-lane counts -> per-codeword (x Z effective lanes)
    W = _pad_width(Z)
    return arith * Z, rolls * Z, W


def measure(params, iterations, esn0, schedule="layered", batch=512):
    """Kernel-only per-codeword time + executed sweeps at the bench point."""
    import jax
    import jax.numpy as jnp

    from ldpc_3gpp_tpu.ops.channel import awgn, esn0_to_variance
    from ldpc_3gpp_tpu.ops.decoder_pallas import decode as decode_pallas
    from ldpc_3gpp_tpu.ops.encoder import encode
    from ldpc_3gpp_tpu.ops.modulation import demodulate, modulate
    from ldpc_3gpp_tpu.utils.profiling import slope_time

    rng = np.random.default_rng(0)
    c = rng.integers(0, 2, size=(batch, params.K)).astype(np.uint8)
    c[:, params.K_prime:] = 0

    @jax.jit
    def gen(cbits, k):
        cw = encode(params, cbits)
        var = esn0_to_variance(esn0)
        rx = awgn(k, modulate(cw, "QPSK"), var)
        return demodulate(rx, "QPSK", var, "exact")

    llr = gen(jnp.asarray(c), jax.random.PRNGKey(7))

    dec = partial(decode_pallas, params, iterations=iterations,
                  algorithm="min-sum", schedule=schedule)
    r = jax.jit(dec)(llr)
    iters = np.asarray(r.iterations)
    # per-TILE executed sweeps: the while loop runs until the whole tile is
    # done, so each tile pays max(iterations)+1 (the +1 is the parity-only
    # final syndrome pass, counted as ~2/12 of a sweep below)
    Bt = 16
    tile_sweeps = iters.reshape(-1, Bt).max(axis=1).astype(np.float64)
    mean_sweeps = float(tile_sweeps.mean())
    t_cw = slope_time(jax.jit(dec), llr) / batch
    return t_cw, mean_sweeps, float(iters.mean()), float(np.asarray(r.parity_ok).mean())


def main():
    import jax

    from ldpc_3gpp_tpu.spec.params import LDPCParams
    from ldpc_3gpp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "roofline runs on the TPU"

    print(f"{'config':<34}{'us/cw':>8}{'sweeps':>8}{'Gops/cw':>9}"
          f"{'ops/s':>10}{'VPU frac':>9}{'rolls/s':>10}")
    rows = []
    for name, params, iters, esn0, schedule in [
        ("BG1 Z=384 layered NMS 12it (bench)",
         LDPCParams(BG=1, A=8424, G=25272, Q_m=2), 12, 1.0, "layered"),
        ("BG1 Z=384 flooding NMS 12it",
         LDPCParams(BG=1, A=8424, G=25272, Q_m=2), 12, 1.0, "flooding"),
        ("BG2 Z=208 layered NMS 8it",
         LDPCParams(BG=2, A=3842, G=11526, Q_m=2), 8, 0.75, "layered"),
    ]:
        arith, rolls, W = op_counts(params, schedule)
        t_cw, sweeps, mean_it, conv = measure(params, iters, esn0, schedule)
        # final syndrome pass costs the parity slice of a sweep (~2 of 12)
        eff_sweeps = sweeps + 2 / 12
        # pad waste: tile lanes W vs useful Z
        pad = W / params.Z_c
        gops = arith * eff_sweeps / 1e9
        ops_per_sec = gops * 1e9 / t_cw * pad  # issued including pad lanes
        frac = ops_per_sec / VPU_OPS_PER_SEC_MID
        rolls_per_sec = rolls * eff_sweeps / t_cw * pad
        print(f"{name:<34}{t_cw*1e6:>8.2f}{sweeps:>8.2f}{gops:>9.3f}"
              f"{ops_per_sec/1e12:>9.2f}T{frac:>8.0%}{rolls_per_sec/1e12:>9.2f}T")
        rows.append((name, t_cw, sweeps, gops, ops_per_sec, frac))
    lo, hi = (rows[0][4] / VPU_OPS_PER_SEC_RANGE[1],
              rows[0][4] / VPU_OPS_PER_SEC_RANGE[0])
    print(f"\nbench kernel achieved {rows[0][4]/1e12:.2f} T vector-ops/s "
          f"= {lo:.0%}-{hi:.0%} of the documented v5e VPU ceiling range "
          f"(rolls issued on the permute network on top of that).")


if __name__ == "__main__":
    main()
