#!/usr/bin/env python3
"""Empirical VPU throughput ceiling for the decode kernel's tile shape.

Rather than trusting paper specs, measures what a Pallas kernel can actually
sustain on one v5e core with the same (Bt, W) = (16, 384) f32 VMEM-resident
tiles the BP decoder uses:

  - add/mul chains (8 independent chains for ILP)
  - min/max chains (the m1/m2 tournament's op type)
  - select chains (jnp.where, the per-edge output path)
  - int bit-op chains (AND/XOR, the sign/magnitude path)
  - lane-roll chains (pltpu.roll, the rotation path)

Prints sustained elementwise-ops/s per category; the decode-kernel roofline
(tools/roofline.py, DESIGN.md section 9) is stated against these numbers.

Usage: python tools/vpu_ceiling.py   (TPU; one process only)
"""
import os
import sys
import time
from functools import partial

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)

import numpy as np

Bt, W = 16, 384
CHAINS = 16  # independent dependency chains for ILP
INNER = 64  # ops per chain per loop iteration
LOOPS = 8192  # ~0.5e12 ops: swamps the ~30 ms tunnel round trip


def _bench(op_name):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, scratch):
        scratch[...] = x_ref[...]

        def body(i, accs):
            outs = []
            for c, a in enumerate(accs):
                v = a
                for k in range(INNER):
                    if op_name == "addmul":
                        v = v * 1.000001 + 0.5 if k % 2 else v * 0.999999
                    elif op_name == "minmax":
                        v = (jnp.minimum(v, 3.0 + c) if k % 2
                             else jnp.maximum(v, -3.0 - c))
                    elif op_name == "select":
                        v = jnp.where(v > c, v - 1e-7, v + 1e-7)
                    elif op_name == "bitops":
                        b = jax.lax.bitcast_convert_type(v, jnp.int32)
                        b = (b ^ (c + 1)) if k % 2 else (b & 0x7FFFFFFF)
                        v = jax.lax.bitcast_convert_type(b, jnp.float32)
                    elif op_name == "roll":
                        v = pltpu.roll(v, 1 + (k % 5), 1)
                    else:
                        raise ValueError(op_name)
                outs.append(v)
            return tuple(outs)

        accs = tuple(scratch[...] + float(c) for c in range(CHAINS))
        accs = jax.lax.fori_loop(0, LOOPS, body, accs)
        t = accs[0]
        for a in accs[1:]:
            t = t + a
        o_ref[...] = t

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bt, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Bt, W), jnp.float32)],
        )(x)

    x = jnp.zeros((Bt, W), jnp.float32)
    float(run(x).sum())  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(run(x).sum())  # scalar fetch = sync
    dt = (time.perf_counter() - t0) / reps
    # ops: select counts the compare+select pair as 2; others 1 per k
    per_k = 2 if op_name == "select" else 1
    ops = Bt * W * CHAINS * INNER * LOOPS * per_k
    return ops / dt


def main():
    import jax

    assert jax.default_backend() == "tpu"
    print(f"tile ({Bt},{W}) f32, {CHAINS} chains x {INNER} ops x {LOOPS} loops")
    for name in ("addmul", "minmax", "select", "bitops", "roll"):
        rate = _bench(name)
        print(f"  {name:<8} {rate/1e12:6.2f} T elementwise-ops/s")


if __name__ == "__main__":
    main()
