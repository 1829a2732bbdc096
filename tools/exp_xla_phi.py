#!/usr/bin/env python3
"""Validate the oracle's reverse-engineered XLA:CPU phi, element by element.

Round-3 measurement (and the re-measurement procedure if the installed XLA
ever changes its f32 transcendental rounding — tests/test_conformance.py::
test_phi_bit_exact_vs_oracle failing is the tripwire):

- XLA:CPU's f32 ``tanh`` is the Eigen-family 13/7-degree rational in x^2,
  FMA-contracted, identity below |x| < 4e-4, saturating to +-1 at
  |x| >= 7.99881172180175781 (NOT the older 7.90531 clamp — the polynomial
  keeps being evaluated between the two).
- XLA:CPU's f32 ``log`` is the cephes/Eigen mantissa polynomial with the
  three-way split evaluation; the e*ln2_lo term rides as the addend of the
  final polynomial FMA, and x - x^2/2 is summed BEFORE the polynomial
  (``y = fma(y, x3, e*q1); x = x - x2*0.5; x = x + y; fma(e, q2, x)``).
  It matches neither scalar libm logf (15k/400k off by 1 ulp), libmvec
  (46k/400k), f64-log-then-round (15k), nor plain Eigen plog (9k).

Both recipes were pinned by sweeping candidate structures against dumped
XLA outputs until the mismatch count hit 0/400,000 (see the round-3 log).
This script re-runs that final check through the compiled oracle.
"""
import os
import sys

if __package__ in (None, ""):  # script run: tools/ is sys.path[0]
    import _path  # noqa: F401,E402  (checkout shim; no-op when installed)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from ldpc_3gpp_tpu.ops.decoder import _phi
    from ldpc_3gpp_tpu.utils.golden import golden_phi

    rng = np.random.default_rng(0)
    x = np.concatenate([
        np.float32(10.0) ** rng.uniform(-9, 1.58, 400000).astype(np.float32),
        rng.uniform(1e-9, 38.0, 400000).astype(np.float32),
        # branch boundaries of the tanh recipe and the phi clamp
        np.array([1e-9, 0.0004, 0.0008, 7.998, 7.99881172180175781, 8.0,
                  15.9976, 38.0], np.float32),
    ]).astype(np.float32)
    jp = np.asarray(jax.jit(_phi)(x))
    gp = golden_phi(x)
    bad = int((jp != gp).sum())
    print(f"phi mismatches: {bad}/{x.size}")
    if bad:
        idx = np.nonzero(jp != gp)[0][:10]
        for i in idx:
            print(f"  x={x[i]!r}: xla={jp[i]!r} oracle={gp[i]!r}")
        sys.exit(1)


if __name__ == "__main__":
    main()
