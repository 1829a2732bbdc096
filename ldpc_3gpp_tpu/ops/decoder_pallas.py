"""Pallas TPU kernel: layered normalized min-sum LDPC decoder.

The hot loop of the whole framework (SURVEY.md section 3.2: the BP iteration
loop is ~99% of runtime).  Design:

- **Layout**: lifting dimension Z on lanes, a small batch tile Bt on
  sublanes.  Each kernel instance decodes Bt codewords entirely in VMEM:
  posterior totals (num_cols, Bt, Z) and per-edge check messages
  (E, Bt, Z), f32.  For BG1 Z=384, Bt=16 this is ~1.7 MB + ~7.8 MB — the
  whole decoder state lives on-chip; HBM is touched once on the way in and
  once on the way out.
- **Rotations**: every circulant P^s is a static lane roll of a (Bt, Z)
  tile (pltpu.roll), unrolled per base-graph edge at trace time.  No
  gathers, no scatters, no dynamic indexing anywhere.
- **Schedule**: layered (row-by-row) normalized min-sum — totals are
  updated in place after each check row, which roughly halves the
  iterations needed vs the flooding schedule for the same BLER.
- **Early termination**: the per-row parity of the *current* totals is
  accumulated while the layer sweep runs (it needs no extra rotations); a
  sweep whose every row was satisfied marks the codeword done, freezing its
  state.  The kernel's while_loop exits when the whole tile is done.

Constraint: Z must be a multiple of 128 (lane width) — i.e. Z in
{128, 256, 384}.  Other lifting sizes fall back to ops.decoder_fast; the
BASELINE north-star shape (BG1, Z=384) is covered.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.params import LDPCParams
from .decoder import DecodeResult
from .decoder_fast import _row_plan

DEFAULT_BATCH_TILE = 16


def supports(params: LDPCParams) -> bool:
    return params.Z_c % 128 == 0


def _roll_fwd(x, s, Z):
    """variable->check coords: out[z] = x[(z+s) % Z]  (jnp.roll by -s)."""
    s = s % Z
    if s == 0:
        return x
    return pltpu.roll(x, Z - s, 1)


def _roll_bwd(x, s, Z):
    """check->variable coords: out[z] = x[(z-s) % Z]  (jnp.roll by +s)."""
    s = s % Z
    if s == 0:
        return x
    return pltpu.roll(x, s, 1)


def _make_kernel(params: LDPCParams, iterations: int, alpha: float, Bt: int):
    by_row, _ = _row_plan(params)
    nc, nr, Z = params.num_cols, params.num_rows, params.Z_c
    E = len(params.edges[0])

    def kernel(llr_ref, bits_ref, ok_ref, it_ref, totals, c2v):
        # Load channel LLRs into the VMEM totals scratch, one column block
        # per row of the scratch.
        for c in range(nc):
            totals[c] = llr_ref[:, c * Z : (c + 1) * Z]
        c2v[...] = jnp.zeros((E, Bt, Z), jnp.float32)

        def sweep(carry):
            # done/sweep_ok carried as f32 {0,1} masks — Mosaic cannot carry
            # i1 vectors through scf.while.
            it, done, _ = carry
            keep = done > 0.5  # (Bt, 1): freeze finished codewords
            sweep_ok = jnp.ones((Bt, 1), dtype=jnp.float32)
            for r in range(nr):
                edges = by_row[r]
                t = [_roll_fwd(totals[c], s, Z) for (_, c, s) in edges]
                # on-the-fly parity of current totals (early termination)
                par = t[0] < 0.0
                for te in t[1:]:
                    par = par ^ (te < 0.0)
                row_ok = jnp.min(
                    jnp.where(par, 0.0, 1.0), axis=1, keepdims=True
                )  # (Bt, 1) 1.0 iff every z parity even
                sweep_ok = sweep_ok * row_ok

                v = [te - c2v[e] for te, (e, _, _) in zip(t, edges)]
                # running (m1, m2, argmin) + sign product scan
                m1 = jnp.abs(v[0])
                m2 = jnp.full((Bt, Z), jnp.inf, jnp.float32)
                idx = jnp.zeros((Bt, Z), jnp.int32)
                sprod = jnp.where(v[0] < 0.0, -1.0, 1.0)
                for i in range(1, len(v)):
                    av = jnp.abs(v[i])
                    better = av < m1
                    m2 = jnp.where(better, m1, jnp.minimum(m2, av))
                    m1 = jnp.where(better, av, m1)
                    idx = jnp.where(better, i, idx)
                    sprod = sprod * jnp.where(v[i] < 0.0, -1.0, 1.0)
                for i, (ve, (e, c, s)) in enumerate(zip(v, edges)):
                    sgn = jnp.where(ve < 0.0, -1.0, 1.0)
                    mag = alpha * jnp.where(idx == i, m2, m1)
                    nm = sprod * sgn * mag
                    c2v[e] = jnp.where(keep, c2v[e], nm)
                    # layered in-place total update, rotated back
                    tn = _roll_bwd(jnp.where(keep, t[i], ve + nm), s, Z)
                    totals[c] = tn
            done = jnp.maximum(done, sweep_ok)
            return it + 1, done, sweep_ok

        def cond(carry):
            it, done, _ = carry
            return (it < iterations) & (jnp.min(done) < 0.5)

        done0 = jnp.zeros((Bt, 1), dtype=jnp.float32)
        it_final, done, _ = jax.lax.while_loop(
            cond, sweep, (jnp.asarray(0, jnp.int32), done0, done0)
        )

        for c in range(nc):
            bits_ref[:, c * Z : (c + 1) * Z] = (totals[c] < 0.0).astype(jnp.int8)
        ok_ref[...] = done.astype(jnp.int32)
        it_ref[...] = jnp.broadcast_to(it_final, (Bt, 1)).astype(jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _build(params: LDPCParams, iterations: int, alpha: float, Bt: int,
           interpret: bool = False):
    nc, Z = params.num_cols, params.Z_c
    E = len(params.edges[0])
    kernel = _make_kernel(params, iterations, alpha, Bt)

    def call(llr2d):  # (batch, nc*Z), batch % Bt == 0
        batch = llr2d.shape[0]
        grid = (batch // Bt,)
        bits, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bt, nc * Z), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Bt, nc * Z), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, nc * Z), jnp.int8),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nc, Bt, Z), jnp.float32),
                pltpu.VMEM((E, Bt, Z), jnp.float32),
            ],
            interpret=interpret,
        )(llr2d)
        return bits, ok, iters

    return call


def decode(
    params: LDPCParams,
    llr: jax.Array,
    iterations: int = 50,
    algorithm: str = "min-sum",
    alpha: float = 0.8125,
    beta: float = 0.15,
    early_termination: bool = True,
    batch_tile: int = DEFAULT_BATCH_TILE,
    interpret: bool = False,
) -> DecodeResult:
    """Layered normalized min-sum decode of (..., num_cols*Z) LLRs.

    Note: this is a *layered* schedule — per-iteration trajectories differ
    from the flooding reference (typically ~2x faster convergence).  Use
    ops.decoder_fast for bit-exact flooding/comm.LDPCDecoder semantics.
    """
    del beta
    if algorithm != "min-sum":
        raise ValueError("pallas decoder implements normalized min-sum only")
    if not supports(params):
        raise ValueError(f"Z={params.Z_c} not a lane multiple; use decoder_fast")
    nc, Z = params.num_cols, params.Z_c
    assert llr.shape[-1] == nc * Z
    batch_shape = llr.shape[:-1]
    flat = llr.astype(jnp.float32).reshape(-1, nc * Z)
    batch = flat.shape[0]
    pad = (-batch) % batch_tile
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, nc * Z), jnp.float32)], axis=0
        )

    call = _build(params, iterations, alpha, batch_tile, interpret)
    bits, ok, iters = call(flat)

    bits = bits[:batch].reshape(batch_shape + (nc * Z,))
    ok = ok[:batch, 0].astype(bool).reshape(batch_shape)
    iters = iters[:batch, 0].reshape(batch_shape)
    if not early_termination:
        # layered kernel always early-terminates; report max iterations
        iters = jnp.full(batch_shape, iterations, jnp.int32)
    return DecodeResult(bits=bits, parity_ok=ok, iterations=iters)
