"""Pallas TPU kernel: layered normalized min-sum LDPC decoder.

The hot loop of the whole framework (SURVEY.md section 3.2: the BP iteration
loop is ~99% of runtime).  Design:

- **Layout**: lifting dimension Z on lanes (padded to W = ceil(Z/128)*128),
  a small batch tile Bt on sublanes.  Each kernel instance decodes Bt
  codewords entirely in VMEM: posterior totals (num_cols, Bt, W) and
  per-edge check messages (E, Bt, W), f32.  For BG1 Z=384, Bt=16 this is
  ~1.7 MB + ~7.8 MB — the whole decoder state lives on-chip; HBM is touched
  once on the way in and once on the way out.
- **Rotations**: every circulant P^s is a static lane roll of a (Bt, W)
  tile (pltpu.roll), unrolled per base-graph edge at trace time.  When
  Z == W a rotation is a single roll; otherwise it is two rolls + a lane
  select (the mod-Z wraparound inside the padded width).  No gathers, no
  scatters, no dynamic indexing anywhere.
- **Schedule**: layered (row-by-row) normalized min-sum — totals are
  updated in place after each check row, which roughly halves the
  iterations needed vs the flooding schedule for the same BLER.
- **Early termination**: the per-row parity of the *current* totals is
  accumulated while the layer sweep runs (it needs no extra rotations,
  lane-masked to the valid z < Z region); a sweep whose every row was
  satisfied marks the codeword done, freezing its state.  The kernel's
  while_loop exits when the whole tile is done.

Padding discipline: the caller pads each column block from Z to W lanes
with a large positive LLR; rotated reads only ever consume lanes < Z, and
all cross-lane reductions mask to z < Z, so pad lanes never contaminate the
valid region.
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
_PAD_LLR = 1e9  # pad lanes decode to bit 0 and stay finite
_MIN_Z = 8  # below this the XLA flooding path is at least as good


def supports(params: LDPCParams) -> bool:
    return params.Z_c >= _MIN_Z


def _pad_width(Z: int) -> int:
    return -(-Z // 128) * 128


def _lane_mask(Bt: int, W: int, Z: int):
    """(Bt, W) float mask: 1.0 on valid lanes z < Z."""
    z = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
    return (z < Z).astype(jnp.float32)


def _roll_fwd(x, s, Z, W):
    """variable->check coords: out[z] = x[(z+s) % Z] for z < Z."""
    s = s % Z
    if s == 0:
        return x
    if Z == W:
        return pltpu.roll(x, W - s, 1)
    # u[z] = x[z+s]   valid for z < Z-s
    # v[z] = x[z+s-Z] valid for Z-s <= z < Z
    u = pltpu.roll(x, W - s, 1)
    v = pltpu.roll(x, (W - s + Z) % W, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(z < Z - s, u, v)


def _roll_bwd(x, s, Z, W):
    """check->variable coords: out[z] = x[(z-s) % Z] for z < Z."""
    s = s % Z
    if s == 0:
        return x
    if Z == W:
        return pltpu.roll(x, s, 1)
    # u[z] = x[z-s]   valid for z >= s
    # v[z] = x[z-s+Z] valid for z < s
    u = pltpu.roll(x, s, 1)
    v = pltpu.roll(x, s - Z + W, 1) if s - Z + W >= 0 else pltpu.roll(x, s - Z + 2 * W, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(z >= s, u, v)


def _make_kernel(params: LDPCParams, iterations: int, alpha: float, Bt: int):
    by_row, _ = _row_plan(params)
    nc, nr, Z = params.num_cols, params.num_rows, params.Z_c
    W = _pad_width(Z)
    E = len(params.edges[0])

    def kernel(llr_ref, bits_ref, ok_ref, it_ref, totals, c2v):
        # Channel LLRs arrive already padded to (Bt, nc*W); load per column.
        for c in range(nc):
            totals[c] = llr_ref[:, c * W : (c + 1) * W]
        c2v[...] = jnp.zeros((E, Bt, W), jnp.float32)
        valid = _lane_mask(Bt, W, Z) if Z != W else None

        def sweep(carry):
            # done/sweep_ok carried as f32 {0,1} masks — Mosaic cannot carry
            # i1 vectors through scf.while.
            it, done, _ = carry
            keep = done > 0.5  # (Bt, 1): freeze finished codewords
            sweep_ok = jnp.ones((Bt, 1), dtype=jnp.float32)
            for r in range(nr):
                edges = by_row[r]
                t = [_roll_fwd(totals[c], s, Z, W) for (_, c, s) in edges]
                # on-the-fly parity of current totals (early termination)
                par = t[0] < 0.0
                for te in t[1:]:
                    par = par ^ (te < 0.0)
                bad = jnp.where(par, 1.0, 0.0)
                if valid is not None:
                    bad = bad * valid  # ignore pad lanes
                row_ok = 1.0 - jnp.max(bad, axis=1, keepdims=True)  # (Bt, 1)
                sweep_ok = sweep_ok * row_ok

                v = [te - c2v[e] for te, (e, _, _) in zip(t, edges)]
                # running (m1, m2, argmin) + sign product scan
                m1 = jnp.abs(v[0])
                m2 = jnp.full((Bt, W), jnp.inf, jnp.float32)
                idx = jnp.zeros((Bt, W), jnp.int32)
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
                    tn = _roll_bwd(jnp.where(keep, t[i], ve + nm), s, Z, W)
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
            bits_ref[:, c * W : (c + 1) * W] = (totals[c] < 0.0).astype(jnp.int8)
        ok_ref[...] = done.astype(jnp.int32)
        it_ref[...] = jnp.broadcast_to(it_final, (Bt, 1)).astype(jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _build(params: LDPCParams, iterations: int, alpha: float, Bt: int,
           interpret: bool = False):
    nc, Z = params.num_cols, params.Z_c
    W = _pad_width(Z)
    E = len(params.edges[0])
    kernel = _make_kernel(params, iterations, alpha, Bt)

    def call(llr_pad):  # (batch, nc*W), batch % Bt == 0
        batch = llr_pad.shape[0]
        grid = (batch // Bt,)
        bits, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bt, nc * W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Bt, nc * W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, nc * W), jnp.int8),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
                jax.ShapeDtypeStruct((batch, 1), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((nc, Bt, W), jnp.float32),
                pltpu.VMEM((E, Bt, W), jnp.float32),
            ],
            interpret=interpret,
        )(llr_pad)
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
        raise ValueError(f"Z={params.Z_c} too small; use decoder_fast")
    nc, Z = params.num_cols, params.Z_c
    W = _pad_width(Z)
    assert llr.shape[-1] == nc * Z
    batch_shape = llr.shape[:-1]
    flat = llr.astype(jnp.float32).reshape(-1, nc, Z)
    batch = flat.shape[0]
    if W != Z:
        flat = jnp.pad(
            flat, ((0, 0), (0, 0), (0, W - Z)), constant_values=_PAD_LLR
        )
    flat = flat.reshape(-1, nc * W)
    pad = (-batch) % batch_tile
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, nc * W), _PAD_LLR, jnp.float32)], axis=0
        )

    call = _build(params, iterations, alpha, batch_tile, interpret)
    bits, ok, iters = call(flat)

    bits = bits[:batch].reshape(batch, nc, W)[:, :, :Z]
    bits = bits.reshape(batch_shape + (nc * Z,))
    ok = ok[:batch, 0].astype(bool).reshape(batch_shape)
    iters = iters[:batch, 0].reshape(batch_shape)
    if not early_termination:
        # layered kernel always early-terminates; report max iterations
        iters = jnp.full(batch_shape, iterations, jnp.int32)
    return DecodeResult(bits=bits, parity_ok=ok, iterations=iters)
