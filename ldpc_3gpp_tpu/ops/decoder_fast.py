"""Flooding BP decoder with static rolls — the TPU-fast XLA path.

Same semantics as ops/decoder.py (the segment-op reference oracle), but every
operation XLA lowers well on TPU:

- circulant rotations are ``jnp.roll`` with STATIC shifts (lowered to two
  slices + concat, fused by XLA) instead of per-edge gather tables;
- per-check reductions are unrolled running (m1, m2, argmin, sign) scans over
  each base row's statically-known edge list instead of segment_min/sum
  (which lower to serialized scatters on TPU);
- the syndrome needed for parity-check-satisfied early termination is
  computed from the SAME rotated totals the variable->check pass already
  produces, so early stopping costs nothing extra.

State lives in two arrays carried through a lax.while_loop:
  totals: (num_cols, batch, Z) posterior LLRs per base column block
  c2v:    (E, batch, Z) check->variable messages per base edge

The decoded hard decisions are latched per codeword at the first iteration
whose syndrome is zero (comm.LDPCDecoder 'Parity check satisfied' semantics,
NRLDPCDecoder.m:120), while the rest of the batch keeps iterating.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.params import LDPCParams
from .decoder import DecodeResult, _PHI_MAX, _PHI_MIN, _phi


@functools.lru_cache(maxsize=None)
def _row_plan(params: LDPCParams):
    """Per-base-row edge lists [(edge_idx, col, shift)] and per-col lists."""
    rows, cols, shifts = params.edges
    by_row: List[List[Tuple[int, int, int]]] = [[] for _ in range(params.num_rows)]
    by_col: List[List[Tuple[int, int]]] = [[] for _ in range(params.num_cols)]
    for e, (r, c, s) in enumerate(zip(rows, cols, shifts)):
        by_row[int(r)].append((e, int(c), int(s)))
        by_col[int(c)].append((e, int(s)))
    return by_row, by_col


def decode(
    params: LDPCParams,
    llr: jax.Array,
    iterations: int = 50,
    algorithm: str = "min-sum",
    alpha: float = 0.8125,
    beta: float = 0.15,
    early_termination: bool = True,
) -> DecodeResult:
    """Drop-in equivalent of ops.decoder.decode (see that docstring)."""
    Z = params.Z_c
    nc, nr = params.num_cols, params.num_rows
    assert llr.shape[-1] == nc * Z
    batch_shape = llr.shape[:-1]
    llr_blocks = jnp.moveaxis(
        llr.astype(jnp.float32).reshape(batch_shape + (nc, Z)), -2, 0
    )  # (nc, ..., Z)
    by_row, by_col = _row_plan(params)
    E = len(params.edges[0])

    zero_b = llr_blocks[0, ..., 0] * 0.0  # (...,) varying zeros

    def check_pass(totals, c2v):
        """One flooding iteration + the syndrome of the incoming totals.

        Returns (c2v_new list, per-col accumulators, syndrome_ok).
        """
        new_c2v = [None] * E
        col_acc = [None] * nc
        ok = None
        for r in range(nr):
            edges = by_row[r]
            # variable -> check: rotate totals into check coordinates
            t = [jnp.roll(totals[c], -s, axis=-1) for (_, c, s) in edges]
            # syndrome contribution of this row (uses pre-update totals)
            par = None
            for te in t:
                bit = te < 0
                par = bit if par is None else par ^ bit
            row_ok = jnp.all(~par, axis=-1)  # (...,) even parity for all z
            ok = row_ok if ok is None else ok & row_ok

            v = [te - c2v[e] for te, (e, _, _) in zip(t, edges)]

            if algorithm in ("min-sum", "offset-min-sum"):
                # running (m1, m2, idx) scan + sign product
                m1 = m2 = None
                idx = None
                sprod = None
                for i, ve in enumerate(v):
                    av = jnp.abs(ve)
                    sgn = jnp.sign(ve)
                    sgn = jnp.where(sgn == 0, 1.0, sgn)
                    if m1 is None:
                        m1, m2 = av, jnp.full_like(av, jnp.inf)
                        idx = jnp.zeros_like(av, jnp.int32)
                        sprod = sgn
                    else:
                        better = av < m1
                        m2 = jnp.where(better, m1, jnp.minimum(m2, av))
                        m1 = jnp.where(better, av, m1)
                        idx = jnp.where(better, i, idx)
                        sprod = sprod * sgn
                for i, (ve, (e, c, s)) in enumerate(zip(v, edges)):
                    sgn = jnp.sign(ve)
                    sgn = jnp.where(sgn == 0, 1.0, sgn)
                    mag = jnp.where(idx == i, m2, m1)
                    if algorithm == "min-sum":
                        mag = alpha * mag
                    else:
                        mag = jnp.maximum(mag - beta, 0.0)
                    out = sprod * sgn * mag  # exclusive sign * magnitude
                    new_c2v[e] = out
                    back = jnp.roll(out, s, axis=-1)
                    col_acc[c] = back if col_acc[c] is None else col_acc[c] + back
            elif algorithm == "sum-product":
                phis = [_phi(jnp.abs(ve)) for ve in v]
                T = phis[0]
                sprod = None
                for ve in v:
                    sgn = jnp.sign(ve)
                    sgn = jnp.where(sgn == 0, 1.0, sgn)
                    sprod = sgn if sprod is None else sprod * sgn
                for p in phis[1:]:
                    T = T + p
                for ve, p, (e, c, s) in zip(v, phis, edges):
                    sgn = jnp.sign(ve)
                    sgn = jnp.where(sgn == 0, 1.0, sgn)
                    mag = _phi(jnp.maximum(T - p, _PHI_MIN))
                    out = sprod * sgn * mag
                    new_c2v[e] = out
                    back = jnp.roll(out, s, axis=-1)
                    col_acc[c] = back if col_acc[c] is None else col_acc[c] + back
            else:
                raise ValueError(f"unsupported algorithm {algorithm}")
        return new_c2v, col_acc, ok

    def body(state):
        it, totals, c2v_arr, done, used, out_totals = state
        c2v = [c2v_arr[e] for e in range(E)]
        new_c2v, col_acc, ok = check_pass(totals, c2v)

        # latch outputs at first syndrome pass (uses pre-update totals)
        newly = ok & ~done
        out_totals = jnp.where(newly[..., None], totals, out_totals)
        done = done | ok

        # The final body pass (it == iterations) exists only to check the
        # syndrome after the last permitted update — applying another update
        # there would give never-converged codewords iterations+1 updates
        # (diverging from ops/decoder.py and comm.LDPCDecoder semantics).
        upd = it < iterations
        new_totals = jnp.stack(
            [llr_blocks[c] + col_acc[c] for c in range(nc)], axis=0
        )
        new_totals = jnp.where(upd, new_totals, totals)
        new_c2v_arr = jnp.where(upd, jnp.stack(new_c2v, axis=0), c2v_arr)
        return (
            it + 1,
            new_totals,
            new_c2v_arr,
            done,
            jnp.where(done, used, jnp.minimum(it + 1, iterations)),
            out_totals,
        )

    def cond(state):
        it, _, _, done, _, _ = state
        return (it <= iterations) & ~jnp.all(done)

    totals0 = llr_blocks
    c2v0 = jnp.zeros((E,) + batch_shape + (Z,), jnp.float32) + zero_b[..., None]
    done0 = zero_b > 1.0
    used0 = zero_b.astype(jnp.int32)
    out0 = totals0

    if early_termination:
        it, totals, _, done, used, out_totals = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), totals0, c2v0, done0, used0, out0)
        )
        # codewords that never satisfied parity keep their final totals
        out_totals = jnp.where(done[..., None], out_totals, totals)
        parity_ok = done
        used = jnp.minimum(used, iterations)
    else:
        state = (jnp.asarray(0, jnp.int32), totals0, c2v0, done0, used0, out0)
        state = jax.lax.while_loop(lambda s: s[0] < iterations, body, state)
        _, totals, c2v_arr, _, _, _ = state
        # max-iteration semantics: output the final totals; syndrome of them
        _, _, ok = check_pass(totals, [c2v_arr[e] for e in range(E)])
        parity_ok = ok
        out_totals = totals
        used = jnp.full(batch_shape, iterations, jnp.int32)

    bits = (jnp.moveaxis(out_totals, 0, -2) < 0).reshape(batch_shape + (nc * Z,))
    return DecodeResult(
        bits=bits.astype(jnp.int8), parity_ok=parity_ok, iterations=used
    )
