"""Rate matching (TS38.212 Sections 5.4.2.1-5.4.2.2) as static gathers.

The reference implements bit selection as a per-bit ``while`` loop that walks
the circular buffer skipping NaN filler positions (NRLDPCEncoder.m:187-195,
NRLDPCDecoder.m:226-234).  Filler positions are statically known from the
code parameters, so the whole loop collapses at trace time into a precomputed
index vector:

- encoder: ``e = d[..., idx]``  (one gather)
- decoder: the index vector is ``tile(cycle, reps)[:E]`` for one fixed cycle
  of non-filler buffer positions, so the scatter-add the reference implies
  (NRLDPCDecoder.m:228-234) factors into a reshape+sum over the repetition
  axis (the LLR Chase combining) followed by a static inverse-permutation
  gather — XLA scatters serialize on TPU, gathers vectorize.

The Section 5.4.2.2 bit interleaver is a reshape/transpose.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.params import LDPCParams


@functools.lru_cache(maxsize=None)
def selection_indices(params: LDPCParams, E: int) -> np.ndarray:
    """Indices into d (length N) read by bit selection for one code block.

    Implements the NaN-skipping circular read from k_0 (NRLDPCEncoder.m:187-195):
    position p = (k_0 + j) mod N_cb is emitted unless p is a filler position.
    Repetition (E larger than one buffer cycle) wraps naturally.
    """
    lo, hi = params.filler_range_d
    k0, N_cb = params.k_0, params.N_cb
    # One full cycle of non-filler positions starting at k0.
    offsets = (k0 + np.arange(N_cb)) % N_cb
    cycle = offsets[(offsets < lo) | (offsets >= hi)]
    assert cycle.size > 0, "no transmittable positions in circular buffer"
    reps = -(-E // cycle.size)
    return np.tile(cycle, reps)[:E].astype(np.int32)


def interleave(e: jax.Array, Q_m: int) -> jax.Array:
    """Section 5.4.2.2 interleaver: f[i + j*Q_m] = e[i*(E/Q_m) + j].

    (NRLDPCEncoder.m:219-223.)  e: (..., E) with E % Q_m == 0.
    """
    E = e.shape[-1]
    rows = e.reshape(e.shape[:-1] + (Q_m, E // Q_m))
    return jnp.swapaxes(rows, -1, -2).reshape(e.shape[:-1] + (E,))


def deinterleave(f: jax.Array, Q_m: int) -> jax.Array:
    """Inverse of ``interleave`` (NRLDPCDecoder.m:191-195)."""
    E = f.shape[-1]
    cols = f.reshape(f.shape[:-1] + (E // Q_m, Q_m))
    return jnp.swapaxes(cols, -1, -2).reshape(f.shape[:-1] + (E,))


def select_bits(params: LDPCParams, d: jax.Array, E: int) -> jax.Array:
    """Encoder bit selection: d (..., N) -> e (..., E)."""
    idx = jnp.asarray(selection_indices(params, E))
    return jnp.take(d, idx, axis=-1)


@functools.lru_cache(maxsize=None)
def _buffer_slot_map(params: LDPCParams) -> Tuple[np.ndarray, int]:
    """(N,)-map from buffer position to cycle slot, plus the cycle length.

    ``selection_indices`` reads ``tile(cycle, reps)[:E]``; inverting it,
    buffer position ``cycle[t]`` collects exactly the emitted offsets
    ``t, t+len(cycle), t+2*len(cycle), ...`` and every other position
    (fillers, never-transmitted) collects nothing.  Those get slot
    ``len(cycle)`` — an appended all-zero column.
    """
    lo, hi = params.filler_range_d
    k0, N_cb = params.k_0, params.N_cb
    offsets = (k0 + np.arange(N_cb)) % N_cb
    cycle = offsets[(offsets < lo) | (offsets >= hi)]
    slot = np.full(params.N, cycle.size, dtype=np.int32)
    slot[cycle] = np.arange(cycle.size, dtype=np.int32)
    return slot, cycle.size


def accumulate_llrs(params: LDPCParams, e_tilde: jax.Array, E: int) -> jax.Array:
    """Decoder bit selection: accumulate rate-matched LLRs into the buffer.

    e_tilde: (..., E) -> d_tilde (..., N).  Repeated positions accumulate
    (Chase combining, NRLDPCDecoder.m:228-234).  Filler positions receive no
    contribution; the chain later pins them to +inf (known zero bits).

    Equivalent to ``zeros(N).at[selection_indices].add(e_tilde)`` but with
    no scatter: sum over the circular-buffer repetition axis, then one
    static gather placing each cycle slot at its buffer position.
    """
    slot_np, cycle_size = _buffer_slot_map(params)
    slot = jnp.asarray(slot_np)
    lead = e_tilde.shape[:-1]
    reps = -(-E // cycle_size)
    pad = reps * cycle_size - E
    if pad:
        e_tilde = jnp.pad(e_tilde, [(0, 0)] * len(lead) + [(0, pad)])
    if reps > 1:
        acc = e_tilde.reshape(lead + (reps, cycle_size)).sum(axis=-2)
    else:
        acc = e_tilde
    # zero slot for positions that receive nothing
    acc = jnp.pad(acc, [(0, 0)] * len(lead) + [(0, 1)])
    return jnp.take(acc, slot, axis=-1)
