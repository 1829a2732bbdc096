"""Rate matching (TS38.212 Sections 5.4.2.1-5.4.2.2) as static gathers.

The reference implements bit selection as a per-bit ``while`` loop that walks
the circular buffer skipping NaN filler positions (NRLDPCEncoder.m:187-195,
NRLDPCDecoder.m:226-234).  Filler positions are statically known from the
code parameters, so the whole loop collapses at trace time into a precomputed
index vector:

- encoder: ``e = d[..., idx]``  (one gather)
- decoder: ``d_tilde = zeros.at[idx].add(e_tilde)``  (one scatter-add, which
  also performs the LLR Chase combining of repeated bits for free)

The Section 5.4.2.2 bit interleaver is a reshape/transpose.
"""
from __future__ import annotations

import functools

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


def accumulate_llrs(params: LDPCParams, e_tilde: jax.Array, E: int) -> jax.Array:
    """Decoder bit selection: scatter-add rate-matched LLRs into the buffer.

    e_tilde: (..., E) -> d_tilde (..., N).  Repeated positions accumulate
    (Chase combining, NRLDPCDecoder.m:228-234).  Filler positions receive no
    contribution; the chain later pins them to +inf (known zero bits).
    """
    idx = jnp.asarray(selection_indices(params, E))
    zeros = jnp.zeros(e_tilde.shape[:-1] + (params.N,), e_tilde.dtype)
    return zeros.at[..., idx].add(e_tilde)
