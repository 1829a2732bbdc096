"""Pallas TPU kernel: layered / flooding BP LDPC decoder.

The hot loop of the whole framework (SURVEY.md section 3.2: the BP iteration
loop is ~99% of runtime).  Design:

- **Layout**: lifting dimension Z on lanes (padded to W = ceil(Z/128)*128),
  a small batch tile Bt on sublanes.  Each kernel instance decodes Bt
  codewords entirely in VMEM: posterior totals (num_cols, Bt, W) f32 and
  per-edge check messages (E, Bt, W) in f32 or bf16 (message_dtype) — the
  whole decoder state lives on-chip; HBM is touched once on the way in and
  once on the way out.
- **Rotations**: every circulant P^s is a static lane roll of a (Bt, W)
  tile (pltpu.roll), unrolled per base-graph edge at trace time.  When
  Z == W a rotation is a single roll; otherwise two rolls + a lane select
  implement the mod-Z wraparound inside the padded width.  No gathers, no
  scatters, no dynamic indexing anywhere.  The layered schedule keeps each
  column's totals in the coordinates of the row that last touched it and
  rolls only by shift deltas — half the rotations of the naive
  roll-in/roll-out scheme, with bit-identical results.
- **Schedules**:
  - ``layered``  — totals updated in place after each check row; converges
    in roughly half the iterations of flooding for the same BLER.
  - ``flooding`` — all check rows read the same totals; identical
    trajectory to ops.decoder_fast / MATLAB comm.LDPCDecoder, at kernel
    speed (needs one extra accumulator buffer; runs with a smaller tile).
- **Algorithms**: normalized min-sum (running m1/m2/argmin + sign scan),
  offset min-sum, and sum-product (phi = -log tanh(x/2), clamped exactly
  like the XLA reference so trajectories agree).
- **Early termination**: per-row parity of the current totals accumulates
  while the sweep runs (no extra rotations, lane-masked to z < Z); a sweep
  whose every row is satisfied marks the codeword done and freezes its
  state; the kernel's while_loop exits when the whole tile is done.  With
  ``early_termination=False`` the kernel instead runs exactly
  ``iterations`` update sweeps with no freezing or latching (skipping the
  per-sweep parity work entirely) and reports the syndrome of the final
  state — the same run-to-budget trajectory as ops/decoder_fast.

Padding discipline: the caller pads each column block from Z to W lanes
with a large positive LLR; rotated reads only ever consume lanes < Z, and
all cross-lane reductions mask to z < Z, so pad lanes never contaminate the
valid region.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.params import LDPCParams
from .decoder import DecodeResult, _PHI_MAX, _PHI_MIN, _phi
from .decoder_fast import _row_plan

# Bt=16 wins for layered delta-rotation since the sign/magnitude check
# update cut per-sweep compute: the larger tile's utilization now beats
# the early-termination tail it pays (the whole tile runs until its
# slowest codeword).  Measured at BG1 Z=384, mid-noise LLRs: 5.77 us/cw
# vs 6.99 at Bt=8; bench point confirms.
LAYERED_BATCH_TILE = 16
# Flooding carries an extra (nc, Bt, W) accumulator, so Bt=16 at Z=384
# (~11 MB of state) only fits under the raised scoped-VMEM cap below.
# Measured at BG1 Z=384, mid-noise LLRs: 99.2k cw/s vs 79.6k at Bt=8
# (+25%); Bt=32 adds only +2.5% more and doubles the early-termination
# tail a tile waits on, so 16 is the default.
FLOODING_BATCH_TILE = 16
# bf16 message storage nearly halves VMEM (a headroom knob, not a speed one)
LAYERED_BATCH_TILE_BF16 = 16
FLOODING_BATCH_TILE_BF16 = 16
_PAD_LLR = 1e9  # pad lanes decode to bit 0 and stay finite
_MIN_Z = 8  # below this the XLA flooding path is at least as good
# Large finite stand-in for the reference's +inf filler LLRs
# (NRLDPCDecoder.m:264) — the kernel pins filler lanes to this when fed the
# raw circular-buffer LLRs (channel_format='d').  models/decoder.FILLER_LLR
# aliases this value so both input formats decode bit-identically.
FILLER_LLR = 1e20

ALGORITHMS = ("min-sum", "offset-min-sum", "sum-product")
SCHEDULES = ("layered", "flooding")


def supports(params: LDPCParams) -> bool:
    return params.Z_c >= _MIN_Z


def _pad_width(Z: int) -> int:
    return -(-Z // 128) * 128


# Widest packed tile the auto-packing heuristic will build: 8 vector
# registers of lanes.  Wider tiles keep paying per-register roll cost but
# stop adding utilization, and every extra packed codeword deepens the
# early-termination tail the whole tile waits on.
_PACK_LANE_CAP = 1024


def _auto_pack(Z: int) -> int:
    """Codewords to pack side by side on the lane axis (P).

    Segments are mod-Z blocks at lanes [k*Z, (k+1)*Z); the tile width is
    ceil(P*Z/128)*128, so P is NOT limited to 128//Z: packing across
    register boundaries recovers the pad waste of mid-range Z, which is
    substantial (Z=160 pads 256 lanes -> 37.5% idle; Z=208 -> 18.75%;
    Z=72 -> 43.75%).  Pick the P maximizing lane utilization minus a small
    per-codeword penalty (every extra packed codeword deepens the
    early-termination tail the whole tile waits on); measured on v5e the
    win tracks utilization (see DESIGN.md section 8).
    """
    best_p, best_score = 1, Z / _pad_width(Z) - 0.01
    for p in range(2, _PACK_LANE_CAP // Z + 1):
        score = (p * Z) / _pad_width(p * Z) - 0.01 * p
        if score > best_score + 1e-9:
            best_p, best_score = p, score
    return best_p


def _roll_fwd(x, s, Z, W, phase=None):
    """variable->check coords: out[z] = x[(z+s) % Z] per mod-Z segment.

    ``phase=None`` (unpacked): one segment at lanes [0, Z), pad above.
    ``phase`` = lane%Z (packed): P independent codeword segments at lanes
    [k*Z, (k+1)*Z) rotate simultaneously — the two rolls read only
    in-segment lanes for every valid output lane (valid lane z with
    (z % Z) < Z-s reads x[z+s] <= lane (k+1)Z-1, staying in-segment; the
    wrapped read likewise), so one pair of rolls serves all P codewords
    regardless of register-boundary alignment.
    """
    s = s % Z
    if s == 0:
        return x
    if Z == W:
        return pltpu.roll(x, W - s, 1)
    # u[z] = x[z+s]   valid for (z % Z) < Z-s
    # v[z] = x[z+s-Z] valid for Z-s <= (z % Z) < Z
    u = pltpu.roll(x, W - s, 1)
    v = pltpu.roll(x, (W - s + Z) % W, 1)
    z = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if phase is None
        else phase
    )
    return jnp.where(z < Z - s, u, v)


def _roll_bwd(x, s, Z, W, phase=None):
    """check->variable coords: out[z] = x[(z-s) % Z] per mod-Z segment."""
    s = s % Z
    if s == 0:
        return x
    if Z == W:
        return pltpu.roll(x, s, 1)
    # u[z] = x[z-s]   valid for (z % Z) >= s
    # v[z] = x[z-s+Z] valid for (z % Z) < s
    u = pltpu.roll(x, s, 1)
    v = pltpu.roll(x, (s - Z) % W, 1)
    z = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if phase is None
        else phase
    )
    return jnp.where(z >= s, u, v)


_SIGN_BIT = np.int32(-(2**31))  # 0x80000000
_MAG_MASK = np.int32(0x7FFFFFFF)
_MAG_INF = np.int32(0x7F7FFFFF)  # f32 max: larger than any finite magnitude


def _sign(x):
    return jnp.where(x < 0.0, -1.0, 1.0)


def _bits(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _f32(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _check_messages(v, algorithm, alpha, beta, Bt, W):
    """Extrinsic messages for one check row from its edge inputs ``v``.

    The min-sum family runs in sign/magnitude bit arithmetic: magnitudes are
    ``bits & 0x7fffffff`` compared as integers (order-isomorphic to floats
    for non-negative values), the two smallest are kept by a min/max
    tournament (no argmin index to track), and signs are XORs of f32 sign
    bits.  Bit-identical to the arithmetic form — ``where(x<0,-1,1)`` vs the
    sign bit differs only at x == -0.0, which cannot arise here: channel
    LLRs are finite with +0.0 at punctured/untransmitted positions, and
    IEEE add/sub of non-(-0.0) operands never produces -0.0.
    """
    if algorithm in ("min-sum", "offset-min-sum"):
        bits = [_bits(ve) for ve in v]
        mags = [b & _MAG_MASK for b in bits]
        sbits = bits[0]
        for b in bits[1:]:
            sbits = sbits ^ b  # only bit 31 is consumed
        # two smallest magnitudes with multiplicity (ties -> m2 == m1)
        m1 = mags[0]
        m2 = jnp.full((Bt, W), _MAG_INF, jnp.int32)
        for mg in mags[1:]:
            m2 = jnp.minimum(m2, jnp.maximum(m1, mg))
            m1 = jnp.minimum(m1, mg)
        # Fold the normalization into m1/m2 once per row instead of once per
        # edge; the scaled magnitudes go back to int bits for the sign XOR.
        if algorithm == "min-sum":
            m1f = alpha * _f32(m1)
            m2f = alpha * _f32(m2)
        else:
            m1f = jnp.maximum(_f32(m1) - beta, 0.0)
            m2f = jnp.maximum(_f32(m2) - beta, 0.0)
        # Pre-fold the row sign product into the scaled magnitudes (their
        # own sign bit is 0): per edge the extrinsic sign then costs one AND
        # + one XOR instead of XOR/AND/OR — bit-identical, OR == XOR on
        # disjoint bits.
        ssign = sbits & _SIGN_BIT
        m1s = _bits(m1f) ^ ssign
        m2s = _bits(m2f) ^ ssign
        out = []
        for mg, b in zip(mags, bits):
            mag = jnp.where(mg == m1, m2s, m1s)
            # extrinsic sign = sign product excluding this edge
            out.append(_f32(mag ^ (b & _SIGN_BIT)))
        return out
    elif algorithm == "sum-product":
        phis = [_phi(jnp.abs(ve)) for ve in v]
        T = phis[0]
        for p in phis[1:]:
            T = T + p
        sprod = _sign(v[0])
        for ve in v[1:]:
            sprod = sprod * _sign(ve)
        return [
            sprod * _sign(ve) * _phi(jnp.maximum(T - p, _PHI_MIN))
            for ve, p in zip(v, phis)
        ]
    raise ValueError(f"unsupported algorithm {algorithm}")


def _resolve_layer_order(params: LDPCParams, layer_order):
    """Normalize the layered processing order to a concrete row tuple.

    'reversed' (the default) processes check rows last-to-first: measured
    8-17% fewer sweeps to convergence than the natural order at the BG1
    bench operating points (see DESIGN.md section 9) — the low-degree
    extension rows settle their parity columns before the dense core rows
    re-read them.  Flooding is order-invariant (every row reads the same
    pre-sweep totals), so this only affects the layered schedule.
    """
    nr = params.num_rows
    if layer_order == "natural":
        return tuple(range(nr))
    if layer_order == "reversed":
        return tuple(range(nr - 1, -1, -1))
    order = tuple(int(r) for r in layer_order)
    if sorted(order) != list(range(nr)):
        raise ValueError(f"layer_order must permute 0..{nr - 1}")
    return order


def _make_kernel(params: LDPCParams, iterations: int, algorithm: str,
                 schedule: str, alpha: float, beta: float, Bt: int,
                 dtype=jnp.float32, P: int = 1, early_termination: bool = True,
                 layer_order=(), d_input: bool = False,
                 sys_output: bool = False, alpha_schedule=None):
    et = early_termination
    by_row, _ = _row_plan(params)
    nc, nr, Z = params.num_cols, params.num_rows, params.Z_c
    W = _pad_width(max(P, 1) * Z)
    E = len(params.edges[0])
    flooding = schedule == "flooding"
    row_seq = list(layer_order) if layer_order else list(range(nr))
    # output_format='sys': emit hard bits only for the num_sys_cols columns
    # covering the K systematic+filler bits the TB chain consumes — the
    # parity columns' bits (2/3 of the codeword) are never read downstream,
    # so skipping them shrinks the output write 3x and, on the layered
    # schedule, drops their epilogue un-rotations and per-sweep latches.
    out_cols = params.num_sys_cols if sys_output else nc
    assert out_cols * Z >= params.K
    # channel_format='d': the input is the raw (nc-2)*Z circular-buffer LLRs
    # (fillers NOT pinned); the 2Z punctured zeros are synthesized and the
    # statically-known filler lanes pinned to FILLER_LLR at load time, in
    # VMEM — skipping the concat + set materialization the caller would
    # otherwise stream through HBM.  Values are identical to the 'cw' path.
    flo, fhi = params.filler_range_d if d_input else (0, 0)

    # Layered delta-rotation: totals[c] is kept in the check coordinates of
    # the row that last touched column c, so each edge needs a single roll
    # by the shift DELTA from the previous use instead of a forward roll in
    # and a backward roll out — ~2x fewer lane rotations per sweep (and
    # none at all for columns touched by one row, e.g. all extension
    # parity columns).  The entry state equals the end-of-sweep state (each
    # column at its last edge's shift), making the sweep a fixed point of
    # the representation; values are bit-identical to the plain scheme
    # (rolls are lane permutations, the per-lane arithmetic is unchanged).
    col_shift = {}  # column -> shift it rests at between sweeps
    deltas = None
    if not flooding:
        for r in row_seq:
            for (_, c, s) in by_row[r]:
                col_shift[c] = s
        deltas = {}
        state = dict(col_shift)
        for r in row_seq:
            row_d = []
            for (_, c, s) in by_row[r]:
                row_d.append((s - state[c]) % Z)
                state[c] = s
            deltas[r] = row_d
        assert state == col_shift  # sweep maps the rest state to itself

    packed = P > 1

    # Flooding's deferred-update accumulator: the first row to touch each
    # column ASSIGNS instead of adding, so the per-sweep (nc, Bt, W)
    # zero-fill (and one add per column) disappears.  Static per plan.
    # Bit-exact vs the former 0-init: `0.0 + r` differs from `r` only at
    # r == -0.0, and a -0.0 accumulator can only change `totals = llr + acc`
    # if llr itself were -0.0 — excluded by the same channel-LLR invariant
    # the sign-bit arithmetic in _check_messages already relies on.
    acc_first = set()
    if flooding:
        seen_cols = set()
        for r in row_seq:
            for (e, c, _) in by_row[r]:
                if c not in seen_cols:
                    seen_cols.add(c)
                    acc_first.add(e)
        untouched_cols = [c for c in range(nc) if c not in seen_cols]
        assert not untouched_cols  # every column has at least one edge

    def kernel(llr_ref, bits_ref, ok_ref, it_ref, totals, c2v, *acc_scratch):
        acc = acc_scratch[0] if flooding else None
        out_vals = None if flooding else acc_scratch[0]
        if packed:
            lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
            phase = lane % Z
            valid = (lane < P * Z).astype(jnp.float32) if P * Z < W else None
        else:
            phase = None
            if Z != W:
                zlane = jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
                valid = (zlane < Z).astype(jnp.float32)
            else:
                valid = None
        def load_col(c):
            """Channel LLRs of codeword column c, in variable coordinates.

            'cw' format: the caller materialized the full codeword buffer.
            'd' format: columns 0-1 (the always-punctured 2Z systematic
            bits, NRLDPCDecoder.m:262) are synthesized as zeros and the
            statically-known filler lanes pinned to FILLER_LLR here in
            VMEM, so the caller streams only the raw circular buffer.
            """
            if not d_input:
                return llr_ref[:, c * W : (c + 1) * W]
            if c < 2:
                return jnp.zeros((Bt, W), jnp.float32)
            col = llr_ref[:, (c - 2) * W : (c - 1) * W]
            lf = max(flo - (c - 2) * Z, 0)
            hf = min(fhi - (c - 2) * Z, Z)
            if lf < hf:  # this column intersects the filler hole
                zloc = (
                    phase
                    if phase is not None
                    else jax.lax.broadcasted_iota(jnp.int32, (Bt, W), 1)
                )
                col = jnp.where((zloc >= lf) & (zloc < hf), FILLER_LLR, col)
            return col

        # Channel LLRs arrive already padded to (Bt, nci*W); load per column
        # (layered: pre-rotated to each column's rest coordinates).
        for c in range(nc):
            totals[c] = _roll_fwd(load_col(c), col_shift.get(c, 0), Z, W, phase)
            if not flooding and et and iterations == 0 and c < out_cols:
                # iterations == 0 must output the channel hard decision
                # (with a budget, the hoisted first sweep's latch writes
                # every output column, so no init is needed)
                out_vals[c] = totals[c]
        if flooding:
            # Layered hoists a zero-message first sweep instead (below), so
            # only flooding pays the (E, Bt, W) zero-fill.
            c2v[...] = jnp.zeros((E, Bt, W), dtype)

        def row_parity(t, bad_bits):
            """Fold one row's sign-parity into the sweep accumulator.

            One XOR per edge on the raw f32 bits plus one OR per row; only
            bit 31 (the sign) of the accumulator is meaningful, tested once
            per SWEEP in reduce_ok — no per-row compare, mask, or
            cross-lane reduction.
            """
            pb = _bits(t[0])
            for te in t[1:]:
                pb = pb ^ _bits(te)
            return bad_bits | pb

        def reduce_ok(bad_bits):
            """(Bt, W) int parity accumulator -> per-codeword ok flags."""
            bad = jnp.where(bad_bits < 0, 1.0, 0.0)
            if valid is not None:
                bad = bad * valid  # ignore pad lanes
            if packed:
                # segment-local all-reduce: after ceil(log2 Z) doubling
                # rotations every lane holds its codeword's max violation
                d = 1
                while d < Z:
                    bad = jnp.maximum(bad, _roll_bwd(bad, d, Z, W, phase))
                    d *= 2
                return 1.0 - bad  # (Bt, W)
            return 1.0 - jnp.max(bad, axis=1, keepdims=True)  # (Bt, 1)

        def sweep(carry, first=False):
            # done/sweep_ok/used carried as f32 — Mosaic cannot carry i1
            # vectors through scf.while.  Packed tiles (P > 1) carry them
            # per LANE (uniform within each codeword's Z-segment) instead
            # of per sublane row, so every packed codeword still freezes,
            # counts, and reports individually.
            # ``first=True`` (layered, hoisted out of the while_loop): the
            # check messages are known to be zero, so the per-edge c2v read
            # and subtract are skipped — and the (E, Bt, W) zero-fill they
            # would have consumed never happens.  Bit-identical (x - 0 == x
            # for every finite non-(-0.0) x, which totals are).
            it, done, used = carry
            # Iteration-dependent normalization (min-sum only): alpha0 for
            # the first n0 update sweeps, the standard alpha after.  The
            # hoisted first sweep runs at it == 0, so its choice is static.
            if alpha_schedule and algorithm == "min-sum":
                a0, n0 = alpha_schedule
                if first:
                    alpha_t = a0 if n0 > 0 else alpha
                else:
                    alpha_t = jnp.where(
                        it < n0, jnp.float32(a0), jnp.float32(alpha)
                    )
            else:
                alpha_t = alpha
            bad_bits = jnp.zeros((Bt, W), jnp.int32)
            if flooding:
                # Flooding freezes finished codewords (and all updates on
                # the final pass it == iterations, which exists only to
                # check the syndrome of the last permitted update) so its
                # trajectory matches ops/decoder_fast sweep for sweep.
                # With early termination off nothing ever freezes: the loop
                # runs exactly `iterations` update sweeps (cond below).
                if et:
                    keep = jnp.logical_or(done > 0.5, it >= iterations)
                # acc is (re)initialized by each column's first edge below
            for r in row_seq:
                edges = by_row[r]
                if flooding:
                    t = [
                        _roll_fwd(totals[c], s, Z, W, phase)
                        for (_, c, s) in edges
                    ]
                else:
                    t = [
                        _roll_fwd(totals[c], d, Z, W, phase)
                        for (_, c, _), d in zip(edges, deltas[r])
                    ]
                # on-the-fly parity of current totals (early termination)
                if et:
                    bad_bits = row_parity(t, bad_bits)

                v = (
                    list(t)
                    if first
                    else [
                        te - c2v[e].astype(jnp.float32)
                        for te, (e, _, _) in zip(t, edges)
                    ]
                )
                nm = _check_messages(v, algorithm, alpha_t, beta, Bt, W)
                for i, (ve, (e, c, s)) in enumerate(zip(v, edges)):
                    if flooding:
                        if et:
                            c2v[e] = jnp.where(keep, c2v[e], nm[i].astype(dtype))
                        else:
                            c2v[e] = nm[i].astype(dtype)
                        rolled = _roll_bwd(nm[i], s, Z, W, phase)
                        acc[c] = rolled if e in acc_first else acc[c] + rolled
                    else:
                        # Layered: updates run unfrozen — finished codewords
                        # keep evolving harmlessly while their OUTPUT was
                        # latched in out_vals the sweep they converged, so
                        # no per-edge freeze selects are needed (the freeze
                        # cost 2 selects/edge; the latch costs 1 select per
                        # COLUMN per sweep).
                        c2v[e] = nm[i].astype(dtype)
                        totals[c] = ve + nm[i]
            if not et:
                # run-to-budget: apply the update unconditionally, nothing
                # freezes or latches, flags/counters are settled post-loop
                if flooding:
                    for c in range(nc):
                        totals[c] = load_col(c) + acc[c]
                return it + 1, done, used
            sweep_ok = reduce_ok(bad_bits)
            newly = jnp.maximum(done, sweep_ok) - done  # {0,1}
            if flooding:
                # A codeword whose syndrome passed THIS sweep keeps its
                # pre-update totals (matches decoder_fast's latch: the output
                # is the state the syndrome was checked on).  Updates were
                # deferred to acc, so totals still hold the checked state.
                keep_out = jnp.logical_or((done + newly) > 0.5, it >= iterations)
                for c in range(nc):
                    new_t = load_col(c) + acc[c]
                    totals[c] = jnp.where(keep_out, totals[c], new_t)
            else:
                # Latch the output state of every not-yet-done codeword (in
                # rest coordinates — the sweep ends there).  A codeword that
                # converged THIS sweep keeps exactly its converging state; a
                # codeword that never converges is last latched after sweep
                # `iterations - 1`, i.e. exactly `iterations` updates
                # (matches ops/decoder_layered.py).
                notdone = done < 0.5
                for c in range(out_cols):
                    out_vals[c] = jnp.where(notdone, totals[c], out_vals[c])
            used = used + newly * it.astype(jnp.float32)
            done = jnp.maximum(done, sweep_ok)
            return it + 1, done, used

        def cond(carry):
            it, done, _ = carry
            if not et:
                return it < iterations  # exactly `iterations` update sweeps
            limit = iterations if flooding else iterations - 1
            return (it <= limit) & (jnp.min(done) < 0.5)

        if packed and valid is not None:
            done0 = 1.0 - valid  # idle lanes never gate the exit
        elif packed:
            done0 = jnp.zeros((Bt, W), jnp.float32)
        else:
            done0 = jnp.zeros((Bt, 1), jnp.float32)
        carry0 = (jnp.asarray(0, jnp.int32), done0, done0 * 0.0)
        if not flooding and iterations > 0:
            # Hoist sweep 0 (all check messages zero) out of the loop: for a
            # positive budget the loop condition at it=0 is statically true
            # (done0 always has an undone lane), so running it eagerly with
            # first=True is trajectory-identical while skipping the c2v
            # zero-fill and sweep-0's per-edge reads/subtracts.
            carry0 = sweep(carry0, first=True)
        it_final, done, used = jax.lax.while_loop(cond, sweep, carry0)

        if not et:
            # Run-to-budget semantics (ops/decoder_fast early_termination=
            # False): bits from the FINAL totals, parity flag = the syndrome
            # of that final state, iteration count = the full budget.
            it_ref[...] = jnp.full(it_ref.shape, iterations, jnp.int32)
            bad_bits = jnp.zeros((Bt, W), jnp.int32)
            for r in row_seq:
                t = [
                    _roll_fwd(
                        totals[c],
                        s if flooding else (s - col_shift[c]) % Z,
                        Z, W, phase,
                    )
                    for (_, c, s) in by_row[r]
                ]
                bad_bits = row_parity(t, bad_bits)
            ok_ref[...] = reduce_ok(bad_bits).astype(jnp.int32)
            for c in range(out_cols):
                val = (
                    totals[c]
                    if flooding
                    else _roll_bwd(totals[c], col_shift.get(c, 0), Z, W, phase)
                )
                bits_ref[:, c * W : (c + 1) * W] = (val < 0.0).astype(jnp.int8)
            return

        # codewords never done used the full budget
        used = jnp.where(done > 0.5, used, float(iterations))
        it_ref[...] = used.astype(jnp.int32)

        if flooding:
            for c in range(out_cols):
                bits_ref[:, c * W : (c + 1) * W] = (
                    totals[c] < 0.0
                ).astype(jnp.int8)
            ok_ref[...] = done.astype(jnp.int32)
        else:
            for c in range(out_cols):
                # rotate each column back from its rest coordinates
                val = _roll_bwd(out_vals[c], col_shift.get(c, 0), Z, W, phase)
                bits_ref[:, c * W : (c + 1) * W] = (val < 0.0).astype(jnp.int8)
            ok_ref[...] = done.astype(jnp.int32)

            # Stragglers got their `iterations`-th update during the last
            # sweep, whose on-the-fly parity saw a half-updated state; give
            # the settled state one clean syndrome check (this replaces the
            # old scheme's extra fully-frozen sweep — parity only, no
            # message math).  Tiles that converged early skip it entirely.
            @pl.when(jnp.min(done) < 0.5)
            def _final_syndrome():
                bad_bits = jnp.zeros((Bt, W), jnp.int32)
                for r in row_seq:
                    t = [
                        _roll_fwd(
                            totals[c], (s - col_shift[c]) % Z, Z, W, phase
                        )
                        for (_, c, s) in by_row[r]
                    ]
                    bad_bits = row_parity(t, bad_bits)
                sweep_ok = reduce_ok(bad_bits)
                ok_ref[...] = jnp.maximum(done, sweep_ok).astype(jnp.int32)

    return kernel


@functools.lru_cache(maxsize=None)
def _build(params: LDPCParams, iterations: int, algorithm: str, schedule: str,
           alpha: float, beta: float, Bt: int, interpret: bool = False,
           dtype_name: str = "float32", P: int = 1,
           early_termination: bool = True, layer_order=(),
           d_input: bool = False, sys_output: bool = False,
           alpha_schedule=None):
    nc, Z = params.num_cols, params.Z_c
    nci = nc - 2 if d_input else nc  # input columns (see channel_format)
    out_cols = params.num_sys_cols if sys_output else nc
    W = _pad_width(max(P, 1) * Z)
    E = len(params.edges[0])
    dtype = jnp.dtype(dtype_name)
    kernel = _make_kernel(params, iterations, algorithm, schedule, alpha, beta,
                          Bt, dtype, P, early_termination, layer_order, d_input,
                          sys_output, alpha_schedule)
    flooding = schedule == "flooding"
    outw = W if P > 1 else 1  # per-lane flags for packed tiles

    scratch = [
        pltpu.VMEM((nc, Bt, W), jnp.float32),  # totals: always f32
        pltpu.VMEM((E, Bt, W), dtype),  # check messages: the storage knob
        # flooding: deferred-update accumulator (all columns); layered:
        # latched output state (only the emitted columns)
        pltpu.VMEM(((nc if flooding else out_cols), Bt, W), jnp.float32),
    ]

    def call(llr_pad):  # (batch, nci*W), batch % Bt == 0
        batch = llr_pad.shape[0]
        grid = (batch // Bt,)
        bits, ok, iters = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bt, nci * W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Bt, out_cols * W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, outw), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, outw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, out_cols * W), jnp.int8),
                jax.ShapeDtypeStruct((batch, outw), jnp.int32),
                jax.ShapeDtypeStruct((batch, outw), jnp.int32),
            ),
            scratch_shapes=scratch,
            interpret=interpret,
            # The compiler's default scoped-vmem budget is 16 MB; v5e has
            # 128 MB of physical VMEM.  Raising the cap admits batch tiles
            # past the default budget (Z=384 f32 state is ~0.6 MB/codeword,
            # so Bt=32 needs ~19 MB).  Measured at Z=384: Bt=32 is within
            # noise of Bt=16 (164.5k vs 162.4k cw/s), so the default tile
            # stays 16; the headroom is for large-message configs.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
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
    schedule: str = "layered",
    batch_tile: int = 0,
    interpret: bool = False,
    message_dtype: str = "float32",
    lane_pack: int = 0,
    layer_order="reversed",
    channel_format: str = "cw",
    output_format: str = "cw",
    alpha_schedule=None,
) -> DecodeResult:
    """BP decode of (..., num_cols*Z) LLRs fully in VMEM.

    channel_format='cw' (default): ``llr`` is the full (..., num_cols*Z)
    codeword buffer — punctured 2Z zeros prepended and fillers already
    pinned by the caller.  channel_format='d': ``llr`` is the raw
    (..., (num_cols-2)*Z) rate-matching circular buffer (TS38.212 d, with
    fillers NOT pinned); the kernel synthesizes the punctured zeros and
    pins the statically-known filler lanes at load time in VMEM, saving
    the caller one full-buffer HBM materialization.  Decoded values are
    bit-identical between the two formats.

    output_format='cw' (default): ``bits`` covers the full num_cols*Z
    codeword.  output_format='sys': ``bits`` covers only the first
    num_sys_cols*Z = K systematic+filler positions (all the TB chain
    reads) — identical to the 'cw' prefix, but the parity columns' output
    write (2/3 of the codeword) and, on the layered schedule, their
    epilogue un-rotations and per-sweep output latches are skipped.

    schedule='layered' converges ~2x faster per iteration; 'flooding'
    reproduces the trajectory of ops.decoder_fast / MATLAB comm.LDPCDecoder
    (same algorithm, same syndrome-check points) at kernel speed.

    message_dtype='bfloat16' stores the per-edge check messages (the
    dominant VMEM buffer: E of the E+nc state tiles) in bf16, doubling the
    codewords per tile; arithmetic stays f32 (measured on v5e: bf16 VPU ops
    run at f32 rate, so packed compute buys nothing, and Mosaic rejects
    16-bit compare-selects anyway — messages are only rounded on store).
    Min-sum BLER impact is negligible (bf16 carries 8 mantissa bits;
    classic fixed-point LDPC decoders run at 6); sum-product stays
    f32-only so its trajectory remains bit-exact vs the XLA reference.

    alpha_schedule=(alpha0, n0) (min-sum only): check-node normalization
    alpha0 for the first n0 update sweeps, the standard ``alpha`` after —
    an NMS convergence knob (smaller early alpha damps the optimistic
    first messages).  None (default) keeps the constant-alpha trajectory
    bit-for-bit.  Oracle: ops/decoder_layered.py's identical knob.

    layer_order: layered-schedule row processing order — 'reversed'
    (default; measured 8-17% fewer sweeps than natural at the BG1 bench
    points, identical BLER-at-convergence semantics), 'natural' (ascending
    row index), or an explicit permutation tuple.  Ignored by the flooding
    schedule, whose trajectory is order-invariant.

    lane_pack: codewords packed side by side on the lane axis — P
    codewords share each (Bt, W) tile as independent mod-Z segments at
    lanes [k*Z, (k+1)*Z), with W = ceil(P*Z/128)*128 (0 = automatic
    choice maximizing lane utilization, 1 = off, n = explicit).  Packing
    is NOT limited to Z < 128: mid-range Z pads heavily (Z=160 -> 37.5%
    idle lanes, Z=208 -> 18.75%), and packing across vector-register
    boundaries recovers that waste.  Rolls act segment-locally (same
    two-roll+select as the pad path, with a lane%Z phase mask), and
    freeze/termination masks are per lane, so packed decoding is
    bit-identical per codeword to unpacked.
    """
    if algorithm not in ALGORITHMS:
        raise ValueError(f"unsupported algorithm {algorithm}")
    if schedule not in SCHEDULES:
        raise ValueError(f"unsupported schedule {schedule}")
    if not supports(params):
        raise ValueError(f"Z={params.Z_c} too small; use decoder_fast")
    dtype = jnp.dtype(message_dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"unsupported message_dtype {message_dtype}")
    bf16 = dtype == jnp.dtype(jnp.bfloat16)
    if bf16 and algorithm == "sum-product":
        raise ValueError("sum-product requires message_dtype='float32'")
    if batch_tile <= 0:
        if schedule == "flooding":
            batch_tile = FLOODING_BATCH_TILE_BF16 if bf16 else FLOODING_BATCH_TILE
        else:
            batch_tile = LAYERED_BATCH_TILE_BF16 if bf16 else LAYERED_BATCH_TILE
    if channel_format not in ("cw", "d"):
        raise ValueError(f"unsupported channel_format {channel_format!r}")
    if output_format not in ("cw", "sys"):
        raise ValueError(f"unsupported output_format {output_format!r}")
    nc, Z = params.num_cols, params.Z_c
    d_input = channel_format == "d"
    nci = nc - 2 if d_input else nc
    nco = params.num_sys_cols if output_format == "sys" else nc
    P = _auto_pack(Z) if lane_pack == 0 else lane_pack
    if P < 1:
        raise ValueError(f"lane_pack={lane_pack} invalid for Z={Z}")
    W = _pad_width(P * Z)
    assert llr.shape[-1] == nci * Z
    batch_shape = llr.shape[:-1]
    flat = llr.astype(jnp.float32).reshape(-1, nci, Z)
    batch = flat.shape[0]
    if P > 1:
        # pack P codewords side by side on the lane axis
        padb = (-batch) % P
        if padb:
            flat = jnp.concatenate(
                [flat, jnp.full((padb, nci, Z), _PAD_LLR, jnp.float32)], axis=0
            )
        nb = (batch + padb) // P
        flat = flat.reshape(nb, P, nci, Z).swapaxes(1, 2).reshape(nb, nci, P * Z)
        if P * Z < W:
            flat = jnp.pad(
                flat, ((0, 0), (0, 0), (0, W - P * Z)), constant_values=_PAD_LLR
            )
    else:
        nb = batch
        if W != Z:
            flat = jnp.pad(
                flat, ((0, 0), (0, 0), (0, W - Z)), constant_values=_PAD_LLR
            )
    flat = flat.reshape(-1, nci * W)
    pad = (-nb) % batch_tile
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad, nci * W), _PAD_LLR, jnp.float32)], axis=0
        )

    order = (_resolve_layer_order(params, layer_order)
             if schedule == "layered" else ())
    if alpha_schedule is not None:
        if algorithm != "min-sum":
            raise ValueError("alpha_schedule applies to min-sum only")
        alpha_schedule = (float(alpha_schedule[0]), int(alpha_schedule[1]))
    call = _build(params, iterations, algorithm, schedule, alpha, beta,
                  batch_tile, interpret, dtype_name=jnp.dtype(dtype).name, P=P,
                  early_termination=early_termination, layer_order=order,
                  d_input=d_input, sys_output=output_format == "sys",
                  alpha_schedule=alpha_schedule)
    bits, ok, iters = call(flat)

    if P > 1:
        bits = bits[:nb].reshape(nb, nco, W)[:, :, : P * Z]
        bits = (
            bits.reshape(nb, nco, P, Z).swapaxes(1, 2).reshape(nb * P, nco * Z)
        )[:batch]
        # per-lane flags are uniform within a segment: read lane k*Z
        ok = ok[:nb, : P * Z].reshape(nb, P, Z)[:, :, 0].reshape(nb * P)[:batch]
        iters = (
            iters[:nb, : P * Z].reshape(nb, P, Z)[:, :, 0].reshape(nb * P)
        )[:batch]
    else:
        bits = bits[:batch].reshape(batch, nco, W)[:, :, :Z].reshape(batch, nco * Z)
        ok = ok[:batch, 0]
        iters = iters[:batch, 0]
    bits = bits.reshape(batch_shape + (nco * Z,))
    ok = ok.astype(bool).reshape(batch_shape)
    iters = iters.reshape(batch_shape)
    return DecodeResult(bits=bits, parity_ok=ok, iterations=iters)
