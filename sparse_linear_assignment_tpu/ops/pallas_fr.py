"""Pallas TPU kernel: multi-round fused forward-reverse auction.

The XLA forward-reverse round (``ops/fr_dense.py``) costs ~15 HBM
traversals of the ``[M, N]`` value matrix per round; at 512×256×256
that is ~2.7 ms/round, and the round count (not the kernel) stops being
the bottleneck.  This kernel runs **R rounds per grid step** with the
whole instance resident in VMEM (256×256 f32 = 256 KB ≪ VMEM): HBM
reads the values once per R rounds instead of ~15 times per round, and
each round is pure VPU work on VMEM data.

Two structural choices target the measured per-round cost (the round-2
budget-sweep probe showed ~1.0–1.2 µs marginal per instance-round
against a 0.22 µs elementwise model — the gap is cross-lane/sublane
*reduction latency*, docs/PERFORMANCE.md "Batched round structure"):

- **One generic sub-round for both modes.**  Bertsekas' reverse
  auction *is* the forward auction on the transposed matrix with the
  dual roles swapped (prices ↔ profits, p2o ↔ o2p).  The kernel keeps
  ``vals`` and ``valsᵀ`` both resident and runs a single straight-line
  sub-round on mode-selected operands instead of branching between two
  ``lax.cond`` bodies.  Straight-line rounds let Mosaic's scheduler
  overlap independent work — which is what makes the next item pay.
- **Instance interleaving (``group``)**: G instances share one grid
  step; their rounds are data-independent, so G reduction chains
  interleave and the serial reduction latency is hidden behind other
  instances' vector work.  A finished instance's updates are masked
  (bit-exact with running it alone); the whole group exits early once
  every member is done.

Grid = one step per instance group.  All per-instance state rides in
tile-aligned arrays (flat stacked planes, same scheme as
``ops/pallas_dense.py``):

- ``vals2    [B*M, N] f32`` — sign-adjusted value matrix (read-only)
- ``vals_t2  [B*N, M] f32`` — its transpose (read-only; M == N)
- ``prices2  [B*M, 1] f32``
- ``o2p2     [B*M, 1] i32``
- ``p2o_pad2 [B*8, N] i32`` — row 0: p2o; row 1 packs the per-instance
  scalars (lane 0 = nits, lane 1 = forward_mode, lane 2 = done)
- ``pi_pad2  [B*8, N] f32`` — row 0: person profits π; row 1 lane 0 = ε

Packing the scalars into padding rows avoids scalar-prefetch plumbing
and keeps every ref 2-D and tile-aligned (Mosaic requirements — see
docs/PERFORMANCE.md item 5).

Semantics are exactly ``fr_dense.fr_round`` with ``skip_certificate=
True`` (the no-ladder mode: start ε == target ε, full assignment is the
certificate): forward/reverse sub-round selected by the mode flag,
mode flips on matching-cardinality increase, exact (π, p) dual
bookkeeping.  Equivalence is pinned by tests against the XLA rounds in
interpret mode (including ``group > 1``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solution import UNASSIGNED
from ..utils.trace import trace_kernel_round
from .fr_dense import INT_SENTINEL, STALL_K0, FRState

# numpy scalars: jnp constants cannot be captured by kernels on this
# backend
_INT_MAX = np.int32(UNASSIGNED)
_STALL_K0 = np.int32(STALL_K0)


def _t(x):
    """Vector transpose [S, 1] <-> [1, S] (square instances only)."""
    return jnp.swapaxes(x, 0, 1)


def _top2_rows(key, sent, tail=8):
    """Fused top-2 over axis 0 by pairwise halving: ONE depth-log2(M/8)
    dependency chain + a narrow one-vreg tail, returning
    (best_key, second_key) ``[1, N]``.

    Replaces the serial best-tree -> sel-mask -> second-tree pair (two
    dependent reductions, ~16 serial shuffle stages) with a single tree
    whose stages carry (best, second) pairs: for two halves,
    ``best = max(b1, b2)`` and ``second = max(min(b1, b2), s1, s2)``
    (the classic top-2 merge).  Positions are distinct because packed
    keys are unique per position, so ``second_key``'s value field is
    exactly the max over non-argmax positions — bit-identical to the
    masked second tree.  Requires M to be a power of two (the hot 256²
    path; callers fall back otherwise).

    Halving STOPS at ``tail`` = 8 sublanes (one vreg row): sub-vreg
    strided slices (sublane offset not a multiple of 8) pass interpret
    mode but abort Mosaic's apply-vector-layout pass on hardware
    (``Array::Slice`` limit check — measured 2026-08-18, hw battery
    smoke).  The [tail, N] remainder finishes with narrow masked trees;
    key uniqueness makes the value-equality mask select exactly the
    argmax slot, so the result is bit-identical to halving all the way
    down."""
    m = key.shape[0]
    b = key
    s = None
    while m > tail:
        m //= 2
        b1, b2 = b[:m], b[m:]
        lo = jnp.minimum(b1, b2)
        if s is None:
            s = lo
        else:
            s = jnp.maximum(lo, jnp.maximum(s[:m], s[m:]))
        b = jnp.maximum(b1, b2)
    best = jnp.max(b, axis=0, keepdims=True)
    # each slot of b is the max key of a disjoint subtree and keys are
    # globally unique, so exactly one slot equals best per column
    second = jnp.max(jnp.where(b == best, sent, b), axis=0,
                     keepdims=True)
    if s is not None:
        second = jnp.maximum(second, jnp.max(s, axis=0, keepdims=True))
    return best, second


def _top2_rows_f32(profit, j_iota, neg_inf, tail=8):
    """Float-path analogue of ``_top2_rows``: one pairwise-halving tree
    over axis 0 carrying (best, argbest, second), replacing THREE serial
    reductions (best max-tree -> is_best mask -> argbest min-tree ->
    masked second max-tree).  Tie rule preserved exactly: on equal
    maxima the lower half wins, so the carried index is always the
    smallest row index achieving the max (induction over stages — each
    half's carry already holds its smallest argmax).  ``second`` is the
    max over non-argbest *positions*, identical to the masked tree:
    on a tie the other best position's value lands in ``second`` via
    ``min(b1, b2)``.  Requires a power-of-two row count.

    As in ``_top2_rows``, halving stops at the 8-sublane (one-vreg)
    tail — sub-vreg strided slices abort Mosaic's layout pass on
    hardware — and finishes with the same narrow masked trees
    ``_top2_lanes`` uses at its 128-lane boundary: argbest = smallest
    carried index among tied slots; second = max of (non-selected
    slots' bests, the selected slot's carried second), which covers
    exactly all positions except the global argbest."""
    m = profit.shape[0]
    ncols = profit.shape[1]
    b, bj = profit, j_iota
    s = None
    first = True
    while m > tail:
        m //= 2
        b1, b2 = b[:m], b[m:]
        if first:
            # NEVER slice the raw iota: broadcasted_iota lowers to a
            # lane-replicated vreg layout and Mosaic's
            # vector_extract_strided_slice_rule aborts on replicated
            # operands (hw smoke, 2026-08-18).  The first stage's index
            # halves are fresh iotas (j_iota must be the raw axis-0
            # iota — both call sites pass exactly that); later stages'
            # carried indices come out of a `where` and are
            # materialized, so slicing them is fine.
            j1 = lax.broadcasted_iota(jnp.int32, (m, ncols), 0)
            j2 = j1 + jnp.int32(m)
            first = False
        else:
            j1, j2 = bj[:m], bj[m:]
        lo = jnp.minimum(b1, b2)
        if s is None:
            s = lo
        else:
            s = jnp.maximum(lo, jnp.maximum(s[:m], s[m:]))
        # on value ties the SMALLEST carried index must win — "lower
        # half first" is not enough (carried indices interleave in
        # stride order, e.g. slot i may carry row i+128 while slot
        # i+half carries row i+64), so compare indices explicitly
        take1 = (b1 > b2) | ((b1 == b2) & (j1 <= j2))
        b = jnp.where(take1, b1, b2)
        bj = jnp.where(take1, j1, j2)
    best = jnp.max(b, axis=0, keepdims=True)
    is_best = b == best
    arg = jnp.min(
        jnp.where(is_best, bj, jnp.int32(UNASSIGNED)),
        axis=0, keepdims=True,
    )
    if s is None:
        s = jnp.full_like(b, neg_inf)
    sel = is_best & (bj == arg)
    second = jnp.max(jnp.where(sel, s, b), axis=0, keepdims=True)
    return best, arg, second


def _top2_lanes(x, u_iota, neg_inf, want_second=True, tail=128):
    """Fused (best, argbest[, second]) over axis 1 by pairwise halving
    of 128-lane-aligned slices, with a narrow 3-tree tail on the last
    tile — replaces 2–3 serial FULL-width lane reductions with
    log2(N/128) wide stages + narrow trees.  Lane slices stay 128-tile
    aligned (sub-tile lane slicing does not lower on Mosaic).  Tie rule
    preserved exactly: each slot carries the smallest column index
    achieving its max (explicit index compare on value ties), and the
    tail takes the min index among tied slots; ``second`` is the max
    over non-argbest positions (a non-winning tied slot's best lands in
    it, and the winning slot contributes its own carried second).
    Halving stops when the width is no longer an even multiple of
    ``tail`` (e.g. N = 384): the tail trees then run at that width —
    still correct, just fewer fused stages."""
    w = x.shape[1]
    rows = x.shape[0]
    b, bj = x, u_iota
    s = None
    first = True
    while w > tail and w % (2 * tail) == 0:
        w //= 2
        b1, b2 = b[:, :w], b[:, w:]
        if first:
            # as in _top2_rows_f32: the raw axis-1 iota has a
            # sublane-replicated vreg layout that Mosaic cannot slice —
            # generate the first stage's index halves fresh (u_iota
            # must be the raw axis-1 iota; all call sites pass that)
            j1 = lax.broadcasted_iota(jnp.int32, (rows, w), 1)
            j2 = j1 + jnp.int32(w)
            first = False
        else:
            j1, j2 = bj[:, :w], bj[:, w:]
        if want_second:
            lo = jnp.minimum(b1, b2)
            if s is None:
                s = lo
            else:
                s = jnp.maximum(lo, jnp.maximum(s[:, :w], s[:, w:]))
        take1 = (b1 > b2) | ((b1 == b2) & (j1 <= j2))
        b = jnp.where(take1, b1, b2)
        bj = jnp.where(take1, j1, j2)
    best = jnp.max(b, axis=1, keepdims=True)
    is_best = b == best
    arg = jnp.min(
        jnp.where(is_best, bj, jnp.int32(UNASSIGNED)),
        axis=1, keepdims=True,
    )
    if not want_second:
        return best, arg, None
    if s is None:
        s = jnp.full_like(b, neg_inf)
    sel = is_best & (bj == arg)
    second = jnp.max(jnp.where(sel, s, b), axis=1, keepdims=True)
    return best, arg, second


def _generic_sub(A, rowp, colpi, colp2o, rowo2p, eps, fused_top2=False):
    """One bidding sub-round on ``A [S, S]``: columns are the bidding
    side (persons in forward mode, objects in reverse mode), rows are
    the priced side.  With transposed operands this is *exactly* the
    reverse sub-round — the reverse auction is the forward auction of
    the transposed problem (see module docstring); mirrors
    fr_dense._forward_sub / _reverse_sub (increment-form bids + coded
    won/displaced reduction — one fewer [S, S] masked-max traversal and
    one fewer [S, S] reduction per round than the naive forms).

    Returns the updated (rowp, colpi, colp2o, rowo2p) plus the
    cardinality delta of the round as one fused f32 scalar reduction
    (#newly-matched − #displaced; the two indicator vectors are
    disjoint), so the caller carries cardinality instead of recounting
    the matching every round.

    **Integer-auction fast path** (int32 ``A``, integer ``eps`` — the
    whole solve runs on the scaled-integer lattice, see
    ``batch.solve_batch(integer=...)``): selection pairs fuse into
    single reductions via exact packed keys ``(value << SH) | (MASK −
    index)`` — one max tree returns both the max value and its
    smallest-index argmax (the same tie rule as the float path's
    masked-iota min).  f32 packing was measured and rejected in round 2
    (truncating 8 mantissa bits broke the integer-cost exactness
    contract); on the int32 lattice the packing is exact, and the
    measured round cost drops 0.765 → 0.665 µs/instance-round at 256²
    (6 reduction trees → 4; experiments/exp_int_round.py).
    """
    m, n = A.shape
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    integer = jnp.issubdtype(A.dtype, jnp.integer)

    profit = A - rowp
    if integer:
        # int32 packed keys: SH index bits in the low word; the shift
        # preserves order (keys differ by >= 2^SH when values differ)
        # and an arithmetic >> SH recovers the value exactly (the low
        # bits are nonnegative)
        sh = (n - 1).bit_length()
        mask = np.int32((1 << sh) - 1)
        sent = np.int32(INT_SENTINEL)
        neg_inf = sent
        key = (profit << sh) | (mask - j_iota)
        if fused_top2:
            bestk, secondk = _top2_rows(key, sent)            # [1, N] x2
        else:
            bestk = jnp.max(key, axis=0, keepdims=True)       # [1, N]
        best = bestk >> sh
        best_j = mask - (bestk & mask)
        sel = j_iota == best_j
    else:
        # dtype-typed scalar: a python-float -inf captured across traced
        # jaxprs becomes an f64 binder, which Mosaic cannot lower
        neg_inf = A.dtype.type(-np.inf)
        if fused_top2:
            best, best_j, second_f = _top2_rows_f32(
                profit, j_iota, neg_inf
            )                                                 # [1, N] x3
        else:
            best = jnp.max(profit, axis=0, keepdims=True)     # [1, N]
            is_best = profit == best
            best_j = jnp.min(
                jnp.where(is_best, j_iota, jnp.int32(m)),
                axis=0, keepdims=True,
            )
        sel = j_iota == best_j
    if integer and fused_top2:
        # the fused tree's second key: value field = max profit over
        # non-argmax positions (identical to the masked tree; keys are
        # unique per position).  has_second must test the raw key —
        # sent >> sh is not sent.
        has_second = secondk != neg_inf
        second = secondk >> sh
    elif fused_top2:
        second = second_f
        has_second = second != neg_inf
    else:
        second = jnp.max(
            jnp.where(sel, neg_inf, profit), axis=0, keepdims=True
        )
        has_second = second != neg_inf
    floor = jnp.where(has_second, second, best)
    raw_inc = best - floor + eps

    unassigned = colp2o == _INT_MAX
    bidding = unassigned & (best != neg_inf)
    is_here = sel & bidding
    if integer:
        key2 = jnp.where(is_here, (raw_inc << sh) | (mask - u_iota), sent)
        k2 = jnp.max(key2, axis=1, keepdims=True)             # [M, 1]
        has_winner = k2 != sent
        max_inc = k2 >> sh
        winner = mask - (k2 & mask)
    else:
        inc = jnp.where(bidding, raw_inc, neg_inf)
        eff = jnp.where(is_here, inc, neg_inf)
        if fused_top2:
            # one lane-halving chain for (max_inc, winner) instead of
            # two serial full-width lane trees.  Tie rule identical
            # (smallest index among maxima); when a row has no bid the
            # winner value differs from the serial path's _INT_MAX but
            # is never read (every consumer is gated on has_winner or
            # is_here).
            max_inc, winner, _ = _top2_lanes(
                eff, u_iota, neg_inf, want_second=False
            )                                                 # [M, 1] x2
        else:
            max_inc = jnp.max(eff, axis=1, keepdims=True)     # [M, 1]
            cand = jnp.where(
                is_here & (eff >= max_inc), u_iota, _INT_MAX
            )
            winner = jnp.min(cand, axis=1, keepdims=True)     # [M, 1]
        has_winner = max_inc != neg_inf

    rowp_new = jnp.where(has_winner, rowp + max_inc, rowp)
    rowo2p_new = jnp.where(has_winner, winner, rowo2p)

    # won (bit 0) and displaced (bit 1) in one coded reduction; the two
    # indicators are disjoint per column (won => was unassigned,
    # displaced => was assigned), so the int path can use a MAX tree
    # (identical latency measured; avoids the astype traffic and the
    # in-kernel i64 widening of integer sums)
    t_won = is_here & (winner == u_iota)
    t_disp = (colp2o == j_iota) & has_winner
    if integer:
        code = jnp.max(
            jnp.where(t_won, jnp.int32(1), jnp.int32(0))
            + jnp.where(t_disp, jnp.int32(2), jnp.int32(0)),
            axis=0, keepdims=True,
        )                                                     # [1, N]
        won = code == jnp.int32(1)
        displaced = (colp2o != _INT_MAX) & (code == jnp.int32(2))
    else:
        code = jnp.sum(
            t_won.astype(jnp.float32)
            + jnp.float32(2.0) * t_disp.astype(jnp.float32),
            axis=0, keepdims=True,
        )                                                     # [1, N]
        won = (code == jnp.float32(1.0)) | (code == jnp.float32(3.0))
        displaced = (colp2o != _INT_MAX) & (code >= jnp.float32(2.0))
    colp2o_new = jnp.where(won, best_j, jnp.where(displaced, _INT_MAX, colp2o))
    colpi_new = jnp.where(won, floor - eps, colpi)
    # won/displaced are disjoint (won columns were unassigned), so one
    # signed sum gives the matching-cardinality delta exactly
    delta = jnp.sum(
        won.astype(jnp.float32) - displaced.astype(jnp.float32)
    )
    return rowp_new, colpi_new, colp2o_new, rowo2p_new, delta


def _fr_kernel(
    vals_ref,       # [G*M, N] VMEM
    vals_t_ref,     # [G*N, M] VMEM (transpose; M == N)
    prices_ref,     # [G*M, 1]
    p2o_pad_ref,    # [G*8, N] i32 (row 0 p2o; row 1 = nits/mode/done)
    o2p_ref,        # [G*M, 1]
    pi_pad_ref,     # [G*8, N] f32 (row 0 pi; row 1 lane 0 = eps)
    prices_out,
    p2o_pad_out,
    o2p_out,
    pi_pad_out,
    *,
    rounds: int,
    group: int,
    serial: int = 1,
    unroll: int = 1,
    fused_top2: bool = False,
):
    m = vals_ref.shape[0] // (group * serial)
    n = vals_ref.shape[1]
    n_f32 = np.float32(n)

    PER = 10  # carried fields per instance

    # ``serial`` sequential sub-batches per grid step, each its own
    # early-exit while loop over ``group`` interleaved instances: a
    # sub-batch's instances run to completion before the next starts,
    # so (unlike ``group``, which is lockstep and measured to only add
    # waste) serial packing has no straggler coupling — it exists to
    # amortize the ~12 µs per-grid-step Mosaic entry cost over several
    # instances (docs/PERFORMANCE.md e2e decomposition).
    for s in range(serial):
        _fr_one_block(
            vals_ref, vals_t_ref, prices_ref, p2o_pad_ref, o2p_ref,
            pi_pad_ref, prices_out, p2o_pad_out, o2p_out, pi_pad_out,
            base=s * group, m=m, n=n, n_f32=n_f32, rounds=rounds,
            group=group, unroll=unroll, PER=PER, fused_top2=fused_top2,
        )


def _fr_one_block(
    vals_ref, vals_t_ref, prices_ref, p2o_pad_ref, o2p_ref, pi_pad_ref,
    prices_out, p2o_pad_out, o2p_out, pi_pad_out,
    *, base, m, n, n_f32, rounds, group, unroll, PER, fused_top2,
):
    """One early-exit while loop over the ``group`` instances at slice
    offsets ``base .. base + group`` of this grid step's refs."""
    # per-instance initial state.  The planes arrive PRE-ORIENTED: the
    # chunk wrapper swaps (prices, pi) and (p2o, o2p) per instance with
    # batched XLA wheres (M == N, same-shape planes), so the column
    # plane always holds the priced side and the row plane the bidding
    # side — no per-instance lax.cond + 4 Mosaic transposes at entry
    # and exit (part of the measured ~10 µs/instance entry cost).
    insts = []
    for gg in range(group):
        g = base + gg
        vals = vals_ref[g * m:(g + 1) * m, :]
        vals_t = vals_t_ref[g * n:(g + 1) * n, :]
        rowp = prices_ref[g * m:(g + 1) * m, :]
        rowo2p = o2p_ref[g * m:(g + 1) * m, :]
        colp2o = p2o_pad_ref[g * 8:g * 8 + 1, :]
        colpi = pi_pad_ref[g * 8:g * 8 + 1, :]
        eps = pi_pad_ref[g * 8 + 1, 0]
        nits0 = p2o_pad_ref[g * 8 + 1, 0]
        mode0 = p2o_pad_ref[g * 8 + 1, 1] != 0
        done0 = p2o_pad_ref[g * 8 + 1, 2] != 0
        since0 = p2o_pad_ref[g * 8 + 1, 3]
        stall_k0 = p2o_pad_ref[g * 8 + 1, 4]
        # matching cardinality rides in lane 5 (computed batch-wide in
        # one XLA reduce by the chunk wrapper) — saves a serial [1, N]
        # reduction tree per instance entry; cardinality is orientation
        # invariant (|matching| is the same from either side)
        card0 = p2o_pad_ref[g * 8 + 1, 5].astype(jnp.float32)
        insts.append((vals, vals_t, eps))
        if gg == 0:
            carry = ()
        carry = carry + (
            rowp, colpi, colp2o, rowo2p,
            mode0, done0, nits0, since0, stall_k0, card0,
        )

    def one_round(state, g):
        (rowp, colpi, colp2o, rowo2p,
         mode, done, nits, since, stall_k, card) = state
        vals, vals_t, eps = insts[g]
        # straight-line mode select (no control flow): the reverse
        # sub-round is the forward sub-round of the transposed
        # problem, so one generic sub-round serves both
        A = jnp.where(mode, vals, vals_t)
        rowp2, colpi2, colp2o2, rowo2p2, delta = _generic_sub(
            A, rowp, colpi, colp2o, rowo2p, eps,
            fused_top2=fused_top2,
        )
        # freeze finished instances (bit-exact with exiting early)
        rowp2 = jnp.where(done, rowp, rowp2)
        colpi2 = jnp.where(done, colpi, colpi2)
        colp2o2 = jnp.where(done, colp2o, colp2o2)
        rowo2p2 = jnp.where(done, rowo2p, rowo2p2)
        delta = jnp.where(done, jnp.float32(0.0), delta)

        card2 = card + delta
        increased = delta > jnp.float32(0.0)
        # stalled-phase preemption with doubling horizon (fr_dense)
        stall_flip = ~increased & (since + 1 >= stall_k) & ~done
        flip = (increased | stall_flip) & ~done
        mode2 = mode ^ flip
        since2 = jnp.where(
            done, since,
            jnp.where(increased | stall_flip, jnp.int32(0), since + 1),
        )
        stall_k2 = jnp.where(
            done, stall_k,
            jnp.where(
                increased,
                jnp.int32(_STALL_K0),
                jnp.where(stall_flip, stall_k * 2, stall_k),
            ),
        )
        nits2 = nits + (~done).astype(jnp.int32)
        done2 = done | (card2 == n_f32)
        # in-kernel round trace (zero ops when SLAP_TPU_DEBUG unset):
        # the hot-loop visibility the reference has at ksparse.rs:189-190
        # (all args int32: Mosaic's debug_print placeholders only
        # lower 32-bit integers)
        trace_kernel_round(
            "fr kernel g=%d round: nits={} mode={} card={} done={}" % g,
            nits2, mode2.astype(jnp.int32), card2.astype(jnp.int32),
            done2.astype(jnp.int32),
        )
        # orientation follows the mode: swap the dual roles on flip
        rowp2, colpi2, colp2o2, rowo2p2 = lax.cond(
            flip,
            lambda p, q, a, b: (_t(q), _t(p), _t(b), _t(a)),
            lambda p, q, a, b: (p, q, a, b),
            rowp2, colpi2, colp2o2, rowo2p2,
        )
        return (
            rowp2, colpi2, colp2o2, rowo2p2,
            mode2, done2, nits2, since2, stall_k2, card2,
        )

    def body(full):
        # ``unroll`` successive rounds per loop iteration: the
        # early-exit condition is checked once per chunk, shaving the
        # per-round while-loop/branch overhead; done instances' rounds
        # are frozen (state-identical), so this is bit-exact whenever
        # unroll divides the budget (the caller guarantees it)
        i = full[0]
        out = (i + jnp.int32(unroll),)
        for g in range(group):
            state = full[1 + g * PER:1 + (g + 1) * PER]
            for _ in range(unroll):
                state = one_round(state, g)
            out = out + tuple(state)
        return out

    def keep_going(full):
        i = full[0]
        done_all = full[1 + 5]  # instance 0 'done'
        for g in range(1, group):
            done_all = done_all & full[1 + g * PER + 5]
        return (i < jnp.int32(rounds)) & ~done_all

    # EARLY EXIT: a while_loop (not fori) so a finished group leaves
    # its grid step immediately instead of spinning no-op rounds for
    # the rest of the budget.  int32 induction/bounds: python-int or
    # i64 loop carries cannot be lowered by Mosaic under jax_enable_x64.
    final = lax.while_loop(keep_going, body, (jnp.int32(0),) + carry)

    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    for gg in range(group):
        (rowp, colpi, colp2o, rowo2p,
         mode, done, nits, since, stall_k, _card) = final[
            1 + gg * PER:1 + (gg + 1) * PER
        ]
        eps = insts[gg][2]
        g = base + gg
        # written ORIENTED; the chunk wrapper de-orients with batched
        # XLA wheres using the mode flag in the meta row
        prices_out[g * m:(g + 1) * m, :] = rowp
        o2p_out[g * m:(g + 1) * m, :] = rowo2p
        meta = jnp.where(
            lane == 0,
            nits,
            jnp.where(
                lane == 1,
                mode.astype(jnp.int32),
                jnp.where(
                    lane == 2,
                    done.astype(jnp.int32),
                    jnp.where(
                        lane == 3, since,
                        jnp.where(
                            lane == 4, stall_k,
                            _card.astype(jnp.int32),
                        ),
                    ),
                ),
            ),
        )
        # pad rows 2..7 are never read back (the chunk wrapper reads
        # rows 0 and 1 only, and rebuilds the pads from FRState each
        # call) — leaving them unwritten drops 4 [6, N] stores per
        # instance epilogue
        p2o_pad_out[g * 8:g * 8 + 1, :] = colp2o
        p2o_pad_out[g * 8 + 1:g * 8 + 2, :] = meta
        pi_pad_out[g * 8:g * 8 + 1, :] = colpi
        pi_pad_out[g * 8 + 1:g * 8 + 2, :] = jnp.full((1, n), eps,
                                                      colpi.dtype)


def _resolve_fused_top2(fused_top2: int, m: int, n: int) -> int:
    """Resolve the fused-top-2 flag: -1 = auto (on for square
    power-of-two instances — the pairwise-halving trees need a
    power-of-two row count in both orientations, and m == n on this
    kernel's path — unless the SLAP_TPU_NO_FUSED_TOP2=1 runtime kill
    switch is set, kept in case a backend/toolchain change stops
    lowering the halving slices).  Int mode fuses best+second (2 serial
    trees -> 1), float mode best+argbest+second (3 -> 1).  An explicit
    1 on an ineligible shape raises: the halving loop floor-divides odd
    row counts and would silently drop rows."""
    eligible = m >= 2 and (m & (m - 1)) == 0 and m == n
    if fused_top2 == -1:
        import os

        if os.environ.get("SLAP_TPU_NO_FUSED_TOP2"):
            return 0
        return int(eligible)
    if fused_top2 and not eligible:
        raise ValueError(
            f"fused_top2 requires square power-of-two instances, got "
            f"{m}x{n}"
        )
    return fused_top2


def fr_rounds_pallas_flat(
    vals2, vals_t2, prices2, p2o_pad2, o2p2, pi_pad2, b, m, n,
    rounds: int, interpret: bool = False, group: int = 1,
    serial: int = 1, fused_top2: int = -1,
):
    """Run ``rounds`` forward-reverse rounds on every instance; flat
    stacked layouts as in the module docstring.  ``group`` instances
    share each grid step lockstep-interleaved, and ``serial``
    sub-batches of them run sequentially per step (group * serial must
    divide ``b``); see ``pick_group``/``pick_serial`` for the measured
    defaults."""
    dtype = vals2.dtype
    per_step = group * serial
    if b % per_step:
        raise ValueError(
            f"group*serial {per_step} must divide batch {b}"
        )
    steps = b // per_step
    real_group = group
    group = per_step  # block factor for the specs below
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((group * m, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * n, m), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((group * m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group * 8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    # chunk-unrolled early exit: exact whenever unroll divides rounds
    # (measured: the per-round while/branch overhead is ~0.2 us of the
    # 0.95 us marginal round cost)
    unroll = 4 if rounds % 4 == 0 and rounds >= 8 else 1
    fused_top2 = _resolve_fused_top2(fused_top2, m, n)
    return pl.pallas_call(
        functools.partial(
            _fr_kernel, rounds=rounds, group=real_group, serial=serial,
            unroll=unroll, fused_top2=bool(fused_top2),
        ),
        grid_spec=grid_spec,
        # the 16 MB scoped-VMEM cap is a compiler default, not the
        # hardware limit (v5e has 128 MB); raising it covers instances
        # past 896² and the interleaved groups
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * m, 1), dtype),
            jax.ShapeDtypeStruct((b * 8, n), jnp.int32),
            jax.ShapeDtypeStruct((b * m, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * 8, n), dtype),
        ),
        interpret=interpret,
    )(vals2, vals_t2, prices2, p2o_pad2, o2p2, pi_pad2)


def pick_group(b: int, m: int, n: int) -> int:
    """Interleave factor for the batch driver.

    Measured on the real TPU (512×256², budget 320, best-of-5):
    group=1 102 ms, group=2 118 ms, group=4 136 ms, group=8 150 ms —
    the slowdown tracks the group-lockstep waste factor exactly, i.e.
    Mosaic's in-order schedule does NOT interleave the independent
    per-instance reduction chains, so grouping only adds waste.  The
    default is therefore 1; the parameter remains for experiments and
    as the lever if the backend scheduler improves."""
    del b, m, n
    return 1


def pick_serial(b: int, m: int, n: int) -> int:
    """Sequential instances per grid step for the batch driver.

    Unlike ``group`` (lockstep interleave, measured to only add waste),
    serial packing runs each instance's while loop to completion before
    the next starts — no straggler coupling — built to amortize the
    measured ~12 µs per-grid-step entry cost (docs/PERFORMANCE.md e2e
    decomposition).  Kept at 1: measured on the real TPU
    (experiments/exp_serial_step.py, B=4096×256² int mode), serial ∈
    {1, 2, 4} is flat — all-done entry 10.30 / 10.47 / 10.42 µs per
    instance, main-kernel best 525 / 524 / 523 ms — i.e. the "entry"
    cost scales with instances ENTERED (the per-instance state
    setup/orient + epilogue writes), not with grid steps, so packing
    more instances per step saves nothing.  The parameter remains for
    experiments."""
    del b, m, n
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("rounds", "interpret", "group", "serial",
                     "fused_top2"),
)
def fr_chunk_pallas(
    values_t, states: FRState, rounds: int, interpret: bool = False,
    group: int = 0, serial: int = 0, fused_top2: int = -1,
):
    """``rounds`` fused rounds over a batched FRState (packing to and
    from the kernel's flat layouts happens here, once per chunk).

    Only valid in the no-ladder mode (start ε == target ε): the kernel
    performs no ε-scaling bookkeeping.  ``eps``/``nreductions`` pass
    through; ``optimal_found`` mirrors ``done`` (in this mode a full
    assignment is ε-optimal by construction).  ``group = 0`` /
    ``serial = 0`` pick the measured defaults automatically."""
    b, m, n = values_t.shape
    if group == 0:
        group = pick_group(b, m, n)
    if serial == 0:
        serial = pick_serial(b, m, n)
        while serial > 1 and b % (group * serial):
            serial //= 2
    dtype = values_t.dtype
    vals2 = values_t.reshape(b * m, n)
    vals_t2 = jnp.swapaxes(values_t, 1, 2).reshape(b * n, m)
    # PRE-ORIENT per instance with batched wheres (M == N, same-shape
    # planes): the column plane carries the priced side (rowp/rowo2p),
    # the row plane the bidding side (colpi/colp2o).  This removes the
    # per-instance lax.cond + 4 Mosaic vector transposes at kernel
    # entry AND exit (part of the measured ~10 µs/instance entry cost);
    # these wheres are one fused XLA pass over the batch.
    fwd = states.forward_mode[:, None]
    rowp = jnp.where(fwd, states.prices, states.profits)
    colpi = jnp.where(fwd, states.profits, states.prices)
    colp2o = jnp.where(fwd, states.p2o, states.o2p)
    rowo2p = jnp.where(fwd, states.o2p, states.p2o)
    prices2 = rowp.reshape(b * m, 1)
    o2p2 = rowo2p.reshape(b * m, 1)
    p2o_pad = jnp.zeros((b, 8, n), jnp.int32)
    p2o_pad = p2o_pad.at[:, 0, :].set(colp2o)
    p2o_pad = p2o_pad.at[:, 1, 0].set(states.nits)
    p2o_pad = p2o_pad.at[:, 1, 1].set(states.forward_mode.astype(jnp.int32))
    p2o_pad = p2o_pad.at[:, 1, 2].set(states.done.astype(jnp.int32))
    p2o_pad = p2o_pad.at[:, 1, 3].set(states.since_inc)
    p2o_pad = p2o_pad.at[:, 1, 4].set(states.stall_k)
    # matching cardinality (lane 5): one batch-wide XLA reduce here
    # replaces a serial in-kernel [1, N] tree per instance entry
    p2o_pad = p2o_pad.at[:, 1, 5].set(
        jnp.sum(
            (states.p2o != UNASSIGNED).astype(jnp.int32), axis=1
        ).astype(jnp.int32)  # x64 promotes int32 sums to int64
    )
    pi_pad = jnp.zeros((b, 8, n), dtype)
    pi_pad = pi_pad.at[:, 0, :].set(colpi)
    pi_pad = pi_pad.at[:, 1, 0].set(states.eps)

    prices2, p2o_pad2, o2p2, pi_pad2 = fr_rounds_pallas_flat(
        vals2, vals_t2, prices2, p2o_pad.reshape(b * 8, n), o2p2,
        pi_pad.reshape(b * 8, n), b, m, n, rounds, interpret=interpret,
        group=group, serial=serial, fused_top2=fused_top2,
    )
    p2o_pad = p2o_pad2.reshape(b, 8, n)
    pi_pad = pi_pad2.reshape(b, 8, n)
    done = p2o_pad[:, 1, 2] != 0
    # DE-ORIENT with the exit-time mode (the kernel writes oriented
    # planes; the flip transposes inside the round loop keep the
    # layouts, only the roles swap)
    fwd2 = (p2o_pad[:, 1, 1] != 0)[:, None]
    rowp_out = prices2.reshape(b, m)
    colpi_out = pi_pad[:, 0, :]
    colp2o_out = p2o_pad[:, 0, :]
    rowo2p_out = o2p2.reshape(b, m)
    new_states = FRState(
        prices=jnp.where(fwd2, rowp_out, colpi_out),
        profits=jnp.where(fwd2, colpi_out, rowp_out),
        p2o=jnp.where(fwd2, colp2o_out, rowo2p_out),
        o2p=jnp.where(fwd2, rowo2p_out, colp2o_out),
        eps=states.eps,
        forward_mode=p2o_pad[:, 1, 1] != 0,
        since_inc=p2o_pad[:, 1, 3],
        stall_k=p2o_pad[:, 1, 4],
        nits=p2o_pad[:, 1, 0],
        nreductions=states.nreductions,
        optimal_found=states.optimal_found | done,
        done=done,
    )
    return new_states, jnp.all(done)
