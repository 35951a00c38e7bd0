"""Slot-list auction rounds — endgame cost independent of problem size.

The synchronous Jacobi round in ``ops/auction.py`` touches every person
and object each round.  Auction endgames, however, are displacement
chains: one or two active bidders walk the graph while everyone else is
settled, so per-round work must scale with the *active set*, not with N.

The key structural fact: **the active set is closed under the auction
dynamics**.  A round can only activate the previous owner of an object
that was just won — and that owner takes exactly the winner's place.  So
the active set is carried *in the loop state* as a fixed-size slot list:

- slot i holds an unassigned person id (or EMPTY = INT32_MAX),
- when slot i's person wins object v, the slot becomes v's previous
  owner (which is EMPTY precisely when v was free — the sentinel
  coincides),
- losers keep their slot; persons dropped by the price threshold leave.

No per-round compaction, no prefix sums, no O(N) scans: a round costs
O(K·P) gathers plus P-element scatters.  The number of occupied slots
never grows, so a host-driven driver re-packs the list into smaller
compiled levels as the auction drains, down to tiny chain-mode programs.

Conflict resolution uses P-element scatter-max on prices with a
deterministic smallest-person tie-break (same rule as the full Jacobi
round in ``ops/auction.py``); the reference semantics (choice rule
`ksparse.rs:199-214`, update rule `ksparse.rs:223-227`, drop rule
`ksparse.rs:218-220`) are unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..solution import UNASSIGNED
from ..utils.trace import trace_round
from .padded import PaddedProblem
from .prefix import compact_indices

_INT_MAX = np.int32(UNASSIGNED)  # np scalar: no backend init at import


class LState(NamedTuple):
    prices: jnp.ndarray  # [M]
    p2o: jnp.ndarray  # [N]
    o2p: jnp.ndarray  # [M]
    dropped: jnp.ndarray  # [N]
    slots: jnp.ndarray  # [P] active person ids, EMPTY = INT32_MAX
    nits: jnp.ndarray  # ()


def _top2_masked(cols, vals, mask, prices):
    """Masked-reduction top-2 profit over ``[K, W]`` arc slots
    (first-occurrence max, matching `ksparse.rs:206-213`)."""
    neg_inf = -jnp.inf
    profit = jnp.where(mask, vals - prices[cols], neg_inf)
    k = profit.shape[0]
    best = jnp.max(profit, axis=0)
    k_iota = lax.broadcasted_iota(jnp.int32, profit.shape, 0)
    best_k = jnp.min(
        jnp.where(profit == best[None, :], k_iota, jnp.int32(k)), axis=0
    )
    sel = k_iota == best_k[None, :]
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0)
    best_col = jnp.max(jnp.where(sel, cols, 0), axis=0)
    best_val = jnp.max(
        jnp.where(sel, vals, jnp.asarray(neg_inf, profit.dtype)), axis=0
    )
    return best, second, best_col, best_val


def _full_top2(problem: PaddedProblem, prices):
    """Per-person top-2 over ALL persons, using the degree-split layout
    when present: per-arc gathers cost ~8 ns/element on this backend, so
    scanning the first-8 block plus the small overflow block (~nnz
    elements) beats the rectangular ``[k_max, N]`` scan (2.2× fewer
    gathered elements on the n=1e5 headline).  Tie semantics match the
    rectangular scan exactly (base slots precede overflow slots)."""
    if problem.row_cols8 is None:
        return _top2_masked(
            problem.row_cols, problem.row_vals, problem.row_mask, prices
        )
    b_best, b_second, b_col, b_val = _top2_masked(
        problem.row_cols8, problem.row_vals8, problem.row_mask8, prices
    )
    o_best, o_second, o_col, o_val = _top2_masked(
        problem.ovf_cols, problem.ovf_vals, problem.ovf_mask, prices
    )
    ids = problem.ovf_person
    b1 = b_best[ids]
    s1 = b_second[ids]
    take_o = o_best > b1  # strict: base slots come first in row order
    best_m = jnp.where(take_o, o_best, b1)
    second_m = jnp.where(
        take_o, jnp.maximum(b1, o_second), jnp.maximum(s1, o_best)
    )
    col_m = jnp.where(take_o, o_col, b_col[ids])
    val_m = jnp.where(take_o, o_val, b_val[ids])
    return (
        b_best.at[ids].set(best_m),
        b_second.at[ids].set(second_m),
        b_col.at[ids].set(col_m),
        b_val.at[ids].set(val_m),
    )


def _full_round(problem: PaddedProblem, s: LState, eps, threshold):
    """One auction round over ALL unassigned persons (no slot list, no
    row gathers) — the cheap formulation while the active set is a large
    fraction of N.  Bit-identical state evolution to ``_slot_round``
    (same bids, same smallest-person tie-breaks); ``slots`` passes
    through stale and is rebuilt by ``repack_slots`` before switching to
    slot-list levels."""
    neg_inf = -jnp.inf
    n = s.p2o.shape[0]
    m = s.prices.shape[0]
    ids = lax.broadcasted_iota(jnp.int32, (n,), 0)
    active = (s.p2o == _INT_MAX) & ~s.dropped
    any_active = jnp.any(active)

    best, second, best_col, best_val = _full_top2(problem, s.prices)
    # algebraic price reconstruction (profit = value − price ⇒ price =
    # value − profit): saves an N-sized gather; differs from the stored
    # price by ≤1 ulp, which the drop-rule/eps semantics tolerate
    price_at_best = jnp.where(
        best != neg_inf, best_val - best, jnp.asarray(0.0, s.prices.dtype)
    )
    bidder0 = active & (best != neg_inf)
    drop_now = bidder0 & (price_at_best > threshold)
    bidder = bidder0 & ~drop_now
    has_second = second != neg_inf
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid = jnp.where(bidder, raw_bid, neg_inf)

    obj = jnp.where(bidder, best_col, 0)
    prices_new = s.prices.at[obj].max(bid.astype(s.prices.dtype))
    won_bid = bidder & (bid == prices_new[obj])
    cand = jnp.where(won_bid, ids, _INT_MAX)
    scat_obj = jnp.where(won_bid, obj, m)
    winner = jnp.full(m + 1, _INT_MAX).at[scat_obj].min(cand)[:m]
    has_w = winner != _INT_MAX

    # person-side updates by where-forms (gathers), not scatter pairs —
    # scatters serialize on this backend just like gathers, and the
    # where-form needs one gather instead of two scatters
    win = won_bid & (winner[obj] == ids)
    o2p_new = jnp.where(has_w, winner, s.o2p)
    assigned = s.p2o != _INT_MAX
    safe_cur = jnp.where(assigned, s.p2o, 0)
    displaced = assigned & has_w[safe_cur]
    p2o_new = jnp.where(win, obj, jnp.where(displaced, _INT_MAX, s.p2o))
    trace_round(
        "khosla full round {}: active={} dropped={}",
        s.nits, jnp.sum(active, dtype=jnp.int32),
        jnp.sum(drop_now, dtype=jnp.int32),
    )
    return LState(
        prices=prices_new,
        p2o=p2o_new,
        o2p=o2p_new,
        dropped=s.dropped | drop_now,
        slots=s.slots,
        nits=s.nits + any_active.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def khosla_full_chunk(problem: PaddedProblem, state: LState, eps,
                      threshold, chunk: int):
    """Run ``chunk`` full-scan rounds; returns (state, active count)."""
    dtype = problem.dtype
    eps = jnp.asarray(eps, dtype)
    threshold = jnp.asarray(threshold, dtype)

    def body(s, _):
        return _full_round(problem, s, eps, threshold), None

    state, _ = lax.scan(body, state, None, length=chunk)
    return state, jnp.sum(
        (state.p2o == _INT_MAX) & ~state.dropped, dtype=jnp.int32
    )


def _slot_round(problem: PaddedProblem, s: LState, eps, threshold):
    """One auction round over the occupied slots."""
    neg_inf = -jnp.inf
    n = s.p2o.shape[0]
    m = s.prices.shape[0]
    ids = s.slots
    occupied = ids != _INT_MAX
    any_active = jnp.any(occupied)
    safe_ids = jnp.where(occupied, ids, 0)

    # leading-axis row gathers (`x_t[ids]`): the fast, compile-friendly
    # gather on this backend (`x[:, ids]` is a compile bomb, see padded.py)
    rows_c = problem.row_cols_t[safe_ids].T  # [K, P]
    vals_c = problem.row_vals_t[safe_ids].T
    mask_c = problem.row_mask_t[safe_ids].T & occupied[None, :]

    # choice rule: top-2 profit by masked reductions (ksparse.rs:199-214)
    profit = jnp.where(mask_c, vals_c - s.prices[rows_c], neg_inf)
    k = profit.shape[0]
    best = jnp.max(profit, axis=0)
    k_iota = lax.broadcasted_iota(jnp.int32, profit.shape, 0)
    best_k = jnp.min(
        jnp.where(profit == best[None, :], k_iota, jnp.int32(k)), axis=0
    )
    sel = k_iota == best_k[None, :]
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0)
    best_col = jnp.max(jnp.where(sel, rows_c, 0), axis=0)
    best_val = jnp.max(
        jnp.where(sel, vals_c, jnp.asarray(neg_inf, profit.dtype)), axis=0
    )

    # algebraic price reconstruction, same formula as _full_round (keeps
    # the two rounds bit-identical); saves a P-sized gather
    price_at_best = jnp.where(
        best != neg_inf, best_val - best, jnp.asarray(0.0, s.prices.dtype)
    )  # [P]
    bidder0 = occupied & (best != neg_inf)
    # drop rule (ksparse.rs:218-220): finite termination for infeasible
    drop_now = bidder0 & (price_at_best > threshold)
    bidder = bidder0 & ~drop_now
    has_second = second != neg_inf
    # update rule (ksparse.rs:223-227)
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid = jnp.where(bidder, raw_bid, neg_inf)

    # conflict by scatter-max: winning bid becomes the price
    obj = jnp.where(bidder, best_col, 0)
    prices_new = s.prices.at[obj].max(bid.astype(s.prices.dtype))
    won_bid = bidder & (bid == prices_new[obj])
    # deterministic winner among equal bids: smallest person id
    cand = jnp.where(won_bid, ids, _INT_MAX)
    scat_obj = jnp.where(won_bid, obj, m)
    winner = jnp.full(m + 1, _INT_MAX).at[scat_obj].min(cand)[:m]
    has_w = winner != _INT_MAX

    win = won_bid & (winner[obj] == ids)
    prev = s.o2p[obj]  # previous owner of the object bid on (or EMPTY)

    o2p_new = jnp.where(has_w, winner, s.o2p)
    # winner's slot inherits the displaced owner; EMPTY when v was free
    slots_new = jnp.where(
        win, prev, jnp.where(drop_now, _INT_MAX, ids)
    )

    disp = win & (prev != _INT_MAX)
    p2o_ext = (
        jnp.concatenate([s.p2o, jnp.zeros(1, s.p2o.dtype)])
        .at[jnp.where(disp, prev, n)]
        .set(_INT_MAX)
        .at[jnp.where(win, safe_ids, n)]
        .set(jnp.where(win, obj, 0))
    )
    p2o_new = p2o_ext[:n]
    dropped_new = (
        jnp.concatenate([s.dropped, jnp.zeros(1, bool)])
        .at[jnp.where(drop_now, safe_ids, n)]
        .set(True)[:n]
    )
    trace_round(
        "khosla slot round {}: occupied={} dropped={}",
        s.nits, jnp.sum(occupied, dtype=jnp.int32),
        jnp.sum(drop_now, dtype=jnp.int32),
    )
    return LState(
        prices=prices_new,
        p2o=p2o_new,
        o2p=o2p_new,
        dropped=dropped_new,
        slots=slots_new,
        nits=s.nits + any_active.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def khosla_run_chunk(problem: PaddedProblem, state: LState, eps, threshold,
                     chunk: int):
    """Run ``chunk`` slot-list rounds; returns (state, occupied count)."""
    dtype = problem.dtype
    eps = jnp.asarray(eps, dtype)
    threshold = jnp.asarray(threshold, dtype)

    def body(s, _):
        return _slot_round(problem, s, eps, threshold), None

    state, _ = lax.scan(body, state, None, length=chunk)
    return state, jnp.sum(state.slots != _INT_MAX, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("p_new",))
def repack_slots(state: LState, p_new: int):
    """Re-pack the (sparse) slot list into ``p_new`` slots using the
    MXU-native compaction; occupied count must be ≤ ``p_new``."""
    mask = (state.p2o == UNASSIGNED) & ~state.dropped
    ids, count = compact_indices(mask, p_new)
    iota = lax.broadcasted_iota(jnp.int32, (p_new,), 0)
    slots = jnp.where(iota < count, ids, _INT_MAX)
    return state._replace(slots=slots)


def _levels_for(n: int, base: int = 8):
    """Slot-list sizes: powers of 8 from ``base`` up to n, largest first."""
    levels = []
    p = base
    while p < n:
        levels.append(p)
        p *= 8
    levels.append(n)
    return levels[::-1]


def khosla_solve_compact(
    problem: PaddedProblem,
    eps: float,
    price_threshold: float,
    init_state: Optional[LState] = None,
    chunk: int = 64,
    max_rounds: int = 10_000_000,
):
    """Host-driven Khosla solve over shrinking slot-list levels.

    Semantics identical to ``khosla_solve`` (same choice/update/drop
    rules, deterministic tie-breaks); the host only decides when to
    re-pack the slot list into a smaller compiled level, one small sync
    per ``chunk`` rounds.
    """
    n = problem.num_rows
    m = problem.num_cols
    dtype = problem.dtype
    np_dtype = np.dtype(dtype)
    eps = np_dtype.type(eps)
    price_threshold = np_dtype.type(price_threshold)

    levels = _levels_for(n)
    if init_state is None:
        state = LState(
            prices=jnp.zeros(m, dtype),
            p2o=jnp.full(n, _INT_MAX, jnp.int32),
            o2p=jnp.full(m, _INT_MAX, jnp.int32),
            dropped=jnp.zeros(n, bool),
            slots=jnp.arange(n, dtype=jnp.int32),  # everyone active
            nits=jnp.zeros((), jnp.int32),
        )
    else:
        state = init_state

    p = state.slots.shape[0]
    active = int(jnp.sum(state.slots != _INT_MAX))
    # full-scan phase: while most persons are active, rounds over all N
    # (no slot/row gathers, degree-split top-2) beat slot-list rounds
    full_cutoff = max(512, n // 8)
    cur_chunk = 0
    while active > full_cutoff and int(state.nits) < max_rounds:
        if cur_chunk == 0:
            cur_chunk = 8
        state, active_dev = khosla_full_chunk(
            problem, state, eps, price_threshold, cur_chunk
        )
        active = int(active_dev)
        cur_chunk = min(128, cur_chunk * 2)
    if active > 0:
        state = repack_slots(state, p)  # rebuild from the mask
    cur_chunk = 0
    while active > 0 and int(state.nits) < max_rounds:
        target_p = next(l for l in reversed(levels) if l >= active)
        if target_p < p:
            state = repack_slots(state, target_p)
            p = target_p
            cur_chunk = 0
        # large levels drain in a handful of rounds; small levels run
        # long chains — and every host sync costs ~240 ms of tunnel
        # latency, so chunks grow geometrically within a level
        if cur_chunk == 0:
            cur_chunk = 8 if p >= 4096 else chunk
        state, active_dev = khosla_run_chunk(
            problem, state, eps, price_threshold, cur_chunk
        )
        active = int(active_dev)
        cur_chunk = min(512, cur_chunk * 2)
    return state


def khosla_solve_scaled(
    problem: PaddedProblem,
    eps_target: float,
    w_min: float,
    w_max: float,
    reduction_factor: float = 0.125,
    start_eps: Optional[float] = None,
    chunk: int = 64,
    max_rounds: int = 10_000_000,
    start_prices=None,
    threshold_pad: float = 0.0,
):
    """ε-scaling ladder around the slot-list Khosla solve (extension).

    Starts at ``(w_max − w_min)/4`` and reduces ε geometrically to
    ``eps_target``, resetting assignments but keeping prices between
    phases (the forward solver's scaling pattern, `symmetric.rs:290-324`,
    applied to the Khosla engine).  The final phase runs at exactly
    ``eps_target`` with the reference's price threshold, so the result
    carries the same ε-optimality certificate as the unscaled solver
    while performing orders of magnitude fewer bids on large instances.

    Scaling is sound only for **symmetric** instances: the n·ε
    optimality bound needs every object covered by the matching, else
    warm prices left on unmatched objects from earlier phases suppress
    genuinely good assignments.  This is the same restriction the
    reference applies to the forward solver (`symmetric.rs:256-267`);
    asymmetric instances run a single phase at ``eps_target``.
    """
    n = problem.num_rows
    m = problem.num_cols
    dtype = np.dtype(problem.dtype)
    span = w_max - w_min
    if n != m:
        eps = eps_target
    else:
        eps = (
            start_eps if start_eps is not None
            else max(span / 4.0, eps_target)
        )

    ladder = []
    while eps > eps_target:
        ladder.append(eps)
        eps *= reduction_factor
    ladder.append(eps_target)

    state = None
    if start_prices is not None:
        # warm-started prices (the TPU equivalent of the reference's
        # price persistence across restarts, `symmetric.rs:290-324`,
        # exposed as a solve argument — SURVEY.md §5.4)
        state = LState(
            prices=jnp.asarray(np.asarray(start_prices, dtype=dtype)),
            p2o=jnp.full(n, _INT_MAX, jnp.int32),
            o2p=jnp.full(m, _INT_MAX, jnp.int32),
            dropped=jnp.zeros(n, bool),
            slots=jnp.arange(n, dtype=jnp.int32),
            nits=jnp.zeros((), jnp.int32),
        )
    total_rounds = 0
    for phase_i, phase_eps in enumerate(ladder):
        # The drop bound (m/2)(span+eps) is a COLD-start bound: on
        # feasible instances prices can legitimately converge anywhere
        # below a phase's threshold, which EXCEEDS the next (smaller-ε)
        # phase's threshold — re-bidding against those carried prices
        # would spuriously drop matchable persons (measured: wide-span
        # small instances, tests/test_warmstart.py ladder regression).
        # Shift each phase's bound by its start price level: phase 0
        # uses the caller's warm-price pad, later phases the carried
        # maximum (one scalar readback per phase, ~free next to the
        # phase's own done-check syncs).  Thresholds stay finite, so
        # infeasible-instance termination is unaffected.
        pad = threshold_pad if phase_i == 0 else max(
            0.0, float(jnp.max(state.prices))
        )
        threshold = (m / 2.0) * (span + phase_eps) + pad
        if phase_i > 0:
            # keep prices, reset assignments (fresh phase at lower eps)
            state = LState(
                prices=state.prices,
                p2o=jnp.full(n, _INT_MAX, jnp.int32),
                o2p=jnp.full(m, _INT_MAX, jnp.int32),
                dropped=jnp.zeros(n, bool),
                slots=jnp.arange(n, dtype=jnp.int32),
                nits=jnp.zeros((), jnp.int32),
            )
        state = khosla_solve_compact(
            problem, phase_eps, threshold, init_state=state, chunk=chunk,
            max_rounds=max_rounds,
        )
        total_rounds += int(state.nits)
    return state, total_rounds
