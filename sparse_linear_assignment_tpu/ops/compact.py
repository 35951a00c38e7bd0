"""Compacted sparse auction rounds — round cost scales with active bidders.

The synchronous Jacobi round in ``ops/auction.py`` touches every person
and every object each round.  That is right for the first few rounds
(massive parallelism: most persons get assigned), but auction endgames
are long displacement chains with a handful of active bidders — paying
O(N + Kc·M) of gather traffic per round for 10 bidders is how a TPU
loses to a sequential CPU.

This module's round costs O(K·P) where P is a static compaction size:

1. **Compact**: indices of the ≤P active persons via fixed-size nonzero.
2. **Bid**: gather just those persons' padded arc rows ``[K, P]``, top-2
   profit by masked reductions (same choice rule as the full round).
3. **Resolve by scatter**: ``prices.at[obj].max(bid)`` (P updates — far
   cheaper than the object-major gather when P ≪ M), then winner
   recovery with a min-scatter of person ids over bid-winning slots
   (deterministic smallest-person tie-break, matching the full round).
4. **Assign by scatter**: ≤P-element updates of p2o/o2p/dropped.

A host-driven driver (`khosla_solve_compact`) runs jitted chunks of
rounds, switching between compiled compaction levels as the active
count decays, with an optional ε-scaling ladder (an extension over the
reference: same final ε-optimality certificate as `ksparse.rs:153-251`
at eps = 1/num_cols, far fewer total bids on large instances).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..solution import UNASSIGNED
from .padded import PaddedProblem

_INT_MAX = jnp.int32(UNASSIGNED)


class CState(NamedTuple):
    prices: jnp.ndarray  # [M]
    p2o: jnp.ndarray  # [N]
    o2p: jnp.ndarray  # [M]
    dropped: jnp.ndarray  # [N]
    nits: jnp.ndarray  # ()


def _compact_round(
    s: CState, ids, rows_c, vals_c, arc_mask_c, eps, threshold
):
    """One auction round over a fixed compacted slot set.

    ``ids[P]`` are person ids chosen at chunk start; ``rows_c/vals_c/
    arc_mask_c [K, P]`` their pre-gathered padded arc rows.  Slot
    activity is re-derived from the current state each round, so persons
    assigned earlier in the chunk stop bidding and persons displaced
    within the chunk (if they are in the slot set) resume bidding;
    displaced persons outside the set wait until the next compaction —
    the auction tolerates arbitrary bidding schedules.
    """
    neg_inf = -jnp.inf
    n = s.p2o.shape[0]
    m = s.prices.shape[0]

    slot_active = (s.p2o[ids] == UNASSIGNED) & ~s.dropped[ids]
    any_active = jnp.any(slot_active)
    mask_c = arc_mask_c & slot_active[None, :]

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

    price_at_best = s.prices[best_col]  # [P]
    bidder0 = slot_active & (best != neg_inf)
    drop_now = bidder0 & (price_at_best > threshold)
    bidder = bidder0 & ~drop_now
    has_second = second != neg_inf
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid = jnp.where(bidder, raw_bid, neg_inf)

    # conflict by scatter: winning bid becomes the price (bids >= price+eps)
    obj = jnp.where(bidder, best_col, 0)
    prices_new = s.prices.at[obj].max(bid.astype(s.prices.dtype))
    won_bid = bidder & (bid == prices_new[obj])
    # deterministic winner among equal bids: smallest person id
    cand = jnp.where(won_bid, ids, _INT_MAX)
    scat_obj = jnp.where(won_bid, obj, m)  # losers scatter off the end
    winner_ext = jnp.full(m + 1, _INT_MAX).at[scat_obj].min(cand)
    winner = winner_ext[:m]
    has_w = winner != _INT_MAX

    win = won_bid & (winner[obj] == ids)
    prev = s.o2p[obj]  # [P] previous owner of the object bid on

    o2p_new = jnp.where(has_w, winner, s.o2p)
    # displaced previous owners become unassigned (duplicates benign)
    disp = win & (prev != _INT_MAX)
    p2o_ext = (
        jnp.concatenate([s.p2o, jnp.zeros(1, s.p2o.dtype)])
        .at[jnp.where(disp, prev, n)]
        .set(_INT_MAX)
        .at[jnp.where(win, ids, n)]
        .set(jnp.where(win, obj, 0))
    )
    p2o_new = p2o_ext[:n]
    dropped_new = (
        jnp.concatenate([s.dropped, jnp.zeros(1, bool)])
        .at[jnp.where(drop_now, ids, n)]
        .set(True)[:n]
    )
    return CState(
        prices=prices_new,
        p2o=p2o_new,
        o2p=o2p_new,
        dropped=dropped_new,
        nits=s.nits + any_active.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("p", "chunk"))
def khosla_run_chunk(
    problem: PaddedProblem, state: CState, eps, threshold, p: int, chunk: int
):
    """Compact the active set once (fixed-size nonzero + one [K, P] row
    gather), then run ``chunk`` rounds over those slots.  Returns the new
    state and the remaining active count."""
    dtype = problem.dtype
    eps = jnp.asarray(eps, dtype)
    threshold = jnp.asarray(threshold, dtype)

    active = (state.p2o == UNASSIGNED) & ~state.dropped
    (ids,) = jnp.nonzero(active, size=p, fill_value=0)
    ids = ids.astype(jnp.int32)
    count = jnp.sum(active, dtype=jnp.int32)
    slot_valid = (
        lax.broadcasted_iota(jnp.int32, (p,), 0) < jnp.minimum(count, p)
    )
    rows_c = problem.row_cols[:, ids]  # [K, P]
    vals_c = problem.row_vals[:, ids]
    arc_mask_c = problem.row_mask[:, ids] & slot_valid[None, :]

    def body(s, _):
        return (
            _compact_round(s, ids, rows_c, vals_c, arc_mask_c, eps, threshold),
            None,
        )

    state, _ = lax.scan(body, state, None, length=chunk)
    active_out = jnp.sum(
        (state.p2o == UNASSIGNED) & ~state.dropped, dtype=jnp.int32
    )
    return state, active_out


def _levels_for(n: int, base: int = 256):
    """Compaction sizes: powers of 8 from ``base`` up to ``n``."""
    levels = []
    p = base
    while p < n:
        levels.append(p)
        p *= 8
    levels.append(n)
    return levels[::-1]  # largest first


def khosla_solve_compact(
    problem: PaddedProblem,
    eps: float,
    price_threshold: float,
    init_state: Optional[CState] = None,
    chunk: int = 64,
    max_rounds: int = 10_000_000,
):
    """Host-driven Khosla solve with adaptive compaction levels.

    Semantics identical to ``khosla_solve`` (same choice/update/drop
    rules, deterministic tie-breaks); the host only picks which compiled
    level to run next based on the active count, so there is one small
    host sync per ``chunk`` rounds.
    """
    n = problem.num_rows
    m = problem.num_cols
    dtype = problem.dtype
    if init_state is None:
        state = CState(
            prices=jnp.zeros(m, dtype),
            p2o=jnp.full(n, _INT_MAX, jnp.int32),
            o2p=jnp.full(m, _INT_MAX, jnp.int32),
            dropped=jnp.zeros(n, bool),
            nits=jnp.zeros((), jnp.int32),
        )
    else:
        state = init_state

    levels = _levels_for(n)
    active = n
    while active > 0 and int(state.nits) < max_rounds:
        # smallest level that covers the current active set
        p = next(l for l in reversed(levels) if l >= active)
        # big levels drain fast — use short chunks so we drop to a
        # cheaper level quickly; small levels amortize host syncs
        level_chunk = 8 if p >= levels[0] else chunk
        state, active_dev = khosla_run_chunk(
            problem, state, eps, price_threshold, p, level_chunk
        )
        active = int(active_dev)
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
):
    """ε-scaling ladder around the compacted Khosla solve (extension).

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
    total_rounds = 0
    for i, phase_eps in enumerate(ladder):
        threshold = (m / 2.0) * (span + phase_eps)
        if state is not None:
            # keep prices, reset assignments (fresh phase at lower eps)
            state = CState(
                prices=state.prices,
                p2o=jnp.full(n, _INT_MAX, jnp.int32),
                o2p=jnp.full(m, _INT_MAX, jnp.int32),
                dropped=jnp.zeros(n, bool),
                nits=jnp.zeros((), jnp.int32),
            )
        state = khosla_solve_compact(
            problem, phase_eps, threshold, init_state=state, chunk=chunk,
            max_rounds=max_rounds,
        )
        total_rounds += int(state.nits)
    return state, total_rounds
