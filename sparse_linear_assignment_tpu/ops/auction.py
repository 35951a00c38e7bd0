"""Jitted synchronous-Jacobi auction core (the hot path).

The reference solves sequentially — Khosla pops one person at a time off a
LIFO stack (`/root/reference/src/ksparse.rs:186-245`) and the forward
solver loops over the unassigned list (`/root/reference/src/symmetric.rs:
334-468`).  On TPU both become the same *synchronous Jacobi round* in which
every unassigned person bids simultaneously:

  1. **Bidding** — per-person top-2 profit (value − price) over its padded
     arc row; vectorized over the person lane axis.  Reference choice rule:
     `ksparse.rs:199-214` / `symmetric.rs:361-376`.
  2. **Conflict resolution** — per-object max over incident bids using the
     transposed padded incidence (gathers only; replaces the reference's
     scatter-max `symmetric.rs:386-405`).  Ties break deterministically to
     the smallest person id.
  3. **Assignment** — prices take the winning bid, displaced owners become
     unassigned; all computed person-/object-side with `where`, no scatters
     (replaces `symmetric.rs:409-455` and `ksparse.rs:223-244`).

The auction theory is order-insensitive: any ε-CS-preserving bidding order
reaches an ε-optimal matching, so the Jacobi schedule keeps the reference's
optimality guarantees while exposing full vector parallelism.

Drivers: the while_loop solvers (`khosla_solve`, `forward_solve`) run the
entire solve in one compiled program and are ideal on CPU; on this TPU
backend dynamic while_loop bodies with gathers blow up the compiler, so
the production paths are host-chunked fixed-length scans
(`forward_solve_chunked` here, the slot-list engine in `ops/compact.py`,
and the batch driver in `batch.py`) — a handful of host syncs per solve,
each amortized over a chunk of rounds.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..solution import UNASSIGNED
from ..utils.trace import trace_round
from .dense import DenseProblem
from .padded import PaddedProblem

_INT_MAX = np.int32(UNASSIGNED)  # np scalar: no backend init at import


# ----------------------------------------------------------------------
# Phase 1: bidding (per-person top-2 profit)
# ----------------------------------------------------------------------
def top2_profits(problem: PaddedProblem, prices: jnp.ndarray):
    """Best / second-best profit per person plus the best arc's column and
    value.  First-occurrence selection matches the reference's strict `>`
    update (`ksparse.rs:206-213`) which keeps the earliest maximum.

    TPU note: selection is done with masked reductions over the (small)
    arc axis rather than argmax + take_along_axis — per-lane dynamic
    indexing across sublanes is a slow path on TPU, plain max/min
    reductions are not.  Everything here is int32/value-dtype so the
    loop body stays free of emulated int64 even under jax_enable_x64.

    Returns (best_profit[N], second_profit[N], best_col[N], best_val[N]).
    """
    if isinstance(problem, DenseProblem):
        return _top2_profits_dense(problem, prices)
    return top2_profits_arrays(
        problem.row_cols, problem.row_vals, problem.row_mask, prices
    )


def top2_profits_arrays(row_cols, row_vals, row_mask, prices):
    """Array form of the padded top-2 (also used by the sharded round
    bodies on their person-shard slices, `parallel/sharded.py`)."""
    neg_inf = -jnp.inf
    profit = jnp.where(
        row_mask, row_vals - prices[row_cols], neg_inf
    )  # [K, N]
    k = profit.shape[0]
    best = jnp.max(profit, axis=0)  # [N]
    k_iota = lax.broadcasted_iota(jnp.int32, profit.shape, 0)
    is_best = profit == best[None, :]
    best_k = jnp.min(
        jnp.where(is_best, k_iota, jnp.int32(k)), axis=0
    )  # first max
    sel = k_iota == best_k[None, :]
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0)
    best_col = jnp.max(jnp.where(sel, row_cols, 0), axis=0)
    best_val = jnp.max(
        jnp.where(sel, row_vals, jnp.asarray(neg_inf, profit.dtype)),
        axis=0,
    )
    return best, second, best_col, best_val


def _top2_profits_dense(problem: DenseProblem, prices: jnp.ndarray):
    """Dense variant: profits are a broadcast subtraction, selection is
    masked reductions — no gathers anywhere."""
    neg_inf = -jnp.inf
    vals_t = problem.vals_t  # [M, N]
    m = vals_t.shape[0]
    profit = vals_t - prices[:, None]
    best = jnp.max(profit, axis=0)
    j_iota = lax.broadcasted_iota(jnp.int32, profit.shape, 0)
    is_best = profit == best[None, :]
    best_j = jnp.min(jnp.where(is_best, j_iota, jnp.int32(m)), axis=0)
    sel = j_iota == best_j[None, :]
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0)
    best_val = jnp.max(
        jnp.where(sel, vals_t, jnp.asarray(neg_inf, vals_t.dtype)), axis=0
    )
    return best, second, best_j, best_val


def _resolve_and_assign_dense(
    problem: DenseProblem,
    prices: jnp.ndarray,
    p2o: jnp.ndarray,
    o2p: jnp.ndarray,
    bid: jnp.ndarray,
    bid_col: jnp.ndarray,
):
    """Dense conflict resolution + assignment: ``[M, N]`` broadcast
    compares and reductions instead of incidence gathers."""
    neg_inf = -jnp.inf
    m, n = problem.vals_t.shape
    shape = (m, n)
    j_iota = lax.broadcasted_iota(jnp.int32, shape, 0)
    u_iota = lax.broadcasted_iota(jnp.int32, shape, 1)

    bidding = bid != neg_inf
    is_here = (bid_col[None, :] == j_iota) & bidding[None, :]
    eff = jnp.where(is_here, bid[None, :], neg_inf)
    max_bid = jnp.max(eff, axis=1)  # [M]
    has_winner = max_bid != neg_inf
    cand = jnp.where(is_here & (eff >= max_bid[:, None]), u_iota, _INT_MAX)
    winner = jnp.min(cand, axis=1)  # [M]

    prices_new = jnp.where(has_winner, max_bid.astype(prices.dtype), prices)
    o2p_new = jnp.where(has_winner, winner, o2p)

    won = jnp.any(is_here & (winner[:, None] == u_iota), axis=0)  # [N]
    assigned = p2o != UNASSIGNED
    displaced = assigned & jnp.any(
        (p2o[None, :] == j_iota) & has_winner[:, None], axis=0
    )
    p2o_new = jnp.where(won, bid_col, jnp.where(displaced, _INT_MAX, p2o))
    return prices_new, p2o_new, o2p_new


# ----------------------------------------------------------------------
# Phase 2+3: conflict resolution and assignment (gather-only)
# ----------------------------------------------------------------------
def resolve_and_assign(
    problem: PaddedProblem,
    prices: jnp.ndarray,
    p2o: jnp.ndarray,
    o2p: jnp.ndarray,
    bid: jnp.ndarray,
    bid_col: jnp.ndarray,
):
    """One synchronous assignment phase.

    ``bid[u]`` is −inf for non-bidders; ``bid_col[u]`` is the object person
    ``u`` bids on.  Each object takes the max incident bid (smallest person
    id on ties); its price becomes the winning bid, the winner is assigned
    and any displaced previous owner becomes unassigned.
    """
    if isinstance(problem, DenseProblem):
        return _resolve_and_assign_dense(problem, prices, p2o, o2p, bid, bid_col)
    neg_inf = -jnp.inf
    n = p2o.shape[0]

    inc_bid = bid[problem.col_persons]        # [Kc, M]
    inc_tgt = bid_col[problem.col_persons]    # [Kc, M]
    obj_ids = lax.broadcasted_iota(jnp.int32, inc_bid.shape, 1)
    is_here = problem.col_mask & (inc_tgt == obj_ids) & (inc_bid != neg_inf)
    eff = jnp.where(is_here, inc_bid, neg_inf)
    max_bid = jnp.max(eff, axis=0)            # [M]
    has_winner = max_bid != neg_inf
    cand = jnp.where(
        is_here & (eff >= max_bid[None, :]), problem.col_persons, _INT_MAX
    )
    winner = jnp.min(cand, axis=0)            # [M]

    prices_new = jnp.where(has_winner, max_bid.astype(prices.dtype), prices)
    o2p_new = jnp.where(has_winner, winner, o2p)

    person_iota = lax.broadcasted_iota(jnp.int32, (n,), 0)
    bidding = bid != neg_inf
    safe_tgt = jnp.where(bidding, bid_col, 0)
    won = bidding & (winner[safe_tgt] == person_iota)
    assigned = p2o != UNASSIGNED
    safe_cur = jnp.where(assigned, p2o, 0)
    displaced = assigned & has_winner[safe_cur]
    p2o_new = jnp.where(
        won, bid_col, jnp.where(displaced, _INT_MAX, p2o)
    )
    return prices_new, p2o_new, o2p_new


def _price_at_best(problem, prices, best_col, best, best_val):
    """Price of each person's best object.  Dense path reconstructs it
    algebraically (profit = value − price ⇒ price = value − profit),
    avoiding a per-lane gather; sparse path gathers N elements."""
    if isinstance(problem, DenseProblem):
        return best_val - best
    return prices[best_col]


# ----------------------------------------------------------------------
# Device-side ε-CS certificate (reference: solver.rs:154-189)
# ----------------------------------------------------------------------
def ecs_margins(problem, prices: jnp.ndarray, p2o: jnp.ndarray):
    """Per-person (chosen_profit, max_profit) for ε-CS checks."""
    neg_inf = -jnp.inf
    if isinstance(problem, DenseProblem):
        vals_t = problem.vals_t
        profit = vals_t - prices[:, None]
        max_profit = jnp.max(profit, axis=0)
        j_iota = lax.broadcasted_iota(jnp.int32, vals_t.shape, 0)
        is_chosen = p2o[None, :] == j_iota
        chosen_profit = jnp.max(
            jnp.where(is_chosen, profit, jnp.asarray(neg_inf, profit.dtype)),
            axis=0,
        )
        return chosen_profit, max_profit
    profit = jnp.where(
        problem.row_mask,
        problem.row_vals - prices[problem.row_cols],
        neg_inf,
    )
    max_profit = jnp.max(profit, axis=0)
    is_chosen = problem.row_mask & (problem.row_cols == p2o[None, :])
    chosen_val = jnp.max(
        jnp.where(is_chosen, problem.row_vals, neg_inf), axis=0
    )
    safe_j = jnp.where(p2o != UNASSIGNED, p2o, 0)
    chosen_profit = chosen_val - prices[safe_j]
    return chosen_profit, max_profit


def ecs_satisfied_device(
    problem: PaddedProblem,
    prices: jnp.ndarray,
    p2o: jnp.ndarray,
    eps,
    toleration,
) -> jnp.ndarray:
    """Vectorized ε-complementary-slackness check; only meaningful when the
    assignment is complete (as in the reference call site,
    `symmetric.rs:280-285`)."""
    chosen_profit, max_profit = ecs_margins(problem, prices, p2o)
    return jnp.all(chosen_profit + toleration >= max_profit - eps)


# ----------------------------------------------------------------------
# KhoslaSolver core: Jacobi auction with the price-threshold drop rule
# ----------------------------------------------------------------------
class KhoslaState(NamedTuple):
    prices: jnp.ndarray
    p2o: jnp.ndarray
    o2p: jnp.ndarray
    dropped: jnp.ndarray
    nits: jnp.ndarray


def khosla_round(problem, s: KhoslaState, eps, price_threshold) -> KhoslaState:
    """One synchronous Khosla round (choice / drop / update / assign).
    A no-op (except for already--inf bids) when no person is active, so
    it is safe inside fixed-length scans and under vmap."""
    active = (s.p2o == UNASSIGNED) & ~s.dropped
    any_active = jnp.any(active)
    best, second, best_col, best_val = top2_profits(problem, s.prices)
    price_at_best = _price_at_best(problem, s.prices, best_col, best, best_val)
    drop_now = active & (price_at_best > price_threshold)
    bidder = active & ~drop_now
    has_second = second != -jnp.inf
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid = jnp.where(bidder, raw_bid, -jnp.inf)
    prices, p2o, o2p = resolve_and_assign(
        problem, s.prices, s.p2o, s.o2p, bid, best_col
    )
    trace_round(
        "khosla round {}: active={} dropped={}",
        s.nits, jnp.sum(active, dtype=jnp.int32),
        jnp.sum(drop_now, dtype=jnp.int32),
    )
    return KhoslaState(
        prices=prices,
        p2o=p2o,
        o2p=o2p,
        dropped=s.dropped | drop_now,
        nits=s.nits + any_active.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def khosla_solve(
    problem: PaddedProblem,
    eps,
    price_threshold,
    max_rounds: int = 10_000_000,
):
    """Solve one instance with the Khosla auction (TPU re-derivation of
    `ksparse.rs:153-251`).

    The sequential price-threshold drop rule (`ksparse.rs:218-220`) — skip
    a person whose best-profit object is already priced above
    ``(M/2)(w_max − w_min + eps)`` — carries over per-round: such persons
    are permanently dropped, which preserves the finite-termination
    guarantee on infeasible instances.  ``max_rounds`` is a safety net for
    the reduced-precision (float32) path where ``price + eps`` can round to
    ``price``; at float64 the loop provably terminates without it.
    """
    # CPU-only by design, now also by guard: a dynamic while_loop body
    # containing gathers is a documented compile bomb on the TPU backend
    # (docs/PERFORMANCE.md item 2); the host-chunked engines
    # (ops/compact.py) are the accelerator path.  Trace-time check, so
    # it costs nothing on cached calls.
    if jax.default_backend() != "cpu":  # pragma: no cover - TPU only
        raise RuntimeError(
            "khosla_solve (while_loop engine) is CPU-only; use the "
            "slot-list/full-scan engines (KhoslaSolver.solve with "
            "compact=True, the default on accelerators)"
        )
    dtype = problem.dtype
    n = problem.num_rows
    m = problem.num_cols
    eps = jnp.asarray(eps, dtype)
    price_threshold = jnp.asarray(price_threshold, dtype)

    init = KhoslaState(
        prices=jnp.zeros(m, dtype),
        p2o=jnp.full(n, _INT_MAX, jnp.int32),
        o2p=jnp.full(m, _INT_MAX, jnp.int32),
        dropped=jnp.zeros(n, bool),
        nits=jnp.zeros((), jnp.int32),
    )

    def cond(s: KhoslaState):
        active = (s.p2o == UNASSIGNED) & ~s.dropped
        return jnp.any(active) & (s.nits < max_rounds)

    def body(s: KhoslaState):
        return khosla_round(problem, s, eps, price_threshold)

    final = lax.while_loop(cond, body, init)
    num_unassigned = jnp.sum(final.p2o == UNASSIGNED).astype(jnp.int32)
    return final.prices, final.p2o, final.o2p, num_unassigned, final.nits


# ----------------------------------------------------------------------
# ForwardAuctionSolver core: Jacobi auction with ε-scaling
# ----------------------------------------------------------------------
class ForwardState(NamedTuple):
    prices: jnp.ndarray
    p2o: jnp.ndarray
    o2p: jnp.ndarray
    eps: jnp.ndarray
    nits: jnp.ndarray
    nreductions: jnp.ndarray
    optimal_found: jnp.ndarray
    done: jnp.ndarray


def forward_round(
    problem,
    s: ForwardState,
    target_eps,
    toleration,
    start_from_optimal_eps,
    max_iterations,
    keep_valid: bool = False,
) -> ForwardState:
    """One forward-auction round including the ε-scaling bookkeeping.
    A no-op once ``done`` is set, so it is safe inside fixed-length
    scans and under vmap.

    Bid rule (`symmetric.rs:378`): bid = best edge value − second-best
    profit + eps.  Deliberate deviation from the reference for the
    single-arc case (second = −inf): the reference bids +inf, which
    poisons the price permanently — after an ε-reduction reset the
    person sees −inf profit, re-bids NaN (`symmetric.rs:359,378`) and
    the solve loops until max_iterations even on feasible instances.
    We bid `price + eps` instead (the Khosla guard, `ksparse.rs:226`),
    which preserves ε-CS, keeps prices finite (also required for the
    float32 fast path) and terminates optimally where the reference
    stalls.
    """
    dtype = s.prices.dtype
    unassigned = (s.p2o == UNASSIGNED) & ~s.done
    best, second, best_col, best_val = top2_profits(problem, s.prices)
    has_second = second != -jnp.inf
    raw_bid = jnp.where(
        has_second,
        best_val - second + s.eps,
        _price_at_best(problem, s.prices, best_col, best, best_val) + s.eps,
    )
    bid = jnp.where(unassigned & (best != -jnp.inf), raw_bid, -jnp.inf)
    prices, p2o, o2p = resolve_and_assign(
        problem, s.prices, s.p2o, s.o2p, bid, best_col
    )
    # no-op guard for finished instances (vmap / fixed-length scans)
    nits = s.nits + (~s.done).astype(jnp.int32)
    num_unassigned = jnp.sum(p2o == UNASSIGNED, dtype=jnp.int32)
    fully = (num_unassigned == 0) & ~s.done

    def when_full(args):
        prices, p2o, o2p, eps, nreductions, optimal_found, done = args
        chosen_profit, max_profit = ecs_margins(problem, prices, p2o)
        is_optimal = start_from_optimal_eps | jnp.all(
            chosen_profit + toleration >= max_profit - target_eps
        )
        # terminate when optimal, or already below target eps
        # (shown optimal for eps < 1/n, `symmetric.rs:290-294`)
        stop = is_optimal | (eps < target_eps)
        reduce = ~stop
        eps_new = jnp.where(reduce, eps * jnp.asarray(0.15, dtype), eps)
        if keep_valid:
            # Extension over the reference's full reset
            # (`symmetric.rs:299-321`): keep every pair that already
            # satisfies ε-CS at the reduced eps — the auction invariant
            # is preserved, so the final certificate is identical, but
            # each phase re-auctions only the few invalid pairs.
            # o2p is left stale: rounds only ever *write* it, so the
            # caller reconstructs it from the final p2o.
            keep = (p2o != _INT_MAX) & (
                chosen_profit + toleration >= max_profit - eps_new
            )
            p2o_new = jnp.where(reduce, jnp.where(keep, p2o, _INT_MAX), p2o)
            o2p_new = o2p
        else:
            p2o_new = jnp.where(reduce, _INT_MAX, p2o)
            o2p_new = jnp.where(reduce, _INT_MAX, o2p)
        return (
            prices,
            p2o_new,
            o2p_new,
            eps_new,
            nreductions + reduce.astype(jnp.int32),
            optimal_found | is_optimal,
            done | stop,
        )

    def when_not_full(args):
        return args

    prices, p2o, o2p, eps, nreductions, optimal_found, done = lax.cond(
        fully,
        when_full,
        when_not_full,
        (prices, p2o, o2p, s.eps, s.nreductions, s.optimal_found, s.done),
    )
    done = done | (nits >= max_iterations)
    trace_round(
        "forward round {}: unassigned={} eps={}",
        nits, num_unassigned, eps,
    )
    return ForwardState(
        prices=prices,
        p2o=p2o,
        o2p=o2p,
        eps=eps,
        nits=nits,
        nreductions=nreductions,
        optimal_found=optimal_found,
        done=done,
    )


@jax.jit
def forward_solve(
    problem: PaddedProblem,
    start_eps,
    target_eps,
    toleration,
    start_from_optimal_eps,
    max_iterations,
):
    """Solve one instance with the ε-scaling forward auction (TPU
    re-derivation of `symmetric.rs:218-468`).

    Outer logic matches the reference: rounds run until the assignment is
    complete; if ε-CS is not yet satisfied at ``target_eps`` the assignment
    is reset with kept prices and ``eps *= 0.15``
    (`symmetric.rs:290-324`); infeasible instances are cut off by
    ``max_iterations`` (`symmetric.rs:326-328`).
    """
    # CPU-only by guard, same rationale as khosla_solve: while_loop +
    # gather bodies are a compile bomb on the TPU backend; the chunked
    # driver (forward_solve_chunked) is the accelerator path.
    if jax.default_backend() != "cpu":  # pragma: no cover - TPU only
        raise RuntimeError(
            "forward_solve (while_loop engine) is CPU-only; use "
            "forward_solve_chunked (ForwardAuctionSolver's default)"
        )
    dtype = problem.dtype
    n = problem.num_rows
    m = problem.num_cols
    start_eps = jnp.asarray(start_eps, dtype)
    target_eps = jnp.asarray(target_eps, dtype)
    toleration = jnp.asarray(toleration, dtype)
    start_from_optimal_eps = jnp.asarray(start_from_optimal_eps, bool)
    max_iterations = jnp.asarray(max_iterations, jnp.int32)

    init = ForwardState(
        prices=jnp.zeros(m, dtype),
        p2o=jnp.full(n, _INT_MAX, jnp.int32),
        o2p=jnp.full(m, _INT_MAX, jnp.int32),
        eps=start_eps,
        nits=jnp.zeros((), jnp.int32),
        nreductions=jnp.zeros((), jnp.int32),
        optimal_found=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
    )

    def cond(s: ForwardState):
        return ~s.done

    def body(s: ForwardState):
        return forward_round(
            problem, s, target_eps, toleration, start_from_optimal_eps,
            max_iterations,
        )

    final = lax.while_loop(cond, body, init)
    num_unassigned = jnp.sum(final.p2o == UNASSIGNED).astype(jnp.int32)
    return (
        final.prices,
        final.p2o,
        final.o2p,
        num_unassigned,
        final.nits,
        final.nreductions,
        final.optimal_found,
        final.eps,
    )


@functools.partial(jax.jit, static_argnames=("chunk",))
def forward_run_chunk(
    problem,
    state: ForwardState,
    target_eps,
    toleration,
    start_from_optimal_eps,
    max_iterations,
    chunk: int,
    price_bound=None,
):
    """``chunk`` forward rounds as a fixed-length scan (host-chunked
    driver; dynamic while_loop bodies blow up this TPU backend's
    compiler).

    ``price_bound`` (a scalar; ``None`` disarms) arms the infeasibility
    certificate: a feasible instance's prices provably never exceed the
    caller-computed Bertsekas bound, so crossing it sets ``done`` with
    the matching incomplete — terminating infeasible instances in O(n)
    rounds instead of burning ``max_iterations`` (an extension; the
    reference's only cutoff is ``max_iterations``,
    ``symmetric.rs:177-186``).  Checked once per CHUNK (one [M] max),
    not per round, so detection lags at most one chunk.  The None-vs-
    scalar pytree difference alone selects the program variant (None is
    an empty pytree — a distinct trace)."""

    def body(s, _):
        return (
            forward_round(
                problem, s, target_eps, toleration,
                start_from_optimal_eps, max_iterations,
            ),
            None,
        )

    state, _ = lax.scan(body, state, None, length=chunk)
    if price_bound is not None:
        diverged = jnp.max(state.prices) > price_bound
        state = state._replace(done=state.done | diverged)
    return state


def forward_solve_chunked(
    problem,
    start_eps,
    target_eps,
    toleration,
    start_from_optimal_eps,
    max_iterations,
    chunk: int = 64,
    start_prices=None,
    max_chunk: int = 1024,
    value_bound=None,
):
    """Host-driven forward solve: same semantics and return values as
    :func:`forward_solve`, structured as chunks of fixed-length scans.

    ``start_prices`` warm-starts the price vector (the reference's price
    persistence across ε-restarts, `symmetric.rs:290-324`, exposed as an
    argument — SURVEY.md §5.4); ε-CS optimality at termination holds for
    any start prices on instances reaching a complete assignment.

    ``value_bound`` (C = max |value| over real arcs, host-known) arms an
    **infeasibility certificate**: within one ε-phase started at prices
    p, a feasible instance's prices never exceed ``max(p) + (2n-1)C +
    (n-1)ε`` (Bertsekas' price bound for the auction algorithm, valid
    for arbitrary start prices).  Across the ε-ladder the phase bounds
    telescope, so the armed bound is ``max(p0) + (K+1)·(2n+1)(C+ε0) +
    1`` with K an upper bound on the phase count (computed with ladder
    factor 1/2 — the real ×0.15 ladder has fewer phases, so K is an
    overcount and the bound stays sound).  Crossing it proves
    infeasibility and the loop stops with the matching incomplete — a
    few·n rounds at ladder ε instead of the reference's full
    ``max_iterations`` crawl (its only cutoff, `symmetric.rs:177-186`;
    measured 257 s on a 2x2 infeasible instance through this tunnel).
    Sound by construction: it can never trip on a feasible instance,
    so results there are unchanged."""
    dtype = problem.dtype
    np_dtype = np.dtype(dtype)
    n = problem.num_rows
    m = problem.num_cols
    init = ForwardState(
        prices=(
            jnp.zeros(m, dtype) if start_prices is None
            else jnp.asarray(np.asarray(start_prices, dtype=np_dtype))
        ),
        p2o=jnp.full(n, _INT_MAX, jnp.int32),
        o2p=jnp.full(m, _INT_MAX, jnp.int32),
        eps=jnp.asarray(np_dtype.type(start_eps)),
        nits=jnp.zeros((), jnp.int32),
        nreductions=jnp.zeros((), jnp.int32),
        optimal_found=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
    )
    target_eps = np_dtype.type(target_eps)
    toleration = np_dtype.type(toleration)
    start_from_optimal_eps = np.bool_(start_from_optimal_eps)
    max_iterations_i = np.int32(max_iterations)

    price_bound = None
    if value_bound is not None:
        p0_max = (
            0.0 if start_prices is None
            else float(np.max(np.asarray(start_prices)))
        )
        eps_hi = max(float(start_eps), float(target_eps))
        ratio = float(start_eps) / max(float(target_eps), 1e-300)
        phases = (
            1 if ratio <= 1.0
            else int(np.ceil(np.log2(max(ratio, 2.0)))) + 1
        )
        # Telescoped Bertsekas bound, computed in float64; if it is not
        # representable in the working dtype (extreme n*C in float32)
        # the certificate is DISARMED LOUDLY rather than silently (an
        # inf bound can never trip, which would revert to the
        # max_iterations crawl with no warning — ADVICE r4 #5).
        # Clamping down instead would risk tripping on a feasible
        # instance, so soundness demands the disarm.
        bound64 = (
            float(p0_max)
            + float(phases + 1) * float(2 * n + 1)
            * (float(value_bound) + float(eps_hi))
            + 1.0
        )
        price_bound = np_dtype.type(bound64)
        if not np.isfinite(price_bound):
            import warnings

            warnings.warn(
                f"infeasibility-certificate price bound {bound64:.3e} "
                f"overflows {np_dtype.name}; certificate disarmed — "
                f"infeasible instances will run to max_iterations "
                f"(use dtype=float64 to keep it armed)",
                RuntimeWarning,
                stacklevel=2,
            )
            price_bound = None

    state = init
    # geometrically growing chunks: every host sync costs ~240 ms of
    # tunnel latency in this environment, so the done-check count must
    # be logarithmic in the round count, not linear (docs/PERFORMANCE.md)
    cur_chunk = chunk
    while not bool(state.done):
        state = forward_run_chunk(
            problem, state, target_eps, toleration,
            start_from_optimal_eps, max_iterations_i, cur_chunk,
            price_bound=price_bound,
        )
        cur_chunk = min(max_chunk, cur_chunk * 2)
    num_unassigned = jnp.sum(state.p2o == UNASSIGNED).astype(jnp.int32)
    return (
        state.prices,
        state.p2o,
        state.o2p,
        num_unassigned,
        state.nits,
        state.nreductions,
        state.optimal_found,
        state.eps,
    )
