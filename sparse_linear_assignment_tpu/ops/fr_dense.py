"""Forward-reverse auction rounds for dense instances.

The pure forward auction's round count is dominated by *displacement
chains*: near the end of a phase, one unassigned person displaces
another, who displaces another, ... — a chain that lockstep Jacobi
rounds walk one link per round (docs/PERFORMANCE.md "Batched gap").
The classic cure (Bertsekas & Castañón's combined forward/reverse
auction — the capability extension named in VERDICT round 1 over
`/root/reference/src/symmetric.rs:334-468`) lets **unassigned objects
bid back for persons** by lowering their own price: chains are attacked
from both ends and the price wars that force ε-scaling mostly vanish.

Duality bookkeeping (what makes this exact):

- state carries person profits ``pi[N]`` next to object prices
  ``prices[M]``, with the joint invariant ``pi_i + p_j >= a_ij − ε``
  for all pairs and ``pi_i + p_j = a_ij`` for assigned pairs.
- **forward sub-round** (persons bid): winner of object j pays
  ``p_j := a_ij − w_i + ε`` and records ``pi_i := w_i − ε`` (w = second
  best profit).  Prices only rise, so the invariant is Jacobi-safe.
- **reverse sub-round** (objects bid): unassigned object j computes the
  top-2 of ``a_ij − pi_i``; the winner lowers its own price to
  ``p_j := γ_j − ε`` and lifts the chosen person's profit to
  ``pi_i := a_ij − γ_j + ε``.  Profits only rise and each object writes
  only its own price, so this too is Jacobi-safe (price cuts were
  validated against the old, smaller pi).
- at termination the price-only ε-CS certificate of the forward solver
  holds verbatim: chosen profit = pi_i >= max_j(a_ij − p_j) − ε
  (``ops/auction.py:ecs_margins`` is reused unchanged).

Reverse bidding requires every object to be matchable (symmetric
instances); asymmetric instances keep forward-only rounds — the same
restriction the reference applies to ε-scaling
(`/root/reference/src/symmetric.rs:256-267`).

Everything is [M, N] broadcasts and masked reductions (no gathers), so
a combined round is a handful of vector passes — the same TPU-friendly
structure as ``ops/dense.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..solution import UNASSIGNED
from ..utils.trace import trace_round

_INT_MAX = np.int32(UNASSIGNED)  # np scalar: no backend init at import

#: "minus infinity" for the integer-auction mode (values/prices in
#: scaled int32 arithmetic): far below any reachable profit, far above
#: int32 overflow when combined with real values
INT_SENTINEL = -(2**30)


def _neg_inf(dtype):
    """The masking sentinel for a value dtype: −inf for floats, a deep
    negative constant for the integer-auction mode."""
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.asarray(INT_SENTINEL, dtype)
    return jnp.asarray(-jnp.inf, dtype)


#: initial stalled-phase preemption horizon (rounds); doubles on each
#: preemption until the next cardinality increase
STALL_K0 = 8


class FRState(NamedTuple):
    prices: jnp.ndarray   # [M] object prices
    profits: jnp.ndarray  # [N] person profits (pi)
    p2o: jnp.ndarray      # [N]
    o2p: jnp.ndarray      # [M]
    eps: jnp.ndarray      # ()
    forward_mode: jnp.ndarray  # () bool — True: persons bid this round
    since_inc: jnp.ndarray  # () i32 — rounds since last cardinality gain
    stall_k: jnp.ndarray    # () i32 — current preemption horizon
    nits: jnp.ndarray     # ()
    nreductions: jnp.ndarray
    optimal_found: jnp.ndarray
    done: jnp.ndarray


def fr_init(vals_t, eps, dtype=None):
    """Initial state: zero prices, pi = per-person max value (the exact
    profit at zero prices, so the joint invariant holds at the start)."""
    m, n = vals_t.shape
    dtype = dtype or vals_t.dtype
    return FRState(
        prices=jnp.zeros(m, dtype),
        profits=jnp.max(vals_t, axis=0).astype(dtype),
        p2o=jnp.full(n, _INT_MAX, jnp.int32),
        o2p=jnp.full(m, _INT_MAX, jnp.int32),
        eps=jnp.asarray(eps, dtype),
        forward_mode=jnp.ones((), bool),
        since_inc=jnp.zeros((), jnp.int32),
        stall_k=jnp.full((), STALL_K0, jnp.int32),
        nits=jnp.zeros((), jnp.int32),
        nreductions=jnp.zeros((), jnp.int32),
        optimal_found=jnp.zeros((), bool),
        done=jnp.zeros((), bool),
    )


def _forward_sub(vals_t, prices, profits, p2o, o2p, eps, done):
    """Unassigned persons bid for objects (dense, gather-free).

    Bids travel in **increment form**: every bidder for object j offers
    ``bid = best_val − floor + eps = prices[j] + (best − floor + eps)``,
    and since ``prices[j]`` is common to all of j's bidders, conflict
    resolution can compare the per-person increment ``best − floor +
    eps`` directly and the winner's price becomes ``prices[j] +
    max_increment`` — one fewer [M, N] masked-max traversal than
    recovering ``best_val`` (this is the hot kernel's per-round cost).
    The ``won``/``displaced`` flags share a single coded reduction:
    both indicator matrices are one-hot per column, so an f32 sum of
    ``t_won + 2·t_disp`` recovers each bit exactly.

    Works on float values (−inf masking) and, for the integer-auction
    mode (scaled int32 costs, integer ε — see ``batch.solve_batch``'s
    ``integer`` option), on int32 values with a deep-negative sentinel."""
    neg_inf = _neg_inf(vals_t.dtype)
    m, n = vals_t.shape
    shape = (m, n)
    j_iota = lax.broadcasted_iota(jnp.int32, shape, 0)
    u_iota = lax.broadcasted_iota(jnp.int32, shape, 1)

    unassigned = (p2o == _INT_MAX) & ~done
    profit = vals_t - prices[:, None]
    best = jnp.max(profit, axis=0)                       # [N]
    is_best = profit == best[None, :]
    best_j = jnp.min(jnp.where(is_best, j_iota, jnp.int32(m)), axis=0)
    sel = j_iota == best_j[None, :]
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0)
    has_second = second != neg_inf
    # profit the winner retains; price increment = best − floor + eps
    floor = jnp.where(has_second, second, best)
    raw_inc = best - floor + eps

    bidding = unassigned & (best != neg_inf)
    inc = jnp.where(bidding, raw_inc, neg_inf)

    # conflict resolution per object (smallest person id wins ties)
    is_here = sel & bidding[None, :]
    eff = jnp.where(is_here, inc[None, :], neg_inf)
    max_inc = jnp.max(eff, axis=1)                       # [M]
    has_winner = max_inc != neg_inf
    cand = jnp.where(is_here & (eff >= max_inc[:, None]), u_iota, _INT_MAX)
    winner = jnp.min(cand, axis=1)                       # [M]

    prices_new = jnp.where(
        has_winner, prices + max_inc.astype(prices.dtype), prices
    )
    o2p_new = jnp.where(has_winner, winner, o2p)

    # won (bit 0) and displaced (bit 1) in one coded f32 reduction
    t_won = is_here & (winner[:, None] == u_iota)
    t_disp = (p2o[None, :] == j_iota) & has_winner[:, None]
    code = jnp.sum(
        t_won.astype(jnp.float32) + 2.0 * t_disp.astype(jnp.float32),
        axis=0,
    )
    won = (code == 1.0) | (code == 3.0)                  # [N]
    displaced = (p2o != _INT_MAX) & (code >= 2.0)
    p2o_new = jnp.where(won, best_j, jnp.where(displaced, _INT_MAX, p2o))
    # winner's dual: pi = floor − eps, making pi + p = a exact
    profits_new = jnp.where(
        won, (floor - eps).astype(profits.dtype), profits
    )
    return prices_new, profits_new, p2o_new, o2p_new


def _reverse_sub(vals_t, prices, profits, p2o, o2p, eps, done):
    """Unassigned objects bid for persons by cutting their own price.

    Mirror of :func:`_forward_sub`'s increment form: all of person i's
    bidders offer ``pi = profits[i] + (beta − rfloor + eps)``, so the
    per-object increment resolves the conflict and the winner's profit
    becomes ``profits[i] + max_increment``; ``won_obj``/``freed`` share
    one coded f32 reduction (both indicators one-hot per row).
    Int32 values use the sentinel-masking scheme of
    :func:`_forward_sub`."""
    neg_inf = _neg_inf(vals_t.dtype)
    m, n = vals_t.shape
    shape = (m, n)
    j_iota = lax.broadcasted_iota(jnp.int32, shape, 0)
    u_iota = lax.broadcasted_iota(jnp.int32, shape, 1)

    free_obj = (o2p == _INT_MAX) & ~done
    rprof = vals_t - profits[None, :]                    # [M, N]
    beta = jnp.max(rprof, axis=1)                        # [M]
    is_beta = rprof == beta[:, None]
    best_i = jnp.min(jnp.where(is_beta, u_iota, jnp.int32(n)), axis=1)
    rsel = u_iota == best_i[:, None]
    gamma = jnp.max(jnp.where(rsel, neg_inf, rprof), axis=1)
    has_gamma = gamma != neg_inf
    rfloor = jnp.where(has_gamma, gamma, beta)
    # the profit increment this object can offer its best person
    pi_inc = beta - rfloor + eps

    bidding = free_obj & (beta != neg_inf)
    rinc = jnp.where(bidding, pi_inc, neg_inf)

    # conflict resolution per person (smallest object id wins ties)
    is_here = rsel & bidding[:, None]
    eff = jnp.where(is_here, rinc[:, None], neg_inf)
    max_inc = jnp.max(eff, axis=0)                       # [N]
    has_rw = max_inc != neg_inf
    cand = jnp.where(is_here & (eff >= max_inc[None, :]), j_iota, _INT_MAX)
    winner_obj = jnp.min(cand, axis=0)                   # [N]

    # won_obj (bit 0) and freed (bit 1) in one coded f32 reduction
    t_won = is_here & (winner_obj[None, :] == j_iota)
    is_disp = has_rw & (p2o != _INT_MAX)
    t_freed = (p2o[None, :] == j_iota) & is_disp[None, :]
    code = jnp.sum(
        t_won.astype(jnp.float32) + 2.0 * t_freed.astype(jnp.float32),
        axis=1,
    )
    won_obj = (code == 1.0) | (code == 3.0)              # [M]
    freed = code >= 2.0
    # winner cuts its price; pi + p = a exact for the new pair
    prices_new = jnp.where(
        won_obj, (rfloor - eps).astype(prices.dtype), prices
    )
    profits_new = jnp.where(
        has_rw, profits + max_inc.astype(profits.dtype), profits
    )
    o2p_new = jnp.where(
        won_obj, best_i, jnp.where(freed, _INT_MAX, o2p)
    )
    p2o_new = jnp.where(has_rw, winner_obj, p2o)
    return prices_new, profits_new, p2o_new, o2p_new


def fr_round(
    vals_t,
    s: FRState,
    target_eps,
    toleration,
    max_iterations,
    scale_factor=0.15,
    skip_certificate: bool = False,
) -> FRState:
    """One forward-reverse round with ε-scaling bookkeeping.  A no-op
    once ``done`` is set (safe under vmap / fixed-length scans).

    **Mode switching** (the termination mechanism, after Bertsekas'
    combined algorithm): each round runs only the current mode's
    sub-round — persons bid in forward mode, free objects bid in
    reverse mode — and the mode flips when the matching cardinality
    increases.  Cardinality never decreases in either mode
    (displacements preserve it), so phases are bounded and the ping-pong
    livelock of naive alternation (forward fills the last hole, reverse
    re-opens it by stealing the winner whose pi just dropped) cannot
    occur.  Both sub-rounds are computed and the inactive one is masked
    to a no-op — under lockstep vmap the work is the same either way.

    **Stalled-phase preemption with exponential backoff**: a single
    mode run to the next cardinality increase is a pure one-directional
    auction, whose ε-war worst case is O(C/ε) rounds — rare but fatal
    without ε-scaling (observed: one 128×128 instance needing ~13k
    reverse rounds while the median instance takes ~150 total).  The
    mode is therefore also flipped after ``stall_k`` consecutive
    no-progress rounds, with ``stall_k`` doubling at each preemption
    and resetting to ``STALL_K0`` on a cardinality increase.  Early
    preemptions give the forward/reverse interplay that breaks price
    wars; the doubling guarantees phase lengths eventually exceed any
    single-mode completion bound, so Bertsekas' termination argument
    still applies (no infinite preemption cycle is possible).

    ε-scaling mirrors ``ops/auction.py:forward_round`` with
    ``keep_valid`` pair retention; on a reduction the kept persons'
    profits are refreshed to the exact max profit at current prices so
    the joint (pi, p) invariant holds at the new ε.
    """
    dtype = s.prices.dtype
    if jnp.issubdtype(dtype, jnp.integer) and not skip_certificate:
        # the integer-auction mode has no fractional ε-ladder; it always
        # starts at the (integer) target ε, where a full assignment is
        # the certificate
        raise ValueError(
            "integer-auction FR rounds require skip_certificate=True"
        )
    prices, profits, p2o, o2p = _forward_sub(
        vals_t, s.prices, s.profits, s.p2o, s.o2p, s.eps,
        s.done | ~s.forward_mode,
    )
    prices, profits, p2o, o2p = _reverse_sub(
        vals_t, prices, profits, p2o, o2p, s.eps,
        s.done | s.forward_mode,
    )
    increased = (
        jnp.sum(p2o != _INT_MAX, dtype=jnp.int32)
        > jnp.sum(s.p2o != _INT_MAX, dtype=jnp.int32)
    )
    stall_flip = ~increased & (s.since_inc + 1 >= s.stall_k) & ~s.done
    forward_mode = s.forward_mode ^ ((increased | stall_flip) & ~s.done)
    # freeze since_inc once done (like every other carried field) so a
    # fixed-length scan over a finished instance is state-identical to
    # the kernel's early exit — pinned by the chunk-boundary test
    since_inc = jnp.where(
        s.done, s.since_inc,
        jnp.where(increased | stall_flip, 0, s.since_inc + 1),
    )
    stall_k = jnp.where(
        increased,
        jnp.int32(STALL_K0),
        jnp.where(stall_flip, s.stall_k * 2, s.stall_k),
    )
    nits = s.nits + (~s.done).astype(jnp.int32)
    num_unassigned = jnp.sum(p2o == _INT_MAX, dtype=jnp.int32)
    fully = (num_unassigned == 0) & ~s.done
    trace_round(
        "fr round {}: unassigned={} forward={} eps={}",
        nits, num_unassigned, forward_mode, s.eps,
    )

    if skip_certificate:
        # caller started at eps == target_eps: every state satisfies
        # ε-CS at the target by construction, so a full assignment IS
        # the certificate — skip the [M, N] certificate passes
        done = s.done | fully | (nits >= max_iterations)
        return FRState(
            prices=prices,
            profits=profits,
            p2o=p2o,
            o2p=o2p,
            eps=s.eps,
            forward_mode=forward_mode,
            since_inc=since_inc,
            stall_k=stall_k,
            nits=nits,
            nreductions=s.nreductions,
            optimal_found=s.optimal_found | fully,
            done=done,
        )

    # certificate at current prices (ops/auction.py:ecs_margins, dense)
    neg_inf = -jnp.inf
    profit = vals_t - prices[:, None]
    max_profit = jnp.max(profit, axis=0)
    j_iota = lax.broadcasted_iota(jnp.int32, vals_t.shape, 0)
    is_chosen = p2o[None, :] == j_iota
    chosen_profit = jnp.max(
        jnp.where(is_chosen, profit, jnp.asarray(neg_inf, profit.dtype)),
        axis=0,
    )
    is_optimal = jnp.all(chosen_profit + toleration >= max_profit - target_eps)
    stop = is_optimal | (s.eps < target_eps)
    reduce = fully & ~stop
    eps = jnp.where(reduce, s.eps * jnp.asarray(scale_factor, dtype), s.eps)

    # keep-valid pair retention at the reduced eps (see forward_round);
    # released persons free their objects, kept/unassigned profits are
    # refreshed to the exact max profit so the (pi, p) invariant holds
    keep = (p2o != _INT_MAX) & (
        chosen_profit + toleration >= max_profit - eps
    )
    release = reduce & ~keep
    release_b = jnp.broadcast_to(release[None, :], vals_t.shape)
    freed = jnp.any(is_chosen & release_b, axis=1)
    p2o = jnp.where(release, _INT_MAX, p2o)
    o2p = jnp.where(reduce & freed, _INT_MAX, o2p)
    profits = jnp.where(
        reduce, max_profit.astype(profits.dtype), profits
    )

    done = s.done | (fully & stop) | (nits >= max_iterations)
    # a fresh ε-phase re-auctions released persons: start in forward
    # mode with a fresh preemption horizon
    forward_mode = forward_mode | reduce
    since_inc = jnp.where(reduce, 0, since_inc)
    stall_k = jnp.where(reduce, jnp.int32(STALL_K0), stall_k)
    return FRState(
        prices=prices,
        profits=profits,
        p2o=p2o,
        o2p=o2p,
        eps=eps,
        forward_mode=forward_mode,
        since_inc=since_inc,
        stall_k=stall_k,
        nits=nits,
        nreductions=s.nreductions + reduce.astype(jnp.int32),
        optimal_found=s.optimal_found | (fully & is_optimal),
        done=done,
    )
