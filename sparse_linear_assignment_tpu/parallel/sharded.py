"""Multi-device sharded auction solve over a `jax.sharding.Mesh`.

The reference is strictly single-threaded (SURVEY.md §2: no parallel or
distributed layer exists to port).  This module is the TPU-idiomatic scale
dimension for single huge instances: persons are sharded across devices
for the bidding phase, objects are sharded for conflict resolution, and
the only cross-device communication is `all_gather` of per-round bid and
winner vectors over ICI — the auction analogue of the one max-type
all-reduce per round that the algorithm fundamentally requires.

Layout (mesh axis ``"shard"`` with D devices; N, M padded to multiples
of D host-side):

- ``row_cols/row_vals/row_mask [K, N]``   sharded on persons (axis 1)
- ``col_persons/col_mask [Kc, M]``        sharded on objects (axis 1)
- ``prices [M]``, ``o2p [M]``             sharded on objects
- ``p2o [N]``, ``dropped [N]``            sharded on persons

Per round each device: gathers full prices, bids for its person shard,
gathers all bids, resolves conflicts for its object shard, gathers the
winner vector, and updates its slices.  Rounds run as host-chunked
fixed-length scans (the same structure as the single-chip drivers; the
TPU backend's compiler cannot handle dynamic while_loop + gather
bodies, docs/PERFORMANCE.md), with one replicated active-count scalar
read back per chunk.

Validated on multi-device CPU meshes (the driver's `dryrun_multichip`
path); multi-chip TPU hardware is not available in this environment, so
ICI-scale measurement is future work.

ICI cost model — per-round collective audit (counted from the traced
jaxprs by ``experiments/exp_collective_audit.py``, pinned by
``tests/test_sharded.py::test_collective_count_audit``):

==================  =======================================  ==========
mode                per ROUND                                per CHUNK
==================  =======================================  ==========
khosla (k-sparse)   5 all_gather ([M]x2+[N]x2+[M]) + 1 psum  1 psum
forward (ε-scaled)  6 all_gather (adds the ε-CS certificate
                    price gather) + 3 psum (unassigned,
                    ε-CS violations, price-divergence)       —
dense FR single     3 pmax + 4 pmin ([N] lane vectors)
                    + 1 psum                                 —
batched (data-par)  ZERO — instances are independent         1 psum
                                                             (all-done)
==================  =======================================  ==========

The batched row is why the multi-chip stream projects ~linear: the
only ICI traffic of the production program is one replicated scalar
psum per chunk dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.auction import top2_profits_arrays
from ..ops.fr_dense import STALL_K0 as _STALL_K0
from ..solution import INDEX_DTYPE, UNASSIGNED, o2p_from_p2o
from ..solver import AuctionSolver
from ..utils.trace import trace_host, trace_round

_INT_MAX = np.int32(UNASSIGNED)  # np scalar: no backend init at import

#: test hook — run the per-chip fused FR kernel inside the sharded
#: batched cores in interpret mode on CPU meshes, where the kernel
#: variant (the real multi-chip program) is otherwise skipped for the
#: XLA rounds
_SHARDED_KERNEL_INTERPRET_ON_CPU = False


def _round_body(
    row_cols, row_vals, row_mask, col_persons, col_mask, eps, threshold, state
):
    """One Jacobi auction round on this device's shards (runs under
    shard_map; axis name "shard")."""
    prices_sh, p2o_sh, o2p_sh, dropped_sh, nits, num_active = state
    axis = "shard"
    d = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    n_local = p2o_sh.shape[0]
    m_local = prices_sh.shape[0]

    # ---- bidding on the local person shard ----
    prices_full = lax.all_gather(prices_sh, axis, tiled=True)  # [M]
    best, second, best_col, best_val = top2_profits_arrays(
        row_cols, row_vals, row_mask, prices_full
    )

    active = (p2o_sh == UNASSIGNED) & ~dropped_sh
    price_at_best = prices_full[best_col]
    drop_now = active & (price_at_best > threshold)
    bidder = active & ~drop_now
    has_second = second != -jnp.inf
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid_l = jnp.where(bidder, raw_bid, -jnp.inf)

    # ---- gather all bids; resolve conflicts on the local object shard ----
    bid_full = lax.all_gather(bid_l, axis, tiled=True)  # [N]
    col_full = lax.all_gather(best_col, axis, tiled=True)  # [N]

    obj_gid = m_local * idx + lax.broadcasted_iota(
        jnp.int32, (col_persons.shape[0], m_local), 1
    )
    inc_bid = bid_full[col_persons]
    inc_tgt = col_full[col_persons]
    is_here = col_mask & (inc_tgt == obj_gid) & (inc_bid != -jnp.inf)
    eff = jnp.where(is_here, inc_bid, -jnp.inf)
    max_bid = jnp.max(eff, axis=0)  # [M/D]
    has_winner = max_bid != -jnp.inf
    cand = jnp.where(
        is_here & (eff >= max_bid[None, :]), col_persons, _INT_MAX
    )
    winner_l = jnp.min(cand, axis=0)

    prices_new = jnp.where(has_winner, max_bid, prices_sh)
    o2p_new = jnp.where(has_winner, winner_l, o2p_sh)

    # ---- gather winners; update the local person shard ----
    winner_full = lax.all_gather(winner_l, axis, tiled=True)  # [M]
    has_winner_full = lax.all_gather(has_winner, axis, tiled=True)

    person_gid = n_local * idx + lax.broadcasted_iota(
        jnp.int32, (n_local,), 0
    )
    safe_tgt = jnp.where(bidder, best_col, 0)
    won = bidder & (winner_full[safe_tgt] == person_gid)
    assigned = p2o_sh != UNASSIGNED
    safe_cur = jnp.where(assigned, p2o_sh, 0)
    displaced = assigned & has_winner_full[safe_cur]
    p2o_new = jnp.where(won, best_col, jnp.where(displaced, _INT_MAX, p2o_sh))

    dropped_new = dropped_sh | drop_now
    num_active_new = lax.psum(
        jnp.sum((p2o_new == UNASSIGNED) & ~dropped_new), axis
    ).astype(jnp.int32)
    del d
    # rounds after the solve completes (fixed-length chunk tail) are
    # no-ops and must not count
    nits_new = nits + (num_active > 0).astype(jnp.int32)
    trace_round(
        "sharded khosla round {} shard {}: active={} dropped(local)={}",
        nits, idx, num_active_new, jnp.sum(drop_now, dtype=jnp.int32),
    )
    return (prices_new, p2o_new, o2p_new, dropped_new, nits_new, num_active_new)


def _sharded_khosla_chunk_shardmap(
    row_cols, row_vals, row_mask, col_persons, col_mask,
    prices, p2o, o2p, dropped, nits, eps, threshold, chunk,
):
    """Per-device chunk of ``chunk`` rounds as a fixed-length scan (the
    host drives the outer loop — dynamic while_loop bodies with gathers
    are a compile hazard on the TPU backend, see docs/PERFORMANCE.md)."""
    num_active = lax.psum(
        jnp.sum((p2o == UNASSIGNED) & ~dropped), "shard"
    ).astype(jnp.int32)
    state = (prices, p2o, o2p, dropped, nits, num_active)

    def body(s, _):
        return (
            _round_body(
                row_cols, row_vals, row_mask, col_persons, col_mask,
                eps, threshold, s,
            ),
            None,
        )

    state, _ = lax.scan(body, state, None, length=chunk)
    prices, p2o, o2p, dropped, nits, num_active = state
    return prices, p2o, o2p, dropped, nits, num_active


@functools.lru_cache(maxsize=8)
def sharded_khosla_core(mesh: Mesh, chunk: int = 16):
    """Build the jitted multi-device chunk program for ``mesh`` (1-D,
    axis ``"shard"``).  Returns a function of the padded sharded arrays
    and the solve state; the host loops it until no bidder is active."""
    axis = mesh.axis_names[0]

    fn = jax.shard_map(
        functools.partial(_sharded_khosla_chunk_shardmap, chunk=chunk),
        mesh=mesh,
        in_specs=(
            P(None, axis),  # row_cols
            P(None, axis),  # row_vals
            P(None, axis),  # row_mask
            P(None, axis),  # col_persons
            P(None, axis),  # col_mask
            P(axis),        # prices
            P(axis),        # p2o
            P(axis),        # o2p
            P(axis),        # dropped
            P(),            # nits
            P(),            # eps
            P(),            # threshold
        ),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
    )
    return jax.jit(fn)


def _pad_to(x, mult: int, axis_i: int) -> np.ndarray:
    """Pad axis ``axis_i`` of ``x`` up to a multiple of ``mult``; always
    returns a host NumPy array so callers can ``device_put`` straight
    onto the mesh without touching the default backend."""
    x = np.asarray(x)
    size = x.shape[axis_i]
    target = ((size + mult - 1) // mult) * mult
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis_i] = (0, target - size)
    return np.pad(x, pad)


def solve_sharded_khosla(
    solver: AuctionSolver,
    mesh: Mesh,
    eps: float | None = None,
    maximize: bool = False,
    max_rounds: int = 10_000_000,
):
    """Solve ``solver``'s current instance sharded over ``mesh``.

    Host-side: applies the reference lifecycle (sign flip, defaults,
    threshold — `ksparse.rs:153-181`), pads persons/objects to multiples
    of the mesh size (padding persons start dropped so they never bid),
    and returns ``(person_to_object, object_to_person, num_unassigned,
    nits, prices)`` with padding stripped.
    """
    from ..ops.padded import build_padded_problem
    from ..solution import AuctionSolution

    d = int(np.prod(mesh.devices.shape))
    solution = AuctionSolution.new()
    solver.validate_input()
    solver.init_solve(solution, maximize)

    num_cols_f = float(solver.num_cols)
    eps = float(eps) if eps is not None else 1.0 / num_cols_f
    values = solver.values
    w_min, w_max = float(values.min()), float(values.max())
    threshold = (num_cols_f / 2.0) * (w_max - w_min + eps)

    problem = build_padded_problem(
        solver.num_rows, solver.num_cols,
        solver.j_counts, solver.column_indices, values,
        dtype=solver.dtype,
    )

    row_cols = _pad_to(problem.row_cols, d, 1)
    row_vals = _pad_to(problem.row_vals, d, 1)
    row_mask = _pad_to(problem.row_mask, d, 1)
    col_persons = _pad_to(problem.col_persons, d, 1)
    col_mask = _pad_to(problem.col_mask, d, 1)
    n_pad = row_cols.shape[1]
    m_pad = col_persons.shape[1]
    dropped_init = np.zeros(n_pad, bool)
    dropped_init[solver.num_rows:] = True  # padding persons never bid

    core = sharded_khosla_core(mesh)
    np_dtype = np.dtype(solver.dtype)
    # commit the problem and state to the mesh once — the host loop
    # re-dispatches the chunk program against the same device buffers
    axis = mesh.axis_names[0]
    row_sharding = NamedSharding(mesh, P(None, axis))
    vec_sharding = NamedSharding(mesh, P(axis))
    row_cols, row_vals, row_mask, col_persons, col_mask = (
        jax.device_put(x, row_sharding)
        for x in (row_cols, row_vals, row_mask, col_persons, col_mask)
    )
    prices = jax.device_put(np.zeros(m_pad, dtype=np_dtype), vec_sharding)
    p2o = jax.device_put(
        np.full(n_pad, UNASSIGNED, dtype=np.int32), vec_sharding
    )
    o2p = jax.device_put(
        np.full(m_pad, UNASSIGNED, dtype=np.int32), vec_sharding
    )
    dropped = jax.device_put(dropped_init, vec_sharding)
    nits = np.int32(0)
    eps_s = np_dtype.type(eps)
    thr_s = np_dtype.type(threshold)
    active = solver.num_rows
    while active > 0 and int(nits) < max_rounds:
        prices, p2o, o2p, dropped, nits, active_dev = core(
            row_cols, row_vals, row_mask, col_persons, col_mask,
            prices, p2o, o2p, dropped, nits, eps_s, thr_s,
        )
        active = int(active_dev)

    p2o = np.asarray(p2o)[: solver.num_rows]
    o2p = np.asarray(o2p)[: solver.num_cols]
    solver.prices = np.asarray(prices, dtype=np.float64)[: solver.num_cols]
    solution.person_to_object = p2o.astype(INDEX_DTYPE)
    solution.object_to_person = o2p.astype(INDEX_DTYPE)
    solution.num_unassigned = int((p2o == UNASSIGNED).sum())
    solution.eps = eps
    return solution, int(nits)


# ----------------------------------------------------------------------
# Sharded ε-scaling forward auction
# ----------------------------------------------------------------------
def _forward_round_body(
    row_cols, row_vals, row_mask, col_persons, col_mask, person_valid,
    target_eps, toleration, sfoe, max_iterations, price_bound, state,
):
    """One forward-auction round on this device's shards, including the
    replicated ε-scaling bookkeeping (TPU re-derivation of the reference
    outer loop, `symmetric.rs:275-332`, over a device mesh).

    Scalar state (eps, counters, done) is computed from `psum`-reduced
    quantities only, so every shard carries identical replicas."""
    (prices_sh, p2o_sh, o2p_sh, eps, nits,
     nreductions, optimal_found, done) = state
    axis = "shard"
    idx = lax.axis_index(axis)
    n_local = p2o_sh.shape[0]
    m_local = prices_sh.shape[0]

    # ---- bidding on the local person shard ----
    prices_full = lax.all_gather(prices_sh, axis, tiled=True)  # [M]
    best, second, best_col, best_val = top2_profits_arrays(
        row_cols, row_vals, row_mask, prices_full
    )

    unassigned = (p2o_sh == UNASSIGNED) & person_valid & ~done
    price_at_best = prices_full[best_col]
    has_second = second != -jnp.inf
    # bid rule `symmetric.rs:378`; single-arc persons bid price+eps (the
    # Khosla guard) instead of +inf — see ops/auction.py:forward_round
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid_l = jnp.where(unassigned & (best != -jnp.inf), raw_bid, -jnp.inf)

    # ---- gather all bids; resolve conflicts on the local object shard ----
    bid_full = lax.all_gather(bid_l, axis, tiled=True)  # [N]
    col_full = lax.all_gather(best_col, axis, tiled=True)  # [N]

    obj_gid = m_local * idx + lax.broadcasted_iota(
        jnp.int32, (col_persons.shape[0], m_local), 1
    )
    inc_bid = bid_full[col_persons]
    inc_tgt = col_full[col_persons]
    is_here = col_mask & (inc_tgt == obj_gid) & (inc_bid != -jnp.inf)
    eff = jnp.where(is_here, inc_bid, -jnp.inf)
    max_bid = jnp.max(eff, axis=0)  # [M/D]
    has_winner = max_bid != -jnp.inf
    cand = jnp.where(
        is_here & (eff >= max_bid[None, :]), col_persons, _INT_MAX
    )
    winner_l = jnp.min(cand, axis=0)

    prices_new = jnp.where(
        has_winner, max_bid.astype(prices_sh.dtype), prices_sh
    )
    o2p_new = jnp.where(has_winner, winner_l, o2p_sh)

    # ---- gather winners; update the local person shard ----
    winner_full = lax.all_gather(winner_l, axis, tiled=True)  # [M]
    has_winner_full = lax.all_gather(has_winner, axis, tiled=True)

    person_gid = n_local * idx + lax.broadcasted_iota(
        jnp.int32, (n_local,), 0
    )
    bidding = bid_l != -jnp.inf
    safe_tgt = jnp.where(bidding, best_col, 0)
    won = bidding & (winner_full[safe_tgt] == person_gid)
    assigned = p2o_sh != UNASSIGNED
    safe_cur = jnp.where(assigned, p2o_sh, 0)
    displaced = assigned & has_winner_full[safe_cur]
    p2o_new = jnp.where(
        won, best_col, jnp.where(displaced, _INT_MAX, p2o_sh)
    )

    nits_new = nits + (~done).astype(jnp.int32)
    num_unassigned = lax.psum(
        jnp.sum((p2o_new == UNASSIGNED) & person_valid, dtype=jnp.int32),
        axis,
    )
    fully = (num_unassigned == 0) & ~done

    # ---- ε-CS certificate at the updated prices (`solver.rs:154-189`,
    # sharded: per-shard violation counts, one psum) ----
    prices_upd = lax.all_gather(prices_new, axis, tiled=True)  # [M]
    profit_upd = jnp.where(
        row_mask, row_vals - prices_upd[row_cols], -jnp.inf
    )
    max_profit = jnp.max(profit_upd, axis=0)
    is_chosen = row_mask & (row_cols == p2o_new[None, :])
    chosen_val = jnp.max(jnp.where(is_chosen, row_vals, -jnp.inf), axis=0)
    safe_j = jnp.where(p2o_new != UNASSIGNED, p2o_new, 0)
    chosen_profit = chosen_val - prices_upd[safe_j]
    viol_l = jnp.sum(
        person_valid
        & (chosen_profit + toleration < max_profit - target_eps),
        dtype=jnp.int32,
    )
    is_optimal = sfoe | (lax.psum(viol_l, axis) == 0)

    # ---- replicated ε-scaling bookkeeping (`symmetric.rs:280-328`) ----
    stop = is_optimal | (eps < target_eps)
    reduce = fully & ~stop
    eps_new = jnp.where(reduce, eps * jnp.asarray(0.15, eps.dtype), eps)
    # reference semantics: reset assignments, keep prices
    p2o_out = jnp.where(reduce, _INT_MAX, p2o_new)
    o2p_out = jnp.where(reduce, _INT_MAX, o2p_new)
    nreductions_new = nreductions + reduce.astype(jnp.int32)
    optimal_new = optimal_found | (fully & is_optimal)
    # infeasibility certificate (same phase-telescoped Bertsekas bound
    # as ops/auction.py:forward_solve_chunked).  Counted over the LOCAL
    # price shard and psum-merged: all_gather outputs are marked
    # varying under shard_map's axis tracking, so a max over
    # prices_full — though replicated in value — cannot feed the
    # invariant `done` carry; the scalar psum keeps it provably
    # replicated (+1 psum/round, see the collective audit).
    diverged = lax.psum(
        jnp.sum(prices_new > price_bound, dtype=jnp.int32), axis
    ) > 0
    done_new = (
        done | (fully & stop) | diverged | (nits_new >= max_iterations)
    )
    trace_round(
        "sharded forward round {} shard {}: eps={} reductions={} done={}",
        nits_new, idx, eps_new, nreductions_new, done_new,
    )
    return (
        prices_new, p2o_out, o2p_out, eps_new, nits_new,
        nreductions_new, optimal_new, done_new,
    )


def _sharded_forward_chunk_shardmap(
    row_cols, row_vals, row_mask, col_persons, col_mask, person_valid,
    prices, p2o, o2p, eps, nits, nreductions, optimal_found, done,
    target_eps, toleration, sfoe, max_iterations, price_bound, chunk,
):
    state = (prices, p2o, o2p, eps, nits, nreductions, optimal_found, done)

    def body(s, _):
        return (
            _forward_round_body(
                row_cols, row_vals, row_mask, col_persons, col_mask,
                person_valid, target_eps, toleration, sfoe,
                max_iterations, price_bound, s,
            ),
            None,
        )

    state, _ = lax.scan(body, state, None, length=chunk)
    return state


@functools.lru_cache(maxsize=8)
def sharded_forward_core(mesh: Mesh, chunk: int = 16):
    """Build the jitted multi-device forward-auction chunk program for
    ``mesh`` (1-D, axis ``"shard"``)."""
    axis = mesh.axis_names[0]

    fn = jax.shard_map(
        functools.partial(_sharded_forward_chunk_shardmap, chunk=chunk),
        mesh=mesh,
        in_specs=(
            P(None, axis),  # row_cols
            P(None, axis),  # row_vals
            P(None, axis),  # row_mask
            P(None, axis),  # col_persons
            P(None, axis),  # col_mask
            P(axis),        # person_valid
            P(axis),        # prices
            P(axis),        # p2o
            P(axis),        # o2p
            P(),            # eps
            P(),            # nits
            P(),            # nreductions
            P(),            # optimal_found
            P(),            # done
            P(),            # target_eps
            P(),            # toleration
            P(),            # sfoe
            P(),            # max_iterations
            P(),            # price_bound
        ),
        out_specs=(
            P(axis), P(axis), P(axis), P(), P(), P(), P(), P(),
        ),
    )
    return jax.jit(fn)


def solve_sharded_forward(
    solver: AuctionSolver,
    mesh: Mesh,
    eps: float | None = None,
    maximize: bool = False,
    start_eps: float | None = None,
    max_iterations: int = 100_000,
):
    """Solve ``solver``'s current instance with the ε-scaling forward
    auction sharded over ``mesh``.

    Semantics match the single-device chunked solver (`symmetric.py`):
    target eps defaults to ``1/num_rows`` (`symmetric.rs:231-235`), start
    eps to ``C/2`` on symmetric instances, asymmetric instances disable
    scaling (`symmetric.rs:256-267`), ``max_iterations`` cuts off
    infeasible instances.  Returns ``(solution, nits)``; the solver's
    ``nreductions`` / ``optimal_soln_found`` attributes are set when
    present.
    """
    from ..ops.padded import build_padded_problem
    from ..solution import AuctionSolution

    d = int(np.prod(mesh.devices.shape))
    solution = AuctionSolution.new()
    solver.validate_input()
    solver.init_solve(solution, maximize)

    target_eps = (
        float(eps) if eps is not None else 1.0 / float(solver.num_rows)
    )
    values = solver.values
    c = float(np.abs(values).max()) if values.size else 0.0
    toleration = solver.get_toleration(c)
    sfoe = start_eps is not None and start_eps < target_eps
    if solver.num_rows != solver.num_cols:
        sfoe = True
        eps0 = target_eps - float(np.finfo(np.float64).eps)
    else:
        eps0 = float(start_eps) if start_eps is not None else c / 2.0

    problem = build_padded_problem(
        solver.num_rows, solver.num_cols,
        solver.j_counts, solver.column_indices, values,
        dtype=solver.dtype,
    )
    row_cols = _pad_to(problem.row_cols, d, 1)
    row_vals = _pad_to(problem.row_vals, d, 1)
    row_mask = _pad_to(problem.row_mask, d, 1)
    col_persons = _pad_to(problem.col_persons, d, 1)
    col_mask = _pad_to(problem.col_mask, d, 1)
    n_pad = row_cols.shape[1]
    m_pad = col_persons.shape[1]
    person_valid_h = np.zeros(n_pad, bool)
    person_valid_h[: solver.num_rows] = True

    core = sharded_forward_core(mesh)
    np_dtype = np.dtype(solver.dtype)
    axis = mesh.axis_names[0]
    row_sharding = NamedSharding(mesh, P(None, axis))
    vec_sharding = NamedSharding(mesh, P(axis))
    row_cols, row_vals, row_mask, col_persons, col_mask = (
        jax.device_put(x, row_sharding)
        for x in (row_cols, row_vals, row_mask, col_persons, col_mask)
    )
    person_valid = jax.device_put(person_valid_h, vec_sharding)
    prices = jax.device_put(np.zeros(m_pad, dtype=np_dtype), vec_sharding)
    p2o = jax.device_put(
        np.full(n_pad, UNASSIGNED, dtype=np.int32), vec_sharding
    )
    o2p = jax.device_put(
        np.full(m_pad, UNASSIGNED, dtype=np.int32), vec_sharding
    )
    eps_s = jnp.asarray(np_dtype.type(eps0))
    nits = jnp.asarray(np.int32(0))
    nreductions = jnp.asarray(np.int32(0))
    optimal_found = jnp.asarray(False)
    done = jnp.asarray(False)
    target_s = np_dtype.type(target_eps)
    tol_s = np_dtype.type(toleration)
    sfoe_s = np.bool_(sfoe)
    maxit_s = np.int32(max_iterations)
    # infeasibility certificate: the same phase-telescoped Bertsekas
    # bound as ops/auction.py:forward_solve_chunked (start prices 0)
    eps_hi = max(eps0, target_eps)
    ratio = eps0 / max(target_eps, 1e-300)
    phases = (
        1 if ratio <= 1.0
        else int(np.ceil(np.log2(max(ratio, 2.0)))) + 1
    )
    bound_s = np_dtype.type(
        (phases + 1) * (2 * solver.num_rows + 1) * (c + eps_hi) + 1.0
    )

    while not bool(done):
        (prices, p2o, o2p, eps_s, nits,
         nreductions, optimal_found, done) = core(
            row_cols, row_vals, row_mask, col_persons, col_mask,
            person_valid, prices, p2o, o2p, eps_s, nits,
            nreductions, optimal_found, done,
            target_s, tol_s, sfoe_s, maxit_s, bound_s,
        )

    p2o = np.asarray(p2o)[: solver.num_rows]
    o2p = np.asarray(o2p)[: solver.num_cols]
    solver.prices = np.asarray(prices, dtype=np.float64)[: solver.num_cols]
    solution.person_to_object = p2o.astype(INDEX_DTYPE)
    solution.object_to_person = o2p.astype(INDEX_DTYPE)
    solution.num_unassigned = int((p2o == UNASSIGNED).sum())
    solution.eps = float(eps_s)
    if hasattr(solver, "nreductions"):
        solver.nreductions = int(nreductions)
    if hasattr(solver, "optimal_soln_found"):
        solver.optimal_soln_found = bool(optimal_found)
    if hasattr(solver, "nits"):
        solver.nits = int(nits)
    return solution, int(nits)


# ----------------------------------------------------------------------
# Sharded single-instance dense forward-reverse auction
# ----------------------------------------------------------------------
def _merge_top2_sharded(axis, lbest, lsecond, larg):
    """Merge device-local per-person top-2 results into the global
    (best, second, arg) with pmax/pmin collectives (invariant outputs —
    the replicated person-side state must stay provably replicated
    under shard_map's varying-axes checking).  Devices hold contiguous
    ascending object rows, so taking the minimum device index on ties
    (then the device's own min-row arg) reproduces the single-device
    smallest-row determinism rule exactly."""
    d = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    gbest = lax.pmax(lbest, axis)                              # [N]
    dstar = lax.pmin(
        jnp.where(lbest == gbest, idx, jnp.int32(d)), axis
    )
    mine = dstar == idx
    # the selected device contributes its second; every other device's
    # best is a second-place candidate (equal maxima land here too)
    gsecond = lax.pmax(jnp.where(mine, lsecond, lbest), axis)
    garg = lax.pmin(jnp.where(mine, larg, _INT_MAX), axis)
    return gbest, gsecond, garg


def _merge_max_sharded(axis, lmax, larg):
    """Merge device-local per-person (max, argmin-row) pairs."""
    d = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    gmax = lax.pmax(lmax, axis)
    dstar = lax.pmin(
        jnp.where(lmax == gmax, idx, jnp.int32(d)), axis
    )
    garg = lax.pmin(
        jnp.where(dstar == idx, larg, _INT_MAX), axis
    )
    return gmax, garg


def _fr_round_sharded(vals_l, state):
    """One forward-reverse round with the object dimension sharded.

    ``vals_l [M/D, N]`` is this device's row slice; prices/o2p are
    sharded with it; pi/p2o and all scalars are replicated.  Math is
    identical to ``ops/fr_dense.fr_round`` (skip_certificate mode) —
    the only collectives are all_gathers of [N] lane vectors for the
    cross-shard top-2 / winner merges and one psum of the coded
    won/displaced reduction.  Pinned bit-exact against the XLA rounds
    by ``tests/test_sharded.py``."""
    (prices_l, o2p_l, pi, p2o, forward_mode, done, nits, since,
     stall_k, eps) = state
    axis = "shard"
    idx = lax.axis_index(axis)
    ml, n = vals_l.shape
    dtype = vals_l.dtype
    neg_inf = dtype.type(-np.inf)

    card_old = jnp.sum((p2o != _INT_MAX).astype(jnp.float32))

    r_local = lax.broadcasted_iota(jnp.int32, (ml, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (ml, n), 1)
    r_global = r_local + idx * jnp.int32(ml)

    def fwd(operand):
        prices_l, o2p_l, pi, p2o, eps = operand
        profit = vals_l - prices_l[:, None]
        lbest = jnp.max(profit, axis=0)                        # [N]
        lr = jnp.min(
            jnp.where(profit == lbest[None, :], r_local, jnp.int32(ml)),
            axis=0,
        )
        lsel = r_local == lr[None, :]
        lsecond = jnp.max(jnp.where(lsel, neg_inf, profit), axis=0)
        larg = lr + idx * jnp.int32(ml)
        best, second, best_j = _merge_top2_sharded(
            axis, lbest, lsecond, larg
        )

        floor = jnp.where(second != neg_inf, second, best)
        bidding = (p2o == _INT_MAX) & (best != neg_inf)
        inc = jnp.where(bidding, best - floor + eps, neg_inf)

        local_j = best_j - idx * jnp.int32(ml)                 # [N]
        is_here = (local_j[None, :] == r_local) & (inc[None, :] != neg_inf)
        eff = jnp.where(is_here, inc[None, :], neg_inf)
        max_inc = jnp.max(eff, axis=1)                         # [M/D]
        has_winner = max_inc != neg_inf
        cand = jnp.where(
            is_here & (eff >= max_inc[:, None]), u_iota, _INT_MAX
        )
        winner = jnp.min(cand, axis=1)

        prices_l = jnp.where(has_winner, prices_l + max_inc, prices_l)
        o2p_l = jnp.where(has_winner, winner, o2p_l)

        t_won = is_here & (winner[:, None] == u_iota)
        t_disp = (p2o[None, :] == r_global) & has_winner[:, None]
        code = lax.psum(
            jnp.sum(
                t_won.astype(jnp.float32)
                + jnp.float32(2.0) * t_disp.astype(jnp.float32),
                axis=0,
            ),
            axis,
        )                                                      # [N]
        won = (code == 1.0) | (code == 3.0)
        displaced = (p2o != _INT_MAX) & (code >= 2.0)
        p2o = jnp.where(won, best_j, jnp.where(displaced, _INT_MAX, p2o))
        pi = jnp.where(won, (floor - eps).astype(pi.dtype), pi)
        return prices_l, o2p_l, pi, p2o, eps

    def rev(operand):
        prices_l, o2p_l, pi, p2o, eps = operand
        rprof = vals_l - pi[None, :]
        beta = jnp.max(rprof, axis=1)                          # [M/D]
        best_i = jnp.min(
            jnp.where(rprof == beta[:, None], u_iota, jnp.int32(n)),
            axis=1,
        )
        rsel = u_iota == best_i[:, None]
        gamma = jnp.max(jnp.where(rsel, neg_inf, rprof), axis=1)
        rfloor = jnp.where(gamma != neg_inf, gamma, beta)
        pi_inc = beta - rfloor + eps

        free = o2p_l == _INT_MAX
        bidding = free & (beta != neg_inf)
        rinc = jnp.where(bidding, pi_inc, neg_inf)

        is_here = rsel & bidding[:, None]
        eff = jnp.where(is_here, rinc[:, None], neg_inf)
        lmax = jnp.max(eff, axis=0)                            # [N]
        larg = jnp.min(
            jnp.where(is_here & (eff >= lmax[None, :]), r_global, _INT_MAX),
            axis=0,
        )
        max_inc, winner_obj = _merge_max_sharded(axis, lmax, larg)
        has_rw = max_inc != neg_inf

        t_won = is_here & (winner_obj[None, :] == r_global)
        is_disp = has_rw & (p2o != _INT_MAX)
        t_freed = (p2o[None, :] == r_global) & is_disp[None, :]
        code = jnp.sum(
            t_won.astype(jnp.float32)
            + jnp.float32(2.0) * t_freed.astype(jnp.float32),
            axis=1,
        )                                                      # [M/D]
        won_obj = (code == 1.0) | (code == 3.0)
        freed = code >= 2.0
        prices_l = jnp.where(
            won_obj, (rfloor - eps).astype(prices_l.dtype), prices_l
        )
        o2p_l = jnp.where(
            won_obj, best_i, jnp.where(freed, _INT_MAX, o2p_l)
        )
        pi = jnp.where(has_rw, pi + max_inc.astype(pi.dtype), pi)
        p2o = jnp.where(has_rw, winner_obj, p2o)
        return prices_l, o2p_l, pi, p2o, eps

    def masked(sub):
        """Run one sub-round; a done instance's state is an identity
        (same masking rule as fr_round, scalar done)."""

        def run(op):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(done, a, b), op, sub(op)
            )

        return run

    active = ~done
    prices_l, o2p_l, pi, p2o, _ = lax.cond(
        forward_mode,
        masked(fwd),
        masked(rev),
        (prices_l, o2p_l, pi, p2o, eps),
    )

    card_new = jnp.sum((p2o != _INT_MAX).astype(jnp.float32))
    increased = card_new > card_old
    stall_flip = ~increased & (since + 1 >= stall_k) & active
    forward_mode = forward_mode ^ ((increased | stall_flip) & active)
    since = jnp.where(increased | stall_flip, jnp.int32(0), since + 1)
    stall_k = jnp.where(
        increased,
        jnp.int32(_STALL_K0),
        jnp.where(stall_flip, stall_k * 2, stall_k),
    )
    nits = nits + active.astype(jnp.int32)
    done = done | (card_new == jnp.float32(p2o.shape[0]))
    trace_round(
        "sharded fr round {} shard {}: matched={} forward={} done={}",
        nits, idx, card_new, forward_mode, done,
    )
    return (
        prices_l, o2p_l, pi, p2o, forward_mode, done, nits, since,
        stall_k, eps,
    )


def _fr_dense_chunk_shardmap(
    vals_l, prices, o2p, pi, p2o, forward_mode, done, nits, since,
    stall_k, eps, chunk,
):
    state = (
        prices, o2p, pi, p2o, forward_mode, done, nits, since, stall_k,
        eps,
    )

    def body(s, _):
        return _fr_round_sharded(vals_l, s), None

    state, _ = lax.scan(body, state, None, length=chunk)
    return state


@functools.lru_cache(maxsize=8)
def sharded_fr_dense_core(mesh: Mesh, chunk: int = 64):
    """Jitted multi-device chunk program for one dense instance with the
    object dimension sharded (1-D mesh, axis ``"shard"``)."""
    axis = mesh.axis_names[0]

    fn = jax.shard_map(
        functools.partial(_fr_dense_chunk_shardmap, chunk=chunk),
        mesh=mesh,
        in_specs=(
            P(axis, None),  # vals_l [M, N] sharded on objects
            P(axis),        # prices
            P(axis),        # o2p
            P(),            # pi
            P(),            # p2o
            P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(
            P(axis), P(axis), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
    )
    return jax.jit(fn)


def solve_fr_dense_sharded(
    costs,
    mesh: Mesh,
    maximize: bool = False,
    eps: float | None = None,
    dtype=np.float32,
    max_iterations: int = 1_000_000,
    chunk: int = 64,
):
    """Solve one dense symmetric instance ``costs[N, N]`` with the
    forward-reverse auction, objects sharded over ``mesh``.

    The multi-device form of the big-single dense path
    (`batch.py` use_big / `ops/pallas_fr_big.py`): each device owns a
    contiguous slice of object rows; per round the only cross-device
    traffic is all_gathers of [N] lane vectors (top-2 / winner merges)
    and one psum of the coded won/displaced reduction — a handful of
    N-vectors over ICI against O(N²/D) local compute.  No ε-ladder
    (start ε == target ε — the ladder livelocks FR,
    docs/PERFORMANCE.md), so a full assignment is the certificate.
    Returns ``(p2o, o2p, num_unassigned, nits, objective)``.
    """
    costs = np.asarray(costs)
    n, m = costs.shape
    if n != m:
        raise ValueError("solve_fr_dense_sharded requires a square instance")
    d = int(np.prod(mesh.devices.shape))
    work = costs if maximize else -costs
    vals_t = np.swapaxes(work.astype(dtype), 0, 1)  # [M, N]
    m_pad = ((m + d - 1) // d) * d
    if m_pad != m:
        # padded object rows have -inf value: they never win a bid and
        # never bid in reverse (beta = -inf)
        vals_t = np.concatenate(
            [vals_t, np.full((m_pad - m, n), -np.inf, dtype)], axis=0
        )

    np_dtype = np.dtype(dtype)
    target_eps = np_dtype.type(
        float(eps) if eps is not None else 1.0 / (n + 1)
    )
    axis = mesh.axis_names[0]
    row_sh = NamedSharding(mesh, P(axis, None))
    vec_sh = NamedSharding(mesh, P(axis))
    rep_sh = NamedSharding(mesh, P())
    vals_dev = jax.device_put(vals_t, row_sh)
    prices = jax.device_put(np.zeros(m_pad, np_dtype), vec_sh)
    o2p = jax.device_put(np.full(m_pad, UNASSIGNED, np.int32), vec_sh)
    pi = jax.device_put(
        np.max(vals_t, axis=0).astype(np_dtype), rep_sh
    )
    p2o = jax.device_put(np.full(n, UNASSIGNED, np.int32), rep_sh)
    forward_mode = jnp.asarray(True)
    done = jnp.asarray(False)
    nits = jnp.asarray(np.int32(0))
    since = jnp.asarray(np.int32(0))
    stall_k = jnp.asarray(np.int32(_STALL_K0))
    eps_s = jnp.asarray(target_eps)

    core = sharded_fr_dense_core(mesh, chunk)
    rounds = 0
    while True:
        (prices, o2p, pi, p2o, forward_mode, done, nits, since,
         stall_k, eps_s) = core(
            vals_dev, prices, o2p, pi, p2o, forward_mode, done, nits,
            since, stall_k, eps_s,
        )
        rounds += chunk
        if bool(done) or rounds >= max_iterations:
            break

    p2o_h = np.asarray(p2o)
    o2p_h = np.asarray(o2p)[:m]
    assigned = p2o_h != UNASSIGNED
    safe = np.where(assigned, p2o_h, 0)
    objective = float(
        np.where(assigned, costs[np.arange(n), safe], 0.0).sum()
    )
    num_unassigned = int((~assigned).sum())
    return p2o_h, o2p_h, num_unassigned, int(nits), objective


# ----------------------------------------------------------------------
# Sharded batched solve (data parallelism over independent instances)
# ----------------------------------------------------------------------
def _fr_batch_chunk_local(values_t, states, target_eps, max_iterations,
                          chunk: int, use_kernel: bool,
                          sched: int | None = None,
                          interpret: bool = False):
    """Per-device chunk of forward-reverse rounds over the local batch
    slice (instances are independent — the only collective is the
    replicated all-done flag).  ``use_kernel`` runs the fused VMEM-
    resident multi-round kernel (ops/pallas_fr.py) on each device's
    slice — the same per-chip program as the single-chip fast path, so
    an 8-chip mesh scales its inst/s ~linearly; the XLA rounds remain
    for CPU meshes and unsupported shapes.  ``sched`` (a deep round
    budget) runs the single-chip one-dispatch protocol on each local
    slice."""
    if use_kernel:
        from ..ops.pallas_fr import fr_chunk_pallas

        # the single-chip fused multi-round kernel on the local slice;
        # finished instances leave their grid step early, so the large
        # budget costs only the stragglers' rounds
        if sched is not None:
            states, _ = fr_chunk_pallas(
                values_t, states, sched, interpret=interpret
            )
        else:
            states, _ = fr_chunk_pallas(
                values_t, states, chunk, interpret=interpret
            )
    else:
        from ..ops.fr_dense import fr_round

        def one(vals_t, state):
            def body(s, _):
                return (
                    fr_round(
                        vals_t, s, target_eps,
                        jnp.asarray(0.0, vals_t.dtype),
                        max_iterations, skip_certificate=True,
                    ),
                    None,
                )

            state, _ = lax.scan(body, state, None, length=chunk)
            return state

        states = jax.vmap(one)(values_t, states)
    local_undone = jnp.sum((~states.done).astype(jnp.int32))
    undone = lax.psum(local_undone, "shard")
    return states, undone


@functools.lru_cache(maxsize=8)
def sharded_fr_batch_core(mesh: Mesh, chunk: int = 64,
                          use_kernel: bool = False,
                          sched: int | None = None,
                          interpret: bool = False):
    """Jitted multi-device batched forward-reverse chunk program: the
    batch dimension is sharded across the mesh, everything else is
    local.  This is the scaling dimension for batched throughput — an
    8-device mesh runs 8× the instances per chunk with zero cross-chip
    traffic beyond the done-count psum."""
    axis = mesh.axis_names[0]
    bspec = P(axis)

    fn = jax.shard_map(
        functools.partial(
            _fr_batch_chunk_local, chunk=chunk, use_kernel=use_kernel,
            sched=sched, interpret=interpret,
        ),
        mesh=mesh,
        # a single spec acts as a pytree prefix for the FRState arg
        in_specs=(bspec, bspec, P(), P()),
        out_specs=(bspec, P()),
        # pallas_call's out_shapes carry no varying-axes info, which
        # trips the checker when the kernel path runs inside shard_map;
        # this core is batch-data-parallel with one psum — safe
        check_vma=False,
    )
    return jax.jit(fn)


def _stage_values_t_sharded(costs_dev, negate: bool, b_pad: int,
                            scale: int = 0):
    """Device-side staging: sign-adjust, transpose to [B, M, N] and pad
    the batch with copies of instance 0 — one compiled program instead
    of host-side work inside the timed region.  ``scale`` != 0 lifts
    integral costs onto the scaled-int32 lattice (the integer-auction
    mode, ``batch._integer_scale``); the multiply runs in int32 so no
    f32 mantissa limit applies."""
    if scale:
        x = jnp.round(costs_dev).astype(jnp.int32) * jnp.int32(scale)
    else:
        x = costs_dev
    x = -x if negate else x
    b = x.shape[0]
    if b_pad != b:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (b_pad - b,) + x.shape[1:])]
        )
    return jnp.swapaxes(x, 1, 2)


@functools.lru_cache(maxsize=16)
def _staging_core(bsh, negate: bool, b_pad: int, scale: int = 0):
    """Cached jit wrapper for the sharded staging program — building a
    fresh jax.jit object per call would re-trace every staged solve."""
    return jax.jit(
        functools.partial(
            _stage_values_t_sharded, negate=negate, b_pad=b_pad,
            scale=scale,
        ),
        out_shardings=bsh,
    )


def solve_batch_sharded(
    costs,
    mesh: Mesh,
    maximize: bool = False,
    eps: float | None = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
    chunk: int = 64,
    costs_device=None,
    integer: bool | None = None,
    max_cost: float | None = None,
):
    """Solve a batch of dense symmetric LAP instances ``costs[B, N, N]``
    sharded over ``mesh`` (forward-reverse engine, no ε-ladder).

    Pure data parallelism: instances never communicate; each device
    runs lockstep rounds over its local slice (the fused multi-round
    kernel when the shape fits VMEM — the same per-chip program as the
    single-chip fast path).  ``B`` is padded to a multiple of the mesh
    size with copies of instance 0 (their results are dropped).
    ``costs_device`` optionally supplies a pre-staged device copy of
    the cost tensor (the criterion ``iter_batched`` protocol — staging
    excluded from the timed region, as in ``batch.solve_batch``).
    ``integer``/``max_cost``: the integer-auction mode of
    ``batch.solve_batch`` (scaled-int32 lattice with exact packed
    selection keys in the per-chip kernel; auto-detected on integral
    costs, ``integer=False`` opts out).
    Returns a :class:`~..batch.BatchSolution`.
    """
    from ..batch import (
        BatchSolution,
        _fr_batch_init,
        _fr_pack_results,
        _integer_scale,
    )

    costs = np.asarray(costs)
    b, n, m = costs.shape
    if n != m:
        raise ValueError("solve_batch_sharded requires square instances")
    d = int(np.prod(mesh.devices.shape))
    b_pad = ((b + d - 1) // d) * d

    int_scale = _integer_scale(costs, eps, n, m, integer, max_cost)
    if int_scale is not None:
        dtype = np.int32
        target_eps = np.int32(1)
    else:
        target_eps = np.dtype(dtype).type(
            float(eps) if eps is not None else 1.0 / n
        )
    axis = mesh.axis_names[0]
    bsh = NamedSharding(mesh, P(axis))
    if costs_device is None:
        if int_scale is not None:
            work = np.rint(costs).astype(np.int32) * np.int32(int_scale)
        else:
            work = costs.astype(dtype)
        if not maximize:
            work = -work
        if b_pad != b:
            work = np.concatenate(
                [work, np.repeat(work[:1], b_pad - b, axis=0)],
                axis=0,
            )
        values_t = jax.device_put(
            np.ascontiguousarray(np.swapaxes(work, 1, 2)), bsh
        )
    else:
        values_t = _staging_core(
            bsh, not maximize, b_pad, int_scale or 0
        )(costs_device if int_scale is not None
          else costs_device.astype(dtype))
    # on-device state init sharded like the values (one program, no
    # per-array host uploads)
    states = _fr_batch_init(
        values_t, jnp.full(b_pad, target_eps, dtype)
    )

    # same per-chip program as the single-chip fast path when the shape
    # fits the VMEM-resident kernel (batch._solve_batch_fr's use_pallas)
    kern_interp = (
        _SHARDED_KERNEL_INTERPRET_ON_CPU
        and jax.default_backend() == "cpu"
    )
    use_kernel = bool(
        np.dtype(dtype) in (np.float32, np.int32)
        and n % 128 == 0
        and m % 8 == 0
        and n * m <= 1024 * 1024
        and (jax.default_backend() not in ("cpu",) or kern_interp)
    )
    sched = None
    if use_kernel:
        # one-dispatch protocol (batch._solve_batch_fr fast path): the
        # deep round budget runs per device slice in ONE dispatch, then
        # rare extra chunk dispatches mop up any survivors
        from ..batch import _fr_fused_schedule

        sched = _fr_fused_schedule(b_pad // d, n, max_iterations)
        chunk = 128
    core = sharded_fr_batch_core(mesh, chunk, use_kernel,
                                 interpret=kern_interp)
    maxit = jnp.asarray(np.int32(max_iterations))
    rounds = 0
    if sched is not None:
        fused_core = sharded_fr_batch_core(mesh, chunk, True, sched,
                                           interpret=kern_interp)
        states, undone = fused_core(values_t, states, target_eps, maxit)
        rounds += sched
    else:
        states, undone = core(values_t, states, target_eps, maxit)
        rounds += chunk
    while int(undone) != 0 and rounds < max_iterations:
        states, undone = core(values_t, states, target_eps, maxit)
        rounds += chunk

    # ONE packed readback (u16-packed p2o | nits | done) — per-array
    # readbacks each pay the tunnel's ~240 ms latency.  The u16 wire
    # format needs even N < 2**16 (two indices per int32 word); other
    # square shapes read back plain int32, still in one transfer.
    from ..batch import _fr_pack_results_i32, _unpack_p2o_u16

    if n % 2 == 0 and n < (1 << 16):
        packed = np.asarray(_fr_pack_results(states))
        half = n // 2
        p2o = _unpack_p2o_u16(packed[:b, :half], n)
        nits = packed[:b, half]
    else:
        packed = np.asarray(_fr_pack_results_i32(states))
        p2o = packed[:b, :n]
        nits = packed[:b, n]
    assigned = p2o != UNASSIGNED
    o2p = o2p_from_p2o(p2o, m)
    safe = np.where(assigned, p2o, 0)
    costs64 = costs if costs.dtype == np.float64 else costs.astype(
        np.float64
    )
    picked = np.take_along_axis(
        costs64, safe[:, :, None], axis=2
    )[:, :, 0]
    objective = np.where(assigned, picked, 0.0).sum(axis=1)
    return BatchSolution(
        person_to_object=p2o,
        object_to_person=o2p,
        num_unassigned=(~assigned).sum(axis=1).astype(np.int32),
        objective=objective,
        # lattice ε = 1 corresponds to 1/scale in original cost units
        eps=np.full(
            b,
            1.0 / int_scale if int_scale is not None else float(target_eps),
        ),
        nits=nits,
    )


def solve_batch_sharded_stream(
    device_batches,
    mesh: Mesh,
    maximize: bool = False,
    eps: float | None = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
    integer: bool | None = None,
    max_cost: float | None = None,
    window: int = 2,
):
    """Pipelined device-resident batched solves over a device mesh —
    the multi-chip sustained-throughput mode (``batch.
    solve_batch_stream`` with the batch dimension sharded across
    ``mesh``; the projected path past the 10k inst/s north star, which
    the measured single-chip round floor of ~0.66 µs/instance-round
    puts out of single-chip reach).

    Each batch runs the per-device fused schedule (main budget +
    two-level undone-first continuation) in ONE sharded dispatch with
    zero cross-chip traffic beyond the done-count psum; up to
    ``window`` batches are in flight so the gathered packed-result
    readback of batch *i* overlaps the mesh's compute of batch *i+1*.
    The objective is evaluated on device (original units); results
    return in input order as ``list[BatchSolution]``.

    On meshes without the fused kernel (CPU backend, non-tile shapes)
    each batch falls back to the lockstep XLA rounds with per-chunk
    done checks — correct, but the pipelining degrades (the done
    checks are blocking syncs).
    """
    from ..batch import (
        BatchSolution,
        _fr_batch_init,
        _fr_fused_schedule,
        _fr_pack_results_with_objective,
        _integer_scale,
        _unpack_p2o_u16,
    )

    device_batches = list(device_batches)
    if not device_batches:
        return []
    b, n, m = device_batches[0].shape
    for x in device_batches[1:]:
        if x.shape != (b, n, m):
            raise ValueError("all batches must share one shape")
    if n != m:
        raise ValueError(
            "solve_batch_sharded_stream requires square instances"
        )
    d = int(np.prod(mesh.devices.shape))
    b_pad = ((b + d - 1) // d) * d

    int_scale = _integer_scale(None, eps, n, m, integer, max_cost)
    if int_scale is not None:
        dtype = np.int32
        target_eps = np.int32(1)
        out_eps = 1.0 / int_scale
    else:
        target_eps = np.dtype(dtype).type(
            float(eps) if eps is not None else 1.0 / n
        )
        out_eps = float(target_eps)
    axis = mesh.axis_names[0]
    bsh = NamedSharding(mesh, P(axis))
    negate = not maximize
    kern_interp = (
        _SHARDED_KERNEL_INTERPRET_ON_CPU
        and jax.default_backend() == "cpu"
    )
    use_kernel = bool(
        np.dtype(dtype) in (np.float32, np.int32)
        and n % 128 == 0
        and m % 8 == 0
        and n * m <= 1024 * 1024
        and (jax.default_backend() not in ("cpu",) or kern_interp)
    )
    chunk = 128
    core = sharded_fr_batch_core(mesh, chunk, use_kernel,
                                 interpret=kern_interp)
    if use_kernel:
        sched = _fr_fused_schedule(b_pad // d, n, max_iterations)
        fused_core = sharded_fr_batch_core(mesh, chunk, True, sched,
                                           interpret=kern_interp)
    maxit = jnp.asarray(np.int32(max_iterations))
    stage = _staging_core(bsh, negate, b_pad, int_scale or 0)
    # u16 wire format needs even N < 2**16; other square shapes (the
    # non-kernel fallback regime) read back plain int32 indices
    u16 = n % 2 == 0 and n < (1 << 16)
    half = n // 2 if u16 else n

    def dispatch(dev):
        dev = jnp.asarray(dev)
        vt = stage(dev if int_scale is not None else dev.astype(dtype))
        st = _fr_batch_init(vt, jnp.full(b_pad, target_eps, dtype))
        if use_kernel:
            st, _ = fused_core(vt, st, target_eps, maxit)
            rounds = sched
        else:
            st, undone = core(vt, st, target_eps, maxit)
            rounds = chunk
            while int(undone) != 0 and rounds < max_iterations:
                st, undone = core(vt, st, target_eps, maxit)
                rounds += chunk
        packed_dev = _fr_pack_results_with_objective(st, vt, negate, u16)
        return vt, st, packed_dev, rounds

    def finish(vt, st, packed_dev, rounds):
        while True:
            packed = np.asarray(packed_dev)  # gathers from all devices
            undone = int(b_pad - (packed[:, half + 1] != 0).sum())
            trace_host(
                "fr sharded stream: rounds={} undone={}/{}",
                rounds, undone, b_pad,
            )
            if undone == 0 or rounds >= max_iterations:
                break
            st, _ = core(vt, st, target_eps, maxit)
            rounds += chunk
            packed_dev = _fr_pack_results_with_objective(
                st, vt, negate, u16
            )
        if u16:
            p2o = _unpack_p2o_u16(packed[:b, :half], n)
        else:
            p2o = packed[:b, :n]
        words = np.ascontiguousarray(
            packed[:b, half + 2:half + 4]
        ).view(np.float32)
        objective = words[:, 0].astype(np.float64) + words[:, 1]
        if int_scale is not None:
            objective = objective / int_scale
        return BatchSolution(
            person_to_object=p2o,
            object_to_person=o2p_from_p2o(p2o, m),
            num_unassigned=(p2o == UNASSIGNED).sum(axis=1).astype(
                np.int32
            ),
            objective=objective,
            eps=np.full(b, out_eps),
            nits=packed[:b, half].astype(np.int32),
        )

    from collections import deque

    results: list = []
    pending: deque = deque()
    for dev in device_batches:
        pending.append(dispatch(dev))
        # drain at window so at most `window` staged batches are ever
        # live (the documented device-memory bound); window >= 2 keeps
        # the oldest batch's readback overlapped with the mesh compute
        while len(pending) >= max(1, window):
            results.append(finish(*pending.popleft()))
    while pending:
        results.append(finish(*pending.popleft()))
    return results


def _ksp_batch_local(columns_l, values_l, valid_l, eps_s, *,
                     m: int, rounds: int, negate: bool, u16: bool,
                     interpret: bool):
    """Per-device batched-sparse Khosla program (one shard_map body):
    device scatter staging, state init, the fused multi-round kernel
    (ops/pallas_ksparse.py), and the packed result plane with the
    on-device objective — batch-data-parallel with ZERO collectives
    (the done check rides the packed readback's sentinels)."""
    from .. import batch as batch_mod
    from ..ops.pallas_ksparse import ksp_chunk_pallas

    vt, w_lo, w_hi = batch_mod._sparse_stage_scatter(
        columns_l, values_l, m, negate
    )
    thresholds = (m / 2.0) * (w_hi - w_lo + eps_s)
    states = batch_mod._sparse_batch_init_nm(vt)
    # batch-padding slots arrive valid_l=False: born all-dropped, they
    # exit their grid step immediately
    states = states._replace(
        dropped=states.dropped | ~valid_l[:, None]
    )
    states = ksp_chunk_pallas(
        vt, states, eps_s, thresholds, rounds, interpret=interpret
    )
    packed = batch_mod._sparse_encode(states, u16)
    # objective in ORIGINAL cost units: p2o is in original column
    # space (identity map), so the match selects original arc values
    match = (columns_l == states.p2o[:, :, None]) & (columns_l >= 0)
    obj = jnp.sum(
        jnp.where(match, values_l, jnp.zeros((), values_l.dtype)),
        axis=(1, 2), dtype=jnp.float64,
    )
    hi = obj.astype(jnp.float32)
    lo = (obj - hi.astype(jnp.float64)).astype(jnp.float32)
    bits = jnp.stack(
        [
            lax.bitcast_convert_type(hi, jnp.int32),
            lax.bitcast_convert_type(lo, jnp.int32),
        ],
        axis=1,
    )
    return jnp.concatenate([packed, bits], axis=1)


@functools.lru_cache(maxsize=8)
def sharded_ksp_batch_core(mesh: Mesh, m: int, rounds: int,
                           negate: bool, u16: bool,
                           interpret: bool = False):
    """Jitted multi-device batched-sparse program: the batch dimension
    sharded across the mesh, each chip running the single-chip fused
    Khosla kernel on its slice — the multi-chip scaling dimension for
    the reference's own k-regular domain, with zero cross-chip
    traffic."""
    axis = mesh.axis_names[0]
    bspec = P(axis)
    fn = jax.shard_map(
        functools.partial(
            _ksp_batch_local, m=m, rounds=rounds, negate=negate,
            u16=u16, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(bspec, bspec, bspec, P()),
        out_specs=bspec,
        check_vma=False,  # pallas out_shapes carry no varying-axes info
    )
    return jax.jit(fn)


def solve_batch_sparse_sharded(
    columns,
    values,
    num_cols: int,
    mesh: Mesh,
    maximize: bool = False,
    eps: float | None = None,
    max_rounds: int = 10_000_000,
):
    """Multi-device batched k-sparse Khosla solve: ``columns[B, N, K]``
    (int32, −1 pads) / ``values[B, N, K]`` sharded over ``mesh``'s
    first axis, each device running the fused single-chip kernel on
    its slice (``batch.solve_batch_sparse``'s device-resident dense
    engine, batch-sharded).  Requires N % 8 == 0 and
    num_cols % 128 == 0 (the kernel shape contract).  Deterministic:
    results are bit-identical across mesh sizes (smallest-column tie
    rule per instance; instances never interact)."""
    from ..batch import BatchSolution, _sparse_unpack

    columns = jnp.asarray(columns, jnp.int32)
    values = jnp.asarray(values, jnp.float32)
    b, n, k = columns.shape
    m = int(num_cols)
    if n % 8 or m % 128:
        raise ValueError(
            f"sharded batch-sparse needs N%8==0 and num_cols%128==0, "
            f"got {n}x{m}"
        )
    if n > m:
        raise ValueError("num_rows must be <= num_cols")
    d = int(np.prod(mesh.devices.shape))
    b_pad = ((b + d - 1) // d) * d
    if b_pad != b:
        columns = jnp.concatenate(
            [columns, jnp.broadcast_to(columns[:1], (b_pad - b, n, k))]
        )
        values = jnp.concatenate(
            [values, jnp.broadcast_to(values[:1], (b_pad - b, n, k))]
        )
    valid = jnp.asarray(np.arange(b_pad) < b)
    eps_val = float(eps) if eps is not None else 1.0 / m
    u16 = n % 2 == 0 and m < 0xFFFE
    kern_interp = (
        _SHARDED_KERNEL_INTERPRET_ON_CPU
        and jax.default_backend() == "cpu"
    )
    from ..batch import _SPARSE_KERNEL_BUDGET

    bsh = NamedSharding(mesh, P(mesh.axis_names[0]))
    columns = jax.device_put(columns, bsh)
    values = jax.device_put(values, bsh)
    budget = _SPARSE_KERNEL_BUDGET
    while True:
        core = sharded_ksp_batch_core(
            mesh, m, budget, not maximize, u16, kern_interp
        )
        packed_dev = core(columns, values, valid, np.float32(eps_val))
        packed = np.asarray(packed_dev)[:b]
        p2o, active, _dropped, nits = _sparse_unpack(
            packed[:, :-2], n, u16
        )
        if not active.any() or budget >= max_rounds:
            break
        # extremely rare at m >> n (p99 round count < 10): the core is
        # stateless, so continuation re-solves from scratch with a 4x
        # budget (a fresh compile for the deeper program — acceptable
        # on the pathological path; the common path is ONE dispatch)
        budget = min(max_rounds, budget * 4)
    words = np.ascontiguousarray(packed[:, -2:]).view(np.float32)
    objective = words[:, 0].astype(np.float64) + words[:, 1]
    assigned = p2o != UNASSIGNED
    return BatchSolution(
        person_to_object=p2o,
        object_to_person=o2p_from_p2o(p2o, m),
        num_unassigned=(~assigned).sum(axis=1).astype(np.int32),
        objective=objective,
        eps=np.full(b, eps_val),
        nits=nits,
    )
