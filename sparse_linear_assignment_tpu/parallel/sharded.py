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
winner vector, and updates its slices — all inside one `lax.while_loop`
under `shard_map`, so the entire multi-device solve is a single XLA
program with no host round-trips.

Validated on multi-device CPU meshes (the driver's `dryrun_multichip`
path; multi-chip TPU hardware is not available in this environment).
Note for real multi-chip TPU deployment: this backend's compiler
struggles with while_loop + gather bodies (docs/PERFORMANCE.md), so the
loop should be restructured into host-chunked scans like the
single-chip drivers — planned for a future round alongside real
multi-chip measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solution import INDEX_DTYPE, UNASSIGNED
from ..solver import AuctionSolver

_INT_MAX = jnp.int32(UNASSIGNED)


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
    profit = jnp.where(
        row_mask, row_vals - prices_full[row_cols], -jnp.inf
    )  # [K, N/D]
    best_k = jnp.argmax(profit, axis=0)
    best = jnp.take_along_axis(profit, best_k[None, :], axis=0)[0]
    k_iota = lax.broadcasted_iota(jnp.int32, profit.shape, 0)
    second = jnp.max(
        jnp.where(k_iota == best_k[None, :].astype(jnp.int32), -jnp.inf, profit),
        axis=0,
    )
    best_col = jnp.take_along_axis(row_cols, best_k[None, :], axis=0)[0]
    best_val = jnp.take_along_axis(row_vals, best_k[None, :], axis=0)[0]

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
    num_active = lax.psum(
        jnp.sum((p2o_new == UNASSIGNED) & ~dropped_new), axis
    ).astype(jnp.int32)
    del d
    return (prices_new, p2o_new, o2p_new, dropped_new, nits + 1, num_active)


def _sharded_khosla_shardmap(
    row_cols, row_vals, row_mask, col_persons, col_mask,
    dropped_init, eps, threshold, max_rounds,
):
    """Body run per-device by shard_map: full while_loop over rounds."""
    dtype = row_vals.dtype
    n_local = row_cols.shape[1]
    m_local = col_persons.shape[1]

    # initial carry must be marked as varying over the mesh axis, since the
    # loop body produces shard-varying values
    state = (
        lax.pvary(jnp.zeros(m_local, dtype), "shard"),          # prices
        lax.pvary(jnp.full(n_local, _INT_MAX, jnp.int32), "shard"),  # p2o
        lax.pvary(jnp.full(m_local, _INT_MAX, jnp.int32), "shard"),  # o2p
        dropped_init,                                           # dropped
        jnp.zeros((), jnp.int32),
        lax.psum(jnp.sum(~dropped_init), "shard").astype(jnp.int32),
    )

    def cond(s):
        return (s[5] > 0) & (s[4] < max_rounds)

    def body(s):
        return _round_body(
            row_cols, row_vals, row_mask, col_persons, col_mask,
            eps, threshold, s,
        )

    prices, p2o, o2p, dropped, nits, _ = lax.while_loop(cond, body, state)
    return prices, p2o, o2p, nits


def sharded_khosla_core(mesh: Mesh):
    """Build the jitted multi-device Khosla solve for ``mesh`` (1-D, axis
    ``"shard"``).  Returns a function of the padded sharded arrays."""
    axis = mesh.axis_names[0]

    fn = jax.shard_map(
        functools.partial(_sharded_khosla_shardmap),
        mesh=mesh,
        in_specs=(
            P(None, axis),  # row_cols
            P(None, axis),  # row_vals
            P(None, axis),  # row_mask
            P(None, axis),  # col_persons
            P(None, axis),  # col_mask
            P(axis),        # dropped_init
            P(),            # eps
            P(),            # threshold
            P(),            # max_rounds
        ),
        out_specs=(P(axis), P(axis), P(axis), P()),
    )
    return jax.jit(fn)


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

    def pad_to(x, mult, axis_i):
        size = x.shape[axis_i]
        target = ((size + mult - 1) // mult) * mult
        if target == size:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis_i] = (0, target - size)
        return np.pad(np.asarray(x), pad)

    row_cols = pad_to(problem.row_cols, d, 1)
    row_vals = pad_to(problem.row_vals, d, 1)
    row_mask = pad_to(problem.row_mask, d, 1)
    col_persons = pad_to(problem.col_persons, d, 1)
    col_mask = pad_to(problem.col_mask, d, 1)
    n_pad = row_cols.shape[1]
    dropped_init = np.zeros(n_pad, bool)
    dropped_init[solver.num_rows:] = True  # padding persons never bid

    core = sharded_khosla_core(mesh)
    prices, p2o, o2p, nits = core(
        row_cols, row_vals, row_mask, col_persons, col_mask,
        dropped_init,
        np.asarray(eps, dtype=solver.dtype),
        np.asarray(threshold, dtype=solver.dtype),
        np.int32(max_rounds),
    )

    p2o = np.asarray(p2o)[: solver.num_rows]
    o2p = np.asarray(o2p)[: solver.num_cols]
    solver.prices = np.asarray(prices, dtype=np.float64)[: solver.num_cols]
    solution.person_to_object = p2o.astype(INDEX_DTYPE)
    solution.object_to_person = o2p.astype(INDEX_DTYPE)
    solution.num_unassigned = int((p2o == UNASSIGNED).sum())
    solution.eps = eps
    return solution, int(nits)
