"""Batched (vmapped) LAP solving — thousands of independent instances per
TPU core.

This is a first-class TPU-native capability the sequential reference
cannot express (SURVEY.md §2 "Parallelism strategies"): `jax.vmap` lifts
the whole `lax.while_loop` auction over a batch dimension, so one compiled
executable solves the entire batch; instances that terminate early take
masked no-op rounds until the slowest instance finishes.

The batch API uses clean min/max cost semantics (costs in, assignments and
objectives out) rather than the reference's stateful CSR-builder surface;
the per-instance semantics (bid rules, ε defaults, termination) are
identical to the single-instance solvers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops.auction import forward_solve, khosla_solve
from .ops.dense import DenseProblem
from .solution import UNASSIGNED


@dataclasses.dataclass
class BatchSolution:
    """Result of a batched solve.

    ``person_to_object[b, i]`` / ``object_to_person[b, j]`` use the same
    ``UNASSIGNED`` sentinel as the single-instance API; ``objective`` is
    in original cost units (float64 accumulation).
    """

    person_to_object: np.ndarray  # int32 [B, N]
    object_to_person: np.ndarray  # int32 [B, M]
    num_unassigned: np.ndarray  # int32 [B]
    objective: np.ndarray  # float64 [B]
    eps: np.ndarray  # [B] achieved eps (forward) or scalar-broadcast
    nits: np.ndarray  # int32 [B]


@functools.partial(
    jax.jit, static_argnames=("solver", "max_iterations", "n", "m")
)
def _solve_batch_dense(
    values_t,  # [B, M, N] profit values (already sign-adjusted), dtype f
    eps,  # scalar
    target_eps,  # scalar
    toleration,  # scalar
    thresholds,  # [B] khosla price thresholds
    solver: str,
    max_iterations: int,
    n: int,
    m: int,
):
    dtype = values_t.dtype

    def make_problem(vals_t):
        # gather-free dense representation (see ops/dense.py)
        return DenseProblem(vals_t)

    if solver == "khosla":

        def one(vals_t, threshold):
            return khosla_solve(
                make_problem(vals_t), eps, threshold,
                max_rounds=max_iterations,
            )

        prices, p2o, o2p, num_unassigned, nits = jax.vmap(one)(
            values_t, thresholds
        )
        final_eps = jnp.broadcast_to(jnp.asarray(eps, dtype), nits.shape)
        return p2o, o2p, num_unassigned, final_eps, nits
    elif solver == "forward":

        def one(vals_t, start_eps):
            # asymmetric instances disable eps-scaling (symmetric.rs:256-267)
            return forward_solve(
                make_problem(vals_t),
                start_eps,
                target_eps,
                toleration,
                n != m,
                max_iterations,
            )

        # start eps = C/2 per instance (symmetric.rs:268-273)
        start_eps = thresholds  # reused slot: C/2 per instance
        (prices, p2o, o2p, num_unassigned, nits, nreductions,
         optimal, final_eps) = jax.vmap(one)(values_t, start_eps)
        return p2o, o2p, num_unassigned, final_eps, nits
    else:  # pragma: no cover
        raise ValueError(f"unknown solver {solver!r}")


def solve_batch(
    costs,
    maximize: bool = False,
    solver: str = "forward",
    eps: Optional[float] = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
) -> BatchSolution:
    """Solve a batch of dense LAP instances ``costs[B, N, M]`` (N <= M).

    Parameters mirror the single-instance ``solve`` (`solver.rs:15-20`):
    ``eps`` defaults to ``1/M`` for the Khosla engine (`ksparse.rs:164-168`)
    and ``1/N`` target for the forward engine (`symmetric.rs:231-235`).
    ``dtype`` defaults to float32 — the TPU fast path; use float64 when the
    cost range demands it (eps below ~1 ulp of the largest cost stalls in
    float32).
    """
    costs = np.asarray(costs)
    if costs.ndim != 3:
        raise ValueError("costs must be [batch, num_rows, num_cols]")
    b, n, m = costs.shape
    if n > m:
        raise ValueError("num_rows must be <= num_cols")

    # internal convention: always maximize profit
    work = costs if maximize else -costs
    values_t = jnp.asarray(
        np.swapaxes(work, 1, 2).astype(dtype)
    )  # [B, M(K), N]

    if solver == "khosla":
        eps_val = float(eps) if eps is not None else 1.0 / m
        w_span = work.reshape(b, -1).max(axis=1) - work.reshape(b, -1).min(
            axis=1
        )
        thresholds = (m / 2.0) * (w_span + eps_val)  # ksparse.rs:181
        target_eps = toleration = 0.0
    else:
        eps_val = float(eps) if eps is not None else 1.0 / n
        c = np.abs(work.reshape(b, -1)).max(axis=1)
        thresholds = np.where(n == m, c / 2.0, eps_val)  # start eps
        target_eps = eps_val
        toleration = float(
            2.0 ** (max(0, int(np.log2(float(c.max()) + 1e-7))) - 53)
        )

    p2o, o2p, num_unassigned, final_eps, nits = _solve_batch_dense(
        values_t,
        jnp.asarray(eps_val, dtype),
        jnp.asarray(target_eps, dtype),
        jnp.asarray(toleration, dtype),
        jnp.asarray(np.asarray(thresholds), dtype),
        solver,
        int(max_iterations),
        n,
        m,
    )

    p2o_np = np.asarray(p2o)
    assigned = p2o_np != UNASSIGNED
    safe = np.where(assigned, p2o_np, 0)
    picked = np.take_along_axis(
        costs.astype(np.float64), safe[:, :, None], axis=2
    )[:, :, 0]
    objective = np.where(assigned, picked, 0.0).sum(axis=1)

    return BatchSolution(
        person_to_object=p2o_np,
        object_to_person=np.asarray(o2p),
        num_unassigned=np.asarray(num_unassigned),
        objective=objective,
        eps=np.asarray(final_eps, dtype=np.float64),
        nits=np.asarray(nits),
    )


class BatchedLAP:
    """Reusable compiled batched solver for a fixed (B, N, M) shape —
    the batch analogue of the reference's capacity-reuse pattern
    (README.md:27-29): compile once, then stream batches through."""

    def __init__(
        self,
        batch: int,
        num_rows: int,
        num_cols: int,
        solver: str = "forward",
        dtype=np.float32,
        maximize: bool = False,
        eps: Optional[float] = None,
        max_iterations: int = 100_000,
    ):
        self.batch = batch
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.solver = solver
        self.dtype = np.dtype(dtype)
        self.maximize = maximize
        self.eps = eps
        self.max_iterations = max_iterations

    def solve(self, costs) -> BatchSolution:
        costs = np.asarray(costs)
        expect = (self.batch, self.num_rows, self.num_cols)
        if costs.shape != expect:
            raise ValueError(f"expected costs of shape {expect}, got {costs.shape}")
        return solve_batch(
            costs,
            maximize=self.maximize,
            solver=self.solver,
            eps=self.eps,
            dtype=self.dtype,
            max_iterations=self.max_iterations,
        )
