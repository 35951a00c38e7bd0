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

from .ops.auction import (
    ForwardState,
    KhoslaState,
    forward_round,
    khosla_round,
)
from .ops.dense import DenseProblem
from .solution import UNASSIGNED

_INT_MAX = jnp.int32(UNASSIGNED)


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
    jax.jit, static_argnames=("solver", "max_iterations", "chunk", "n", "m")
)
def _batch_chunk(
    values_t,  # [B, M, N] profit values (already sign-adjusted), dtype f
    states,  # batched KhoslaState / ForwardState
    eps,  # scalar
    target_eps,  # scalar
    toleration,  # scalar
    thresholds,  # [B] khosla price thresholds (forward: unused)
    solver: str,
    max_iterations: int,
    chunk: int,
    n: int,
    m: int,
):
    """Run ``chunk`` rounds of every instance (vmapped scan) and report
    whether all instances are finished.  Host-chunked structure: dynamic
    `lax.while_loop` bodies send this TPU backend's compiler into
    pathological blowups, fixed-length scans compile in seconds."""

    if solver == "khosla":

        def one(vals_t, state, threshold):
            problem = DenseProblem(vals_t)

            def body(s, _):
                return khosla_round(problem, s, eps, threshold), None

            state, _ = lax.scan(body, state, None, length=chunk)
            return state

        states = jax.vmap(one)(values_t, states, thresholds)
        alldone = jnp.all(
            jnp.sum(
                (states.p2o == UNASSIGNED) & ~states.dropped,
                axis=1, dtype=jnp.int32,
            ) == 0
        ) | jnp.all(states.nits >= max_iterations)
        return states, alldone
    else:

        def one(vals_t, state):
            problem = DenseProblem(vals_t)

            def body(s, _):
                return (
                    forward_round(
                        problem, s, target_eps, toleration,
                        jnp.asarray(n != m, bool),
                        jnp.asarray(max_iterations, jnp.int32),
                        keep_valid=True,
                    ),
                    None,
                )

            state, _ = lax.scan(body, state, None, length=chunk)
            return state

        states = jax.vmap(one)(values_t, states)
        return states, jnp.all(states.done)


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "chunk", "sfoe")
)
def _batch_chunk_pallas(
    values_t,  # [B, M, N]
    states: ForwardState,
    target_eps,
    toleration,
    max_iterations: int,
    chunk: int,
    sfoe: bool,
):
    """Forward-auction chunk built on the fused Pallas round kernel
    (ops/pallas_dense.py): the whole round is one VMEM-resident kernel,
    with only the per-instance ε-scaling bookkeeping in XLA.  The scan
    carries the kernel's flat padded layouts (pad/unpad once per chunk,
    not per round)."""
    from .ops.pallas_dense import fused_dense_round_batch_flat

    dtype = values_t.dtype
    b, m, n = values_t.shape
    vals2 = values_t.reshape(b * m, n)

    # pad once per chunk into the kernel's flat layouts
    flat = (
        states.prices.reshape(b * m, 1),
        jnp.zeros((b, 8, n), jnp.int32)
        .at[:, 0, :].set(states.p2o).reshape(b * 8, n),
        states.o2p.reshape(b * m, 1),
    )

    def body(carry, _):
        prices2, p2o_pad2, o2p2, s = carry
        prices2, p2o_pad2, o2p2, chosen_pad, maxp_pad = (
            fused_dense_round_batch_flat(
                vals2, prices2, p2o_pad2, o2p2, s.eps, s.done, b, m, n
            )
        )
        p2o = p2o_pad2.reshape(b, 8, n)[:, 0, :]
        chosen = chosen_pad.reshape(b, 8, n)[:, 0, :]
        maxp = maxp_pad.reshape(b, 8, n)[:, 0, :]
        nits = s.nits + (~s.done).astype(jnp.int32)
        num_unassigned = jnp.sum(p2o == UNASSIGNED, axis=1, dtype=jnp.int32)
        fully = (num_unassigned == 0) & ~s.done
        is_optimal = jnp.all(
            chosen + toleration >= maxp - target_eps, axis=1
        )
        if sfoe:
            is_optimal = jnp.ones_like(is_optimal)
        stop = is_optimal | (s.eps < target_eps)
        reduce = fully & ~stop
        eps = jnp.where(reduce, s.eps * jnp.asarray(0.15, dtype), s.eps)
        # keep-valid pairs at the reduced eps (see forward_round); o2p
        # stays stale and is reconstructed by the caller
        release = reduce[:, None] & ~(
            (p2o != _INT_MAX)
            & (chosen + toleration >= maxp - eps[:, None])
        )
        p2o_pad2 = (
            p2o_pad2.reshape(b, 8, n)
            .at[:, 0, :].set(jnp.where(release, _INT_MAX, p2o))
            .reshape(b * 8, n)
        )
        done = s.done | (fully & stop) | (nits >= max_iterations)
        s = ForwardState(
            prices=s.prices,  # placeholder; flat copy is authoritative
            p2o=s.p2o,
            o2p=s.o2p,
            eps=eps,
            nits=nits,
            nreductions=s.nreductions + reduce.astype(jnp.int32),
            optimal_found=s.optimal_found | (fully & is_optimal),
            done=done,
        )
        return (prices2, p2o_pad2, o2p2, s), None

    (prices2, p2o_pad2, o2p2, s), _ = lax.scan(
        body, (*flat, states), None, length=chunk
    )
    states = ForwardState(
        prices=prices2.reshape(b, m),
        p2o=p2o_pad2.reshape(b, 8, n)[:, 0, :],
        o2p=o2p2.reshape(b, m),
        eps=s.eps,
        nits=s.nits,
        nreductions=s.nreductions,
        optimal_found=s.optimal_found,
        done=s.done,
    )
    return states, jnp.all(states.done)


def _pallas_usable(solver: str, n: int, m: int, dtype) -> bool:
    return (
        solver == "forward"
        and n % 128 == 0
        and m % 8 == 0
        and np.dtype(dtype) == np.float32
    )


def _solve_batch_dense(
    values_t, eps, target_eps, toleration, thresholds,
    solver: str, max_iterations: int, n: int, m: int, chunk: int = 64,
):
    b = values_t.shape[0]
    dtype = values_t.dtype
    np_dtype = np.dtype(dtype)
    eps = np_dtype.type(eps)
    target_eps = np_dtype.type(target_eps)
    toleration = np_dtype.type(toleration)
    thresholds = jnp.asarray(np.asarray(thresholds), dtype)

    if solver == "khosla":
        states = KhoslaState(
            prices=jnp.zeros((b, m), dtype),
            p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
            o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
            dropped=jnp.zeros((b, n), bool),
            nits=jnp.zeros((b,), jnp.int32),
        )
    elif solver == "forward":
        states = ForwardState(
            prices=jnp.zeros((b, m), dtype),
            p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
            o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
            eps=thresholds,  # start eps = C/2 per instance
            nits=jnp.zeros((b,), jnp.int32),
            nreductions=jnp.zeros((b,), jnp.int32),
            optimal_found=jnp.zeros((b,), bool),
            done=jnp.zeros((b,), bool),
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown solver {solver!r}")

    use_pallas = _pallas_usable(solver, n, m, dtype) and (
        jax.default_backend() not in ("cpu",)
    )
    rounds = 0
    while True:
        if use_pallas:
            states, alldone = _batch_chunk_pallas(
                values_t, states, target_eps, toleration,
                max_iterations, chunk, n != m,
            )
        else:
            states, alldone = _batch_chunk(
                values_t, states, eps, target_eps, toleration, thresholds,
                solver, max_iterations, chunk, n, m,
            )
        rounds += chunk
        if bool(alldone) or rounds >= max_iterations:
            break

    num_unassigned = jnp.sum(
        states.p2o == UNASSIGNED, axis=1, dtype=jnp.int32
    )
    if solver == "khosla":
        final_eps = jnp.broadcast_to(
            jnp.asarray(eps, dtype), states.nits.shape
        )
    else:
        final_eps = states.eps
    return states.p2o, states.o2p, num_unassigned, final_eps, states.nits


def solve_batch(
    costs,
    maximize: bool = False,
    solver: str = "forward",
    eps: Optional[float] = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
    start_eps_divisor: float = 128.0,
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
        # start eps: the reference uses C/2 (symmetric.rs:268-273); a
        # smaller start converges in markedly fewer Jacobi rounds on
        # dense instances (keep-valid-pairs makes later phases cheap)
        thresholds = np.where(n == m, c / start_eps_divisor, eps_val)
        target_eps = eps_val
        toleration = float(
            2.0 ** (max(0, int(np.log2(float(c.max()) + 1e-7))) - 53)
        )

    p2o, o2p, num_unassigned, final_eps, nits = _solve_batch_dense(
        values_t,
        float(eps_val),
        float(target_eps),
        float(toleration),
        np.asarray(thresholds, dtype=np.float64),
        solver,
        int(max_iterations),
        n,
        m,
    )

    p2o_np = np.asarray(p2o)
    assigned = p2o_np != UNASSIGNED
    # reconstruct object_to_person from the final matching (keep-valid
    # phases leave o2p stale by design, see forward_round)
    o2p = np.full((b, m), UNASSIGNED, dtype=np.int32)
    rows, cols_idx = np.nonzero(assigned)
    o2p[rows, p2o_np[rows, cols_idx]] = cols_idx
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
