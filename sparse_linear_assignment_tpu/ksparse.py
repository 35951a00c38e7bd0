"""KhoslaSolver — auction for asymmetric k-regular sparse LAP, TPU-native.

Re-derivation of the reference `KhoslaSolver`
(`/root/reference/src/ksparse.rs:73-260`, algorithm of arXiv:2101.07155).
The reference runs a strictly sequential LIFO stack of bidders; here every
unassigned person bids each round in jitted synchronous rounds (see
`ops/auction.py` and the slot-list engine in `ops/compact.py`).  The auction algorithm is order-insensitive up to
tie-breaking, so the ε-optimality and finite-termination guarantees carry
over; the specific matching found on instances with non-unique optima may
legitimately differ from the Rust solver's (as the two reference solvers
already differ from each other, `solver.rs:317-337`).

Example
-------
>>> from sparse_linear_assignment_tpu import KhoslaSolver
>>> solver, solution = KhoslaSolver.new(10, 10, 100)
>>> weights = [[10, 6, 14, 1], [17, 18, 16]]
>>> solver.init(2, 4)
>>> for i, row in enumerate(weights):
...     solver.extend_from_values(i, range(len(row)), row)
>>> solver.solve(solution, maximize=False)
>>> assert solution.num_unassigned == 0
>>> assert solver.get_objective(solution) == 1.0 + 16.0
>>> assert list(solution.person_to_object) == [3, 2]
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import numpy as _np

from .ops.auction import khosla_solve
from .ops.compact import khosla_solve_compact, khosla_solve_scaled
from .ops.padded import build_padded_problem
from .solution import UNASSIGNED as _UNASSIGNED
from .solution import AuctionSolution
from .solver import AuctionSolver


class KhoslaSolver(AuctionSolver):
    """Auction solver with the price-threshold drop rule guaranteeing
    finite termination even without a perfect matching
    (`ksparse.rs:9-19`, `ksparse.rs:181,218-220`)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        #: number of Jacobi rounds of the last solve.  The reference's
        #: ``nits`` counts sequential stack pops (`ksparse.rs:184-187`);
        #: in the synchronous formulation one round processes every
        #: unassigned person at once, so rounds are the natural analogue.
        self.nits: int = 0

    #: above this many rows, solve() uses the compacted host-driven
    #: engine (identical semantics, round cost scales with active set)
    COMPACT_THRESHOLD = 8192

    #: symmetric instances at or above this many rows route the auto
    #: engine through the native ε-scaling ladder (certificate-identical,
    #: measured fastest at scale — BASELINE.md attribution table)
    NATIVE_LADDER_THRESHOLD = 4096

    def solve(
        self,
        solution: AuctionSolution,
        maximize: bool = False,
        eps: Optional[float] = None,
        max_rounds: int = 10_000_000,
        scale_eps: bool = False,
        compact: Optional[bool] = None,
        hybrid: bool = False,
        start_prices=None,
        engine: str = "auto",
    ) -> None:
        """Solve the current problem instance (`ksparse.rs:153-251`).

        ``eps`` defaults to ``1 / num_cols`` (`ksparse.rs:164-168`).

        ``engine`` selects the execution engine:

        - ``"auto"`` (default) — the measured-fastest correct engine for
          the instance class (BASELINE.md crossover tables): sparse
          single instances run the native sequential engine (the
          reference's own semantics; the Jacobi device rounds lose
          60–1000× on small sparse instances to per-sync latency and
          serialized gathers), with the native ε-scaling ladder above
          ``NATIVE_LADDER_THRESHOLD`` rows on symmetric instances.
          Explicit ``scale_eps``/``compact``/``hybrid``/``start_prices``
          arguments force the device paths (they parameterize them).
        - ``"native"`` — force the native sequential engine.
        - ``"device"`` — force the TPU/device engines (the reference's
          one-call contract, `solver.rs:15-20`, executed as synchronous
          Jacobi rounds).

        Extensions over the reference:

        - ``max_rounds`` — safety cutoff for the float32 fast path (the
          float64 path terminates on its own).
        - ``scale_eps`` — run an ε-scaling ladder down to ``eps``
          (same final ε-optimality certificate, orders of magnitude
          fewer bids on large instances; see ops/compact.py).
        - ``compact`` — use the active-set-compacted engine (auto:
          enabled for instances above ``COMPACT_THRESHOLD`` rows and
          on accelerator backends).
        - ``hybrid`` — heterogeneous performance mode: TPU bulk rounds +
          native C++ chain tails (see hybrid.py); combine with
          ``scale_eps=True`` for large symmetric instances.
        - ``start_prices`` — warm-start the price vector, e.g. with
          ``solver.prices`` from a previous solve of a similar instance
          with the same ``maximize`` (the TPU equivalent of the
          reference's price persistence across ε-restarts,
          `symmetric.rs:290-324`; SURVEY.md §5.4).  On symmetric
          instances any start prices preserve the ε-CS certificate of
          the returned matching; on **asymmetric** instances warm
          starts are unsound (see the inline soundness note) — the
          prices are ignored with a warning and the solve runs cold,
          mirroring the reference's asymmetric ε-scaling exception
          (`symmetric.rs:256-267`).
        """
        if engine not in ("auto", "native", "device"):
            raise ValueError(f"unknown engine {engine!r}")
        forced_device = (
            scale_eps or hybrid or compact is not None
            or start_prices is not None
        )
        if engine == "auto":
            engine = "device" if forced_device else "native"
        if engine == "native":
            try:
                from .cpu_reference import get_lib, khosla_solve_cpu
                get_lib()
            except Exception:  # no native toolchain: device fallback
                engine = "device"
        if engine == "native":
            if (
                self.num_rows == self.num_cols
                and self.num_rows >= self.NATIVE_LADDER_THRESHOLD
            ):
                # native ε-scaling ladder (certificate-identical at the
                # target eps, measured fastest at scale)
                self._solve_native_ladder(solution, maximize, eps)
            else:
                sol2, nits = khosla_solve_cpu(self, maximize, eps)
                solution.person_to_object = sol2.person_to_object
                solution.object_to_person = sol2.object_to_person
                solution.num_unassigned = sol2.num_unassigned
                solution.eps = sol2.eps
                # native nits counts sequential pops — the reference's
                # own unit (`ksparse.rs:184-187`)
                self.nits = nits
            return

        self.validate_input()
        self.init_solve(solution, maximize)

        num_cols_f = float(self.num_cols)
        eps = float(eps) if eps is not None else 1.0 / num_cols_f
        solution.eps = eps

        values = self.values  # possibly sign-flipped by init_solve
        w_min = float(values.min())
        w_max = float(values.max())
        # finite-termination threshold (`ksparse.rs:181`)
        price_threshold = (num_cols_f / 2.0) * (w_max - w_min + eps)

        # instance-reuse: repeat solves on unchanged CSR state reuse the
        # device-staged padded problem (the reference's capacity-reuse
        # pattern, README.md:27-29; re-uploading ~tens of MB per solve
        # costs seconds at this tunnel's worst ingress).  `_csr_version`
        # is the cache key: every builder mutation and the in-place
        # maximize re-flip bump it.
        staged = getattr(self, "_staged_problem", None)
        meta = (np.dtype(self.dtype), self.num_rows, self.num_cols)
        if staged is not None and staged[0] == self._csr_version \
                and staged[1] == meta:
            problem = staged[2]
        else:
            problem = build_padded_problem(
                self.num_rows,
                self.num_cols,
                self.j_counts,
                self.column_indices,
                values,
                dtype=self.dtype,
            )
            self._staged_problem = (self._csr_version, meta, problem)
        if compact is None:
            # Backend-aware default: on accelerator backends always use
            # the host-chunked slot-list engine — the `lax.while_loop` +
            # gather program in `khosla_solve` is a documented compile
            # bomb on this TPU backend (docs/PERFORMANCE.md item 2) and
            # is kept as the CPU/vmap reference path only.
            import jax

            compact = (
                self.num_rows > self.COMPACT_THRESHOLD
                or scale_eps
                or jax.default_backend() != "cpu"
            )
        if start_prices is not None:
            start_prices = np.asarray(start_prices, dtype=np.float64)
            if start_prices.shape != (self.num_cols,):
                raise ValueError(
                    f"start_prices must have shape ({self.num_cols},)"
                )
            if self.num_rows != self.num_cols:
                # asymmetric soundness: an ε-CS matching is only
                # n·ε-optimal when every matching uses the same object
                # set (the price sums cancel in the duality argument) —
                # with more objects than persons, stale high prices on
                # objects the previous matching happened to use steer
                # the auction away from them and the certificate cannot
                # see it (measured: 30 % excess objective).  Same reason
                # the reference disables ε-scaling on asymmetric
                # instances (`symmetric.rs:256-267`); run cold instead.
                import warnings

                warnings.warn(
                    "start_prices ignored: warm starts are unsound on "
                    "asymmetric instances (running cold; see "
                    "KhoslaSolver.solve docstring)",
                    stacklevel=2,
                )
                start_prices = None
            else:
                compact = compact or not hybrid  # while_loop has no warm entry
                # Price shifts are invariant: profit_i(j) = v_ij − p_j,
                # so subtracting a constant from every price raises all
                # profits uniformly — selection, bids, and the ε-CS
                # certificate are unchanged.  Normalize to min 0:
                # ε-scaled solves leave uniformly INFLATED price levels
                # that would otherwise trip the finite-termination drop
                # threshold (`ksparse.rs:181` is a cold-start bound) and
                # spuriously drop persons on feasible instances
                # (regression: tests/test_warmstart.py warm-after-scaled).
                start_prices = start_prices - float(start_prices.min())
                # The residual spread still shifts the reachable price
                # range upward; extend the drop threshold by it so a
                # warm start can never drop a person a cold start would
                # have assigned.  Termination stays finite — the
                # threshold remains bounded.
                warm_pad = float(start_prices.max())
                price_threshold += warm_pad

        if hybrid:
            from .hybrid import khosla_solve_hybrid

            counts = self.j_counts.astype(np.int64)
            starts = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            prices, p2o, o2p, dropped, tpu_rounds, cpu_pops = (
                khosla_solve_hybrid(
                    self.num_rows, self.num_cols, starts,
                    self.column_indices, values, problem,
                    eps, w_min, w_max, scale=scale_eps,
                    start_prices=start_prices,
                    threshold_pad=(
                        0.0 if start_prices is None
                        else float(start_prices.max())
                    ),
                )
            )
            self.prices = prices
            solution.person_to_object = p2o
            solution.object_to_person = o2p
            solution.num_unassigned = int(
                (p2o == _np.iinfo(_np.int32).max).sum()
            )
            self.nits = int(tpu_rounds + cpu_pops)
            return
        if scale_eps:
            state, nits = khosla_solve_scaled(
                problem, eps, w_min, w_max, max_rounds=max_rounds,
                start_prices=start_prices,
                threshold_pad=(
                    0.0 if start_prices is None
                    else float(start_prices.max())
                ),
            )
            prices, p2o, o2p = state.prices, state.p2o, state.o2p
            num_unassigned = int(
                (_np.asarray(p2o) == _np.iinfo(_np.int32).max).sum()
            )
        elif compact:
            init_state = None
            if start_prices is not None:
                from .ops.compact import LState
                import jax.numpy as jnp

                init_state = LState(
                    prices=jnp.asarray(
                        start_prices.astype(np.dtype(self.dtype))
                    ),
                    p2o=jnp.full(self.num_rows, jnp.int32(_UNASSIGNED)),
                    o2p=jnp.full(self.num_cols, jnp.int32(_UNASSIGNED)),
                    dropped=jnp.zeros(self.num_rows, bool),
                    slots=jnp.arange(self.num_rows, dtype=jnp.int32),
                    nits=jnp.zeros((), jnp.int32),
                )
            state = khosla_solve_compact(
                problem, eps, price_threshold, max_rounds=max_rounds,
                init_state=init_state,
            )
            prices, p2o, o2p = state.prices, state.p2o, state.o2p
            nits = int(state.nits)
            num_unassigned = int(
                (_np.asarray(p2o) == _np.iinfo(_np.int32).max).sum()
            )
        else:
            prices, p2o, o2p, num_unassigned, nits = khosla_solve(
                problem, eps, price_threshold, max_rounds=max_rounds
            )
        self.prices = np.asarray(prices, dtype=np.float64)
        solution.person_to_object = np.asarray(p2o)
        solution.object_to_person = np.asarray(o2p)
        solution.num_unassigned = int(num_unassigned)
        self.nits = int(nits)

    def _solve_native_ladder(
        self,
        solution: AuctionSolution,
        maximize: bool,
        eps: Optional[float],
    ) -> None:
        """Native ε-scaling ladder (hybrid driver with zero TPU phases):
        the measured-fastest engine for large symmetric sparse singles
        (BASELINE.md attribution: 0.37–0.46 s at the n=1e5 headline vs
        50.5 s sequential-no-ladder).  Same final ε-CS certificate as a
        direct solve at ``eps``."""
        from .hybrid import khosla_solve_hybrid

        self.validate_input()
        self.init_solve(solution, maximize)
        eps_val = float(eps) if eps is not None else 1.0 / float(self.num_cols)
        solution.eps = eps_val
        values = self.values  # possibly sign-flipped by init_solve
        counts = self.j_counts.astype(np.int64)
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        prices, p2o, o2p, dropped, tpu_rounds, cpu_pops = (
            khosla_solve_hybrid(
                self.num_rows, self.num_cols, starts,
                self.column_indices, values, None,
                eps_val, float(values.min()), float(values.max()),
                scale=True, tpu_phases=0,
            )
        )
        self.prices = prices
        solution.person_to_object = p2o
        solution.object_to_person = o2p
        solution.num_unassigned = int(
            (p2o == _np.iinfo(_np.int32).max).sum()
        )
        self.nits = int(tpu_rounds + cpu_pops)
