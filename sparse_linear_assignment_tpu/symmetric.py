"""ForwardAuctionSolver — ε-scaling forward auction, TPU-native.

Re-derivation of the reference `ForwardAuctionSolver`
(`/root/reference/src/symmetric.rs:75-468`, after the sslap package).
The Jacobi "all unassigned people bid each round" schedule that the
reference *specifies* (`symmetric.rs:11-12`) but executes sequentially is
here executed literally, as jitted synchronous rounds (host-chunked
scans, see `ops/auction.py`), with the reference's outer logic intact:

- ε-scaling: start at ``C / 2``; on full-but-not-ε-CS assignment multiply
  eps by 0.15 and restart assignments with kept prices
  (`symmetric.rs:268-273,290-324`).
- asymmetric instances disable ε-scaling and start from
  ``target_eps − f64::EPSILON`` (`symmetric.rs:256-267`).
- infeasible instances loop until ``max_iterations`` (default 100_000,
  `symmetric.rs:190,326-328`).

Example
-------
>>> from sparse_linear_assignment_tpu import ForwardAuctionSolver
>>> solver, solution = ForwardAuctionSolver.new(10, 10, 100)
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

from .ops.auction import forward_solve_chunked
from .ops.padded import build_padded_problem
from .solution import AuctionSolution
from .solver import AuctionSolver

REDUCTION_FACTOR = 0.15  # `symmetric.rs:189`
MAX_ITERATIONS = 100_000  # `symmetric.rs:190`
_F64_EPSILON = float(np.finfo(np.float64).eps)


class ForwardAuctionSolver(AuctionSolver):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.nits: int = 0  # Jacobi rounds (reference counts the same unit)
        self.nreductions: int = 0
        self.optimal_soln_found: bool = False
        self.max_iterations: int = MAX_ITERATIONS

    def solve(
        self,
        solution: AuctionSolution,
        maximize: bool = False,
        eps: Optional[float] = None,
        engine: str = "auto",
    ) -> None:
        """`symmetric.rs:177-186` — delegates to :meth:`solve_with_params`."""
        self.solve_with_params(
            solution, maximize, eps, None, None, engine=engine
        )

    def solve_with_params(
        self,
        solution: AuctionSolution,
        maximize: bool = False,
        eps: Optional[float] = None,
        start_eps: Optional[float] = None,
        max_iterations: Optional[int] = None,
        start_prices=None,
        engine: str = "auto",
    ) -> None:
        """Full-parameter solve (`symmetric.rs:218-332`).

        ``engine``: ``"auto"`` (default) routes to the measured-fastest
        correct engine — the native sequential engine for sparse single
        instances (the Jacobi device rounds lose 60–1000× there to
        per-sync latency, BASELINE.md config A/B rows), EXCEPT when the
        instance has single-arc rows: the reference bid rule the native
        engine reproduces bids +inf there and livelocks
        (`symmetric.rs:359,378`; docs/PARITY.md deviation), so those
        instances take the device engine's guarded bid.  ``"native"`` /
        ``"device"`` force an engine.  ``start_prices`` (a device-path
        extension) implies the device engine.

        ``start_prices`` (extension, SURVEY.md §5.4) warm-starts the
        price vector — e.g. with ``solver.prices`` from a previous
        solve of a similar instance with the same ``maximize``; on
        symmetric instances the ε-CS certificate of the result is
        unaffected by start prices.  On **asymmetric** instances warm
        starts are unsound (stale prices on unused objects break the
        n·ε-optimality duality) — they are ignored with a warning and
        the solve runs cold, mirroring the reference's asymmetric
        ε-scaling exception (`symmetric.rs:256-267`).
        """
        if engine not in ("auto", "native", "device"):
            raise ValueError(f"unknown engine {engine!r}")
        if engine == "auto":
            if start_prices is not None or np.min(self.j_counts) < 2:
                engine = "device"
            else:
                engine = "native"
        if engine == "native":
            try:
                from .cpu_reference import forward_solve_cpu, get_lib
                get_lib()
            except Exception:  # no native toolchain: device fallback
                engine = "device"
        if engine == "native":
            self.max_iterations = (
                int(max_iterations) if max_iterations is not None
                else MAX_ITERATIONS
            )
            sol2, nits, nreductions, optimal = forward_solve_cpu(
                self, maximize, eps, start_eps, self.max_iterations
            )
            solution.person_to_object = sol2.person_to_object
            solution.object_to_person = sol2.object_to_person
            solution.num_unassigned = sol2.num_unassigned
            solution.eps = sol2.eps
            self.nits = nits
            self.nreductions = nreductions
            self.optimal_soln_found = optimal
            return

        self.validate_input()
        self.init_solve(solution, maximize)

        target_eps = (
            float(eps) if eps is not None else 1.0 / float(self.num_rows)
        )
        self.max_iterations = (
            int(max_iterations) if max_iterations is not None else MAX_ITERATIONS
        )

        values = self.values  # possibly sign-flipped by init_solve
        c = float(np.abs(values).max()) if values.size else 0.0
        toleration = self.get_toleration(c)

        start_from_optimal_eps = (
            start_eps is not None and start_eps < target_eps
        )
        if self.num_rows != self.num_cols:
            # Forward auction does not support ε-scaling on asymmetric
            # instances (`symmetric.rs:256-267`).
            start_from_optimal_eps = True
            eps0 = target_eps - _F64_EPSILON
        else:
            eps0 = float(start_eps) if start_eps is not None else c / 2.0

        # instance-reuse staging cache, as in KhoslaSolver.solve: repeat
        # solves on unchanged CSR state skip the device re-upload
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
        if start_prices is not None:
            start_prices = np.asarray(start_prices, dtype=np.float64)
            if start_prices.shape != (self.num_cols,):
                raise ValueError(
                    f"start_prices must have shape ({self.num_cols},)"
                )
            if self.num_rows != self.num_cols:
                # asymmetric warm starts are unsound (stale prices on
                # unused objects break the n·ε-optimality duality; see
                # KhoslaSolver.solve) — run cold, same reason the
                # reference disables ε-scaling here (symmetric.rs:256-267)
                import warnings

                warnings.warn(
                    "start_prices ignored: warm starts are unsound on "
                    "asymmetric instances (running cold; see "
                    "solve_with_params docstring)",
                    stacklevel=2,
                )
                start_prices = None
        (
            prices,
            p2o,
            o2p,
            num_unassigned,
            nits,
            nreductions,
            optimal_found,
            final_eps,
        ) = forward_solve_chunked(
            problem,
            eps0,
            target_eps,
            toleration,
            start_from_optimal_eps,
            self.max_iterations,
            start_prices=start_prices,
            value_bound=c,  # arms the infeasibility certificate
        )
        self.prices = np.asarray(prices, dtype=np.float64)
        solution.person_to_object = np.asarray(p2o)
        solution.object_to_person = np.asarray(o2p)
        solution.num_unassigned = int(num_unassigned)
        solution.eps = float(final_eps)
        self.nits = int(nits)
        self.nreductions = int(nreductions)
        self.optimal_soln_found = bool(optimal_found)
