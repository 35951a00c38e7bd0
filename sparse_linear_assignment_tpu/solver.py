"""Base auction-solver: CSR construction, lifecycle, validation, evaluators.

TPU-native re-derivation of the reference's core solver abstraction
(``trait AuctionSolver`` default methods, ``/root/reference/src/solver.rs:8-243``).
The CSR triple (row offsets / per-row counts / column indices / values) is
built host-side in NumPy with the exact validation contract of the reference
(rows arrive in nondecreasing order, a row must be nonempty before the next
row starts, ``num_rows <= num_cols``).  The evaluators (`get_objective`,
`get_toleration`, `ecs_satisfied`) are vectorized NumPy equivalents of the
reference's sequential loops; the device-side (jit) versions used inside the
solve loop live in ``ops/auction.py`` (``ecs_margins`` /
``ecs_satisfied_device``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .solution import INDEX_DTYPE, UNASSIGNED, AuctionSolution


class AuctionSolver:
    """Shared base for :class:`KhoslaSolver` and :class:`ForwardAuctionSolver`.

    State mirrors the reference trait accessors
    (``/root/reference/src/solver.rs:23-38``): ``num_rows``/``num_cols``,
    ``prices``, and the CSR triple ``i_starts_stops``/``j_counts``/
    ``column_indices``/``values``.
    """

    #: dtype for prices/values on device; float64 matches the reference's
    #: f64 contract (objectives to 1e-9), float32 is the fast TPU path.
    dtype = np.float64

    def __init__(
        self,
        row_capacity: int = 0,
        column_capacity: int = 0,
        arcs_capacity: int = 0,
        dtype=np.float64,
    ):
        self.row_capacity = int(row_capacity)
        self.column_capacity = int(column_capacity)
        self.arcs_capacity = int(arcs_capacity)
        self.dtype = np.dtype(dtype)

        self.num_rows: int = 0
        self.num_cols: int = 0
        self.prices: np.ndarray = np.zeros(0, dtype=np.float64)

        # CSR storage: NumPy arrays preallocated at the capacity hints
        # (the reference's `new(row_capacity, column_capacity,
        # arcs_capacity)` preallocation contract, solver.rs:9-13 /
        # README.md:27-29) so instance reuse at capacity never
        # reallocates.  `_narcs`/`_nrows_built` are the live prefixes;
        # arrays grow by doubling when a hint is exceeded.  Sign flips
        # (solver.rs:214-216) happen in place; `_csr_version` bumps on
        # every mutation so device-staging caches key on it instead of
        # array identity.
        self._iss = np.zeros(max(self.row_capacity, 1) + 1, dtype=np.int64)
        self._jc = np.zeros(max(self.row_capacity, 1), dtype=np.int64)
        self._cols = np.empty(max(self.arcs_capacity, 0), dtype=INDEX_DTYPE)
        self._vals = np.empty(max(self.arcs_capacity, 0), dtype=np.float64)
        self._nrows_built = 1  # len(j_counts); reference seed [0] (rs:197-200)
        self._narcs = 0
        self._csr_version = 0

    # ------------------------------------------------------------------
    # classmethod constructor mirroring `AuctionSolver::new`
    # (/root/reference/src/solver.rs:9-13): returns (solver, solution).
    # ------------------------------------------------------------------
    @classmethod
    def new(
        cls,
        row_capacity: int,
        column_capacity: int,
        arcs_capacity: int,
        dtype=np.float64,
    ):
        solver = cls(row_capacity, column_capacity, arcs_capacity, dtype=dtype)
        return solver, AuctionSolution.new(row_capacity, column_capacity)

    # ------------------------------------------------------------------
    # CSR incremental builder (C5: solver.rs:41-106)
    # ------------------------------------------------------------------
    def init(self, num_rows: int, num_cols: int) -> None:
        """Reset CSR storage for a new problem (``solver.rs:191-205``)."""
        if not num_rows <= num_cols:
            raise ValueError(
                f"num_rows ({num_rows}) must be <= num_cols ({num_cols})"
            )
        if not num_rows < UNASSIGNED:
            raise ValueError("num_rows must be < the UNASSIGNED sentinel")
        self.num_rows = int(num_rows)
        self.num_cols = int(num_cols)
        # Reference pre-seeds i_starts_stops=[0,0], j_counts=[0]
        # (solver.rs:197-200); this shape is pinned by
        # test_cumulative_idx_diff (symmetric.rs:526-534).  Reset the
        # live prefixes only — the capacity-sized arrays survive, so
        # init + rebuild at capacity is allocation-free.
        self._iss[0] = 0
        self._iss[1] = 0
        self._jc[0] = 0
        self._nrows_built = 1
        self._narcs = 0
        self._csr_version += 1

    def _grow_arcs(self, extra: int) -> None:
        need = self._narcs + extra
        cap = self._cols.shape[0]
        if need > cap:
            new_cap = max(need, 2 * cap, 16)
            cols = np.empty(new_cap, dtype=INDEX_DTYPE)
            vals = np.empty(new_cap, dtype=np.float64)
            cols[: self._narcs] = self._cols[: self._narcs]
            vals[: self._narcs] = self._vals[: self._narcs]
            self._cols = cols
            self._vals = vals

    def _grow_rows(self, extra: int) -> None:
        need = self._nrows_built + extra
        if need > self._jc.shape[0]:
            new_cap = max(need, 2 * self._jc.shape[0], 16)
            jc = np.zeros(new_cap, dtype=np.int64)
            iss = np.zeros(new_cap + 1, dtype=np.int64)
            jc[: self._nrows_built] = self._jc[: self._nrows_built]
            iss[: self._nrows_built + 1] = self._iss[: self._nrows_built + 1]
            self._jc = jc
            self._iss = iss

    def add_value(self, row: int, column: int, value: float) -> None:
        """Append one arc; rows must arrive in nondecreasing order
        (``solver.rs:41-66``)."""
        current_row = self._nrows_built - 1
        if row != current_row and row != current_row + 1:
            raise ValueError(
                f"row {row} out of order (current row {current_row})"
            )
        cumulative_offset = int(self._iss[current_row + 1]) + 1
        if row > current_row:
            if not self._jc[current_row] > 0:
                raise ValueError(f"row {current_row} has no arcs")
            self._grow_rows(1)
            self._nrows_built += 1
            self._iss[self._nrows_built] = cumulative_offset
            self._jc[self._nrows_built - 1] = 1
        else:
            self._iss[current_row + 1] = cumulative_offset
            self._jc[current_row] += 1
        self._grow_arcs(1)
        self._cols[self._narcs] = int(column)
        self._vals[self._narcs] = float(value)
        self._narcs += 1
        self._csr_version += 1

    def extend_from_values(
        self, row: int, columns: Sequence[int], values: Sequence[float]
    ) -> None:
        """Append a whole row's arcs at once (``solver.rs:68-101``)."""
        columns = np.asarray(columns)
        values = np.asarray(values, dtype=np.float64)
        if len(columns) != len(values):
            raise ValueError("columns and values must have the same length")
        current_row = self._nrows_built - 1
        if row != current_row and row != current_row + 1:
            raise ValueError(
                f"row {row} out of order (current row {current_row})"
            )
        if columns.size and np.issubdtype(columns.dtype, np.number):
            cmin, cmax = columns.min(), columns.max()
            if not (-(2 ** 31) <= int(cmin) and int(cmax) < 2 ** 31):
                # would silently wrap in the int32 store and could then
                # dodge validate_input's range check (same guard as
                # extend_from_csr; add_value raises via int() natively)
                raise ValueError("column index out of int32 range")
        length_increment = len(columns)
        cumulative_offset = int(self._iss[current_row + 1]) + length_increment
        if row > current_row:
            if not self._jc[current_row] > 0:
                raise ValueError(f"row {current_row} has no arcs")
            self._grow_rows(1)
            self._nrows_built += 1
            self._iss[self._nrows_built] = cumulative_offset
            self._jc[self._nrows_built - 1] = length_increment
        else:
            self._iss[current_row + 1] = cumulative_offset
            self._jc[current_row] += length_increment
        self._grow_arcs(length_increment)
        self._cols[self._narcs: self._narcs + length_increment] = columns
        self._vals[self._narcs: self._narcs + length_increment] = values
        self._narcs += length_increment
        self._csr_version += 1

    def extend_from_csr(self, j_counts, column_indices, values) -> None:
        """Bulk-append whole rows from CSR arrays — semantically
        identical to calling :meth:`extend_from_values` once per row
        (``solver.rs:68-101`` contract: rows in order, every row
        nonempty), but vectorized for large ingests (the per-row path
        pays Python-level conversion per arc; at the n=1e5 headline
        instance that is ~600k scalar casts).

        ``j_counts[r]`` is row r's arc count; ``column_indices`` /
        ``values`` hold all rows' arcs concatenated in row order.  The
        appended rows continue after any rows already built; the
        current row must be complete (nonempty) first.
        """
        j_counts = np.asarray(j_counts, dtype=np.int64)
        columns = np.asarray(column_indices)
        values = np.asarray(values, dtype=np.float64)
        if j_counts.ndim != 1 or columns.ndim != 1 or values.ndim != 1:
            raise ValueError("extend_from_csr expects 1-D arrays")
        if len(columns) != len(values):
            raise ValueError("columns and values must have the same length")
        if j_counts.size == 0:
            if len(columns):
                raise ValueError("j_counts must sum to len(values)")
            return
        if int(j_counts.min()) <= 0:
            raise ValueError(
                f"row {int(np.argmin(j_counts))} of the appended block "
                "has no arcs"
            )
        if int(j_counts.sum()) != len(values):
            raise ValueError("j_counts must sum to len(values)")
        if not np.issubdtype(columns.dtype, np.integer):
            cols64 = columns.astype(np.int64)
            if not np.array_equal(cols64, columns):
                raise ValueError("column indices must be integers")
            columns = cols64
        if columns.size and not (
            -(2 ** 31) <= int(columns.min())
            and int(columns.max()) < 2 ** 31
        ):
            # would silently wrap in the int32 store and could then dodge
            # validate_input's range check
            raise ValueError("column index out of int32 range")
        current_row = self._nrows_built - 1
        fresh = current_row == 0 and self._jc[0] == 0
        if not fresh and self._jc[current_row] == 0:
            raise ValueError(f"row {current_row} has no arcs")
        base = int(self._iss[self._nrows_built])
        k = int(j_counts.shape[0])
        if fresh:
            # reference pre-seed is [0, 0] / [0]: the first appended row
            # IS row 0 (same state extend_from_values reaches)
            self._grow_rows(k - 1)
            self._jc[:k] = j_counts
            self._iss[0] = 0
            np.cumsum(j_counts, out=self._iss[1: k + 1])
            self._nrows_built = k
        else:
            self._grow_rows(k)
            start = self._nrows_built
            self._jc[start: start + k] = j_counts
            self._iss[start + 1: start + 1 + k] = base + np.cumsum(j_counts)
            self._nrows_built = start + k
        self._grow_arcs(len(values))
        self._cols[self._narcs: self._narcs + len(values)] = columns
        self._vals[self._narcs: self._narcs + len(values)] = values
        self._narcs += len(values)
        self._csr_version += 1

    def extend_from_scipy_csr(self, matrix) -> None:
        """Append a ``scipy.sparse`` matrix's rows (converted to CSR) as
        arcs: row r gains an arc to column j with value ``matrix[r, j]``
        for every *stored* entry (explicit zeros included — a stored
        zero is a legal arc value, exactly as in the incremental
        builder).  Every row must have at least one stored entry (the
        reference's nonempty-row contract, ``solver.rs:55,91``)."""
        csr = matrix.tocsr()
        self.extend_from_csr(
            np.diff(csr.indptr), csr.indices, csr.data
        )

    def num_of_arcs(self) -> int:
        return self._narcs

    # Array views of the CSR state (accessors in the reference trait).
    # Zero-copy views into the preallocated storage, returned
    # READ-ONLY: the device-staging caches key on `_csr_version`, so a
    # silent external in-place edit would leave a stale staged problem
    # (auction on old costs, objective on new — the review repro).
    # Mutate through the builder methods or :meth:`map_values`.
    @staticmethod
    def _ro(view: np.ndarray) -> np.ndarray:
        view.flags.writeable = False  # view-local; storage stays writable
        return view

    @property
    def i_starts_stops(self) -> np.ndarray:
        return self._ro(self._iss[: self._nrows_built + 1])

    @property
    def j_counts(self) -> np.ndarray:
        return self._ro(self._jc[: self._nrows_built])

    @property
    def column_indices(self) -> np.ndarray:
        return self._ro(self._cols[: self._narcs])

    @property
    def values(self) -> np.ndarray:
        return self._ro(self._vals[: self._narcs])

    def map_values(self, func) -> None:
        """Apply ``func`` to the stored arc values in place (e.g.
        ``solver.map_values(np.floor)`` to make costs integral) and
        invalidate any staged device problem.  This is the supported
        mutation route — the ``values`` property is a read-only view
        precisely so an untracked edit cannot leave stale device
        state."""
        vals = self._vals[: self._narcs]
        out = func(vals)
        # Accept both conventions: a func that mutated its argument in
        # place and returned None, and one that returned a new array.
        # A scalar / wrong-shape return would silently broadcast over
        # every arc value — reject it instead (ADVICE r4 #2).
        if out is not None and out is not vals:
            out = np.asarray(out)
            if out.shape != vals.shape:
                raise ValueError(
                    f"map_values func returned shape {out.shape}, "
                    f"expected {vals.shape} (or None for in-place)"
                )
            vals[:] = out
        self._csr_version += 1

    # ------------------------------------------------------------------
    # Lifecycle (C6: solver.rs:191-243)
    # ------------------------------------------------------------------
    def validate_input(self) -> None:
        """Sanity checks before a solve (``solver.rs:232-243``)."""
        arcs_count = self.num_of_arcs()
        if not arcs_count > 0:
            raise ValueError("no arcs")
        if not (self.num_rows > 0 and self.num_cols > 0):
            raise ValueError("empty problem")
        if not arcs_count < UNASSIGNED:
            raise ValueError("too many arcs for int32 indexing")
        cols = self.column_indices
        if cols.size and int(cols.max()) >= self.num_cols:
            raise ValueError("column index out of range")

    def init_solve(self, solution: AuctionSolution, maximize: bool) -> None:
        """Reset per-solve state; flip stored value signs when
        ``maximize ^ positive_values`` exactly like the reference
        (``solver.rs:207-230``) so minimize runs as max-profit auction on
        negated values and solving twice re-flips correctly."""
        vals = self._vals[: self._narcs]
        positive_values = bool(vals[0] >= 0.0) if vals.size else True
        if maximize ^ positive_values:
            np.negative(vals, out=vals)  # in place, like the reference
            self._csr_version += 1

        # Fresh arrays (not in-place refills): callers legitimately hold
        # solver.prices / solution.person_to_object across solves
        # (warm starts pass solver.prices back in), and these
        # allocations are ~50 us at n=1e5 — noise next to the solve.
        self.prices = np.zeros(self.num_cols, dtype=np.float64)
        solution.person_to_object = np.full(
            self.num_rows, UNASSIGNED, dtype=INDEX_DTYPE
        )
        solution.object_to_person = np.full(
            self.num_cols, UNASSIGNED, dtype=INDEX_DTYPE
        )
        solution.num_unassigned = self.num_rows

    # ------------------------------------------------------------------
    # Evaluators (C7, C8: solver.rs:108-189)
    # ------------------------------------------------------------------
    def get_objective(self, solution: AuctionSolution) -> float:
        """Objective of the current assignment in original cost units.

        Vectorized equivalent of the reference's row re-scan
        (``solver.rs:108-142``) including the values[0]-sign quirk: stored
        values may have been negated by ``init_solve``; the reported
        objective is sign-corrected so it is always in original units.
        """
        vals = self.values
        cols = self.column_indices
        if vals.size == 0:
            return 0.0
        positive_values = bool(vals[0] >= 0.0)
        p2o = np.asarray(solution.person_to_object)
        starts = self.i_starts_stops
        counts = self.j_counts

        # arc -> owning row, then match each arc's column against the
        # row's chosen object; unassigned rows (sentinel) never match.
        row_of_arc = np.repeat(
            np.arange(len(counts), dtype=np.int64), counts.astype(np.int64)
        )
        chosen = p2o[row_of_arc].astype(np.int64)
        matched = cols.astype(np.int64) == chosen
        obj = float(vals[matched].sum())
        del starts
        return obj if positive_values else -obj

    def get_toleration(self, max_abs_cost: float) -> float:
        """Float tolerance for the ε-CS certificate (``solver.rs:144-146``):
        one ulp-style bound at the magnitude of the largest cost."""
        # Rust truncates log2 toward zero and saturates negatives at 0 when
        # casting f64 -> u32.
        exp = max(0, int(np.log2(max_abs_cost + 1e-7)))
        return float(2.0 ** (exp - 53))

    def ecs_satisfied(
        self, person_to_object: np.ndarray, eps: float, toleration: float
    ) -> bool:
        """ε-complementary-slackness check (``solver.rs:154-189``):
        for every person i with chosen object j,
        ``max_k (a_ik - p_k) - eps <= a_ij - p_j + tol``.

        Precondition: ``person_to_object`` must be a full assignment.
        The reference shares this precondition implicitly (an unassigned
        person's chosen profit defaults to −inf, `solver.rs:163-170`,
        so the check can only fail); raising makes the misuse
        impossible instead of silently returning False.
        """
        vals = self.values
        cols = self.column_indices.astype(np.int64)
        counts = self.j_counts.astype(np.int64)
        prices = self.prices
        p2o = np.asarray(person_to_object).astype(np.int64)
        if np.any(p2o >= len(prices)):
            raise ValueError(
                "ecs_satisfied requires a full assignment: "
                f"{int(np.sum(p2o >= len(prices)))} persons are "
                "unassigned (the certificate is undefined for partial "
                "matchings)"
            )

        row_of_arc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        profit = vals - prices[cols]
        chosen = p2o[row_of_arc]
        is_chosen = cols == chosen
        # chosen profit per row (−inf when the chosen object is not among
        # the row's arcs, matching the reference's NEG_INFINITY default)
        chosen_value = np.full(len(counts), -np.inf)
        np.maximum.at(chosen_value, row_of_arc[is_chosen], vals[is_chosen])
        safe_j = np.where(p2o < len(prices), p2o, 0)
        lhs = chosen_value - prices[safe_j] + toleration
        # max profit per row
        max_profit = np.full(len(counts), -np.inf)
        np.maximum.at(max_profit, row_of_arc, profit)
        return bool(np.all(lhs >= max_profit - eps))
