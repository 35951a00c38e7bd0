"""CSR builder contract tests (reference: solver.rs:41-106, 191-243 and
the bookkeeping test at symmetric.rs:526-534)."""

import numpy as np
import pytest

from sparse_linear_assignment_tpu import ForwardAuctionSolver, KhoslaSolver

SOLVERS = [KhoslaSolver, ForwardAuctionSolver]


@pytest.mark.parametrize("cls", SOLVERS)
def test_cumulative_idx_diff(cls):
    # mirrors test_cumulative_idx_diff (symmetric.rs:526-534)
    arr = [0, 0, 0, 1, 1, 1, 1]
    solver, _ = cls.new(len(arr), len(arr), len(arr))
    solver.init(len(arr), len(arr))
    for i in arr:
        solver.add_value(i, 0, 0.0)
    assert list(solver.i_starts_stops) == [0, 3, 7]
    assert list(solver.j_counts) == [3, 4]
    assert solver.num_of_arcs() == 7


@pytest.mark.parametrize("cls", SOLVERS)
def test_init_preseeds(cls):
    # init pre-seeds i_starts_stops=[0,0], j_counts=[0] (solver.rs:197-200)
    solver, _ = cls.new(4, 4, 16)
    solver.init(2, 4)
    assert list(solver.i_starts_stops) == [0, 0]
    assert list(solver.j_counts) == [0]


@pytest.mark.parametrize("cls", SOLVERS)
def test_row_order_enforced(cls):
    solver, _ = cls.new(4, 4, 16)
    solver.init(3, 4)
    solver.add_value(0, 0, 1.0)
    with pytest.raises(ValueError):
        solver.add_value(2, 0, 1.0)  # skipped a row
    with pytest.raises(ValueError):
        solver.extend_from_values(3, [0], [1.0])


@pytest.mark.parametrize("cls", SOLVERS)
def test_empty_row_rejected(cls):
    solver, _ = cls.new(4, 4, 16)
    solver.init(2, 4)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 1, 2.0)
    assert list(solver.j_counts) == [1, 1]


@pytest.mark.parametrize("cls", SOLVERS)
def test_mismatched_lengths(cls):
    solver, _ = cls.new(4, 4, 16)
    solver.init(1, 4)
    with pytest.raises(ValueError):
        solver.extend_from_values(0, [0, 1], [1.0])


@pytest.mark.parametrize("cls", SOLVERS)
def test_rows_must_not_exceed_cols(cls):
    solver, _ = cls.new(4, 4, 16)
    with pytest.raises(ValueError):
        solver.init(5, 4)  # num_rows <= num_cols (solver.rs:192)


@pytest.mark.parametrize("cls", SOLVERS)
def test_validate_empty(cls):
    solver, sol = cls.new(4, 4, 16)
    solver.init(1, 1)
    with pytest.raises(ValueError):
        solver.solve(sol, False)  # no arcs


@pytest.mark.parametrize("cls", SOLVERS)
def test_column_out_of_range(cls):
    solver, sol = cls.new(4, 4, 16)
    solver.init(1, 2)
    solver.add_value(0, 5, 1.0)
    with pytest.raises(ValueError):
        solver.solve(sol, False)


@pytest.mark.parametrize("cls", SOLVERS)
def test_extend_from_csr_matches_per_row(cls):
    # the bulk ingest is definitionally one extend_from_values per row
    rng = np.random.default_rng(5)
    n, m = 12, 16
    counts = rng.integers(1, 5, size=n)
    cols = np.concatenate(
        [np.sort(rng.choice(m, size=c, replace=False)) for c in counts]
    )
    vals = rng.uniform(-3.0, 7.0, size=cols.shape[0])

    a, sol_a = cls.new(n, m, cols.size)
    a.init(n, m)
    a.extend_from_csr(counts, cols, vals)

    b, sol_b = cls.new(n, m, cols.size)
    b.init(n, m)
    start = 0
    for i, c in enumerate(counts):
        b.extend_from_values(i, cols[start:start + c], vals[start:start + c])
        start += c

    assert list(a.i_starts_stops) == list(b.i_starts_stops)
    assert list(a.j_counts) == list(b.j_counts)
    assert list(a.column_indices) == list(b.column_indices)
    assert np.allclose(a.values, b.values)
    a.solve(sol_a, False)
    b.solve(sol_b, False)
    assert a.get_objective(sol_a) == b.get_objective(sol_b)
    assert list(sol_a.person_to_object) == list(sol_b.person_to_object)


@pytest.mark.parametrize("cls", SOLVERS)
def test_extend_from_csr_appends_after_per_row(cls):
    solver, _ = cls.new(4, 4, 16)
    solver.init(4, 4)
    solver.extend_from_values(0, [0, 1], [1.0, 2.0])
    solver.extend_from_csr([1, 2], [2, 0, 3], [3.0, 4.0, 5.0])
    assert list(solver.i_starts_stops) == [0, 2, 3, 5]
    assert list(solver.j_counts) == [2, 1, 2]
    solver.add_value(3, 1, 6.0)  # per-row build continues after bulk
    assert list(solver.j_counts) == [2, 1, 2, 1]


@pytest.mark.parametrize("cls", SOLVERS)
def test_extend_from_csr_validation(cls):
    solver, _ = cls.new(4, 4, 16)
    solver.init(4, 4)
    with pytest.raises(ValueError):  # zero-count row in the block
        solver.extend_from_csr([2, 0], [0, 1], [1.0, 2.0])
    with pytest.raises(ValueError):  # counts/arcs mismatch
        solver.extend_from_csr([2, 2], [0, 1, 2], [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):  # columns/values mismatch
        solver.extend_from_csr([2], [0, 1], [1.0])
    with pytest.raises(ValueError):  # non-integral column indices
        solver.extend_from_csr([1], [0.5], [1.0])
    solver.extend_from_csr([], [], [])  # empty block is a no-op
    assert list(solver.j_counts) == [0]


def test_extend_from_scipy_csr():
    scipy_sparse = pytest.importorskip("scipy.sparse")
    rng = np.random.default_rng(9)
    # integer values: n*eps = 6/8 < 1 makes the auction exactly optimal
    dense = np.where(
        rng.random((6, 8)) < 0.5,
        rng.integers(1, 9, (6, 8)).astype(np.float64),
        0.0,
    )
    dense[np.arange(6), rng.permutation(8)[:6]] = 5.0  # nonempty rows
    mat = scipy_sparse.csr_matrix(dense)

    solver, sol = KhoslaSolver.new(6, 8, 48)
    solver.init(6, 8)
    solver.extend_from_scipy_csr(mat)
    assert solver.num_of_arcs() == mat.nnz
    solver.solve(sol, False)
    assert sol.num_unassigned == 0
    # objective matches the dense oracle restricted to stored arcs
    from scipy.optimize import linear_sum_assignment

    oracle = np.where(dense == 0.0, 1e9, dense)
    r, c = linear_sum_assignment(oracle)
    assert np.isclose(solver.get_objective(sol), oracle[r, c].sum())


def test_get_toleration():
    # solver.rs:144-146: 1 / 2^(53 - trunc(log2(C + 1e-7)))
    solver, _ = KhoslaSolver.new(1, 1, 1)
    assert solver.get_toleration(1000.0) == 2.0 ** (9 - 53)
    assert solver.get_toleration(10.0) == 2.0 ** (3 - 53)
    assert solver.get_toleration(1.0) == 2.0 ** (0 - 53)


@pytest.mark.parametrize("cls", SOLVERS)
def test_capacity_hints_preallocate_and_reuse(cls):
    """Capacity hints (solver.rs:9-13, README.md:27-29): storage is
    preallocated at arcs/row capacity and init()+rebuild at capacity is
    allocation-free (same buffers, no growth)."""
    n, k = 64, 4
    solver, solution = cls.new(n, n, n * k)
    assert solver._cols.shape[0] == n * k
    assert solver._vals.shape[0] == n * k

    def build(shift):
        solver.init(n, n)
        for i in range(n):
            cols = [(i + j + shift) % n for j in range(k)]
            solver.extend_from_values(i, sorted(cols), [1.0 + c for c in sorted(cols)])

    build(0)
    bufs = (id(solver._cols), id(solver._vals), id(solver._jc), id(solver._iss))
    solver.solve(solution, False)
    assert solution.num_unassigned == 0
    build(1)  # rebuild within capacity
    assert bufs == (
        id(solver._cols), id(solver._vals), id(solver._jc), id(solver._iss)
    ), "rebuild at capacity reallocated storage"
    solver.solve(solution, False)
    assert solution.num_unassigned == 0


@pytest.mark.parametrize("cls", SOLVERS)
def test_capacity_overflow_grows(cls):
    """Exceeding the hints grows storage transparently (doubling)."""
    solver, solution = cls.new(2, 4, 1)
    solver.init(3, 4)
    for i in range(3):
        solver.extend_from_values(i, [0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0])
    assert solver.num_of_arcs() == 12
    solver.solve(solution, False)
    assert solution.num_unassigned == 0


def test_staged_cache_invalidated_by_value_mutation():
    """The device-staging cache keys on _csr_version: an in-place value
    edit plus version bump must restage (not reuse stale device data)."""
    n = 16
    solver, solution = KhoslaSolver.new(n, n, n * n)
    solver.init(n, n)
    rng = np.random.default_rng(5)
    costs = rng.integers(1, 50, size=(n, n)).astype(float)
    for i in range(n):
        solver.extend_from_values(i, list(range(n)), list(costs[i]))
    solver.solve(solution, False, eps=1.0 / (n + 1))
    obj1 = solver.get_objective(solution)
    # mutate values through the supported route (doubling them)
    solver.map_values(lambda v: v * 2.0)
    solver.solve(solution, False, eps=1.0 / (n + 1))
    obj2 = solver.get_objective(solution)
    assert obj2 == pytest.approx(2.0 * obj1, rel=1e-6)


def test_map_values_inplace_and_shape_guard():
    """map_values accepts an in-place func returning None and rejects a
    scalar return (which would silently broadcast) — ADVICE r4 #2."""
    solver, _ = KhoslaSolver.new(2, 2, 4)
    solver.init(2, 2)
    solver.extend_from_values(0, [0, 1], [1.5, 2.5])
    solver.extend_from_values(1, [0, 1], [3.5, 4.5])

    def floor_inplace(v):
        np.floor(v, out=v)  # mutates, returns None via the test wrapper

    solver.map_values(lambda v: floor_inplace(v))
    assert list(solver.values) == [1.0, 2.0, 3.0, 4.0]

    with pytest.raises(ValueError, match="shape"):
        solver.map_values(lambda v: 7.0)
    # values untouched by the rejected call
    assert list(solver.values) == [1.0, 2.0, 3.0, 4.0]
