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


def test_get_toleration():
    # solver.rs:144-146: 1 / 2^(53 - trunc(log2(C + 1e-7)))
    solver, _ = KhoslaSolver.new(1, 1, 1)
    assert solver.get_toleration(1000.0) == 2.0 ** (9 - 53)
    assert solver.get_toleration(10.0) == 2.0 ** (3 - 53)
    assert solver.get_toleration(1.0) == 2.0 ** (0 - 53)
