"""Fixed hand-checked cases (reference: solver.rs:339-418, sourced from
gatagat/lap's lapjv test data) plus the README toy example
(README.md:9-58, ksparse.rs:22-72)."""

import numpy as np
import pytest

from sparse_linear_assignment_tpu import (
    UNASSIGNED,
    ForwardAuctionSolver,
    KhoslaSolver,
)

SOLVERS = [KhoslaSolver, ForwardAuctionSolver]

M = UNASSIGNED

# (maximize, costs, optimal_cost, set of acceptable optimal person_to_object)
# Case 2 (3x3) has two optimal assignments of equal cost 22; the reference
# pins the one its sequential tie-breaking produces — any optimal matching
# with the exact optimal cost is correct.
CASES = [
    (
        False,
        [
            [1000, 2, 11, 10, 8, 7, 6, 5],
            [6, 1000, 1, 8, 8, 4, 6, 7],
            [5, 12, 1000, 11, 8, 12, 3, 11],
            [11, 9, 10, 1000, 1, 9, 8, 10],
            [11, 11, 9, 4, 1000, 2, 10, 9],
            [12, 8, 5, 2, 11, 1000, 11, 9],
            [10, 11, 12, 10, 9, 12, 1000, 3],
            [10, 10, 10, 10, 6, 3, 1, 1000],
        ],
        17.0,
        {(1, 2, 0, 4, 5, 3, 7, 6)},
    ),
    (
        False,
        [[10, 10, 13], [4, 8, 8], [8, 5, 8]],
        13.0 + 4.0 + 5.0,
        {(1, 0, 2), (2, 0, 1)},
    ),
    (
        False,
        [
            [10, 6, 14, 1],
            [17, 18, 17, 15],
            [14, 17, 15, 8],
            [11, 13, 11, 4],
        ],
        6.0 + 17.0 + 14.0 + 4.0,
        {(1, 2, 0, 3)},
    ),
    # one person (asymmetric 1x4)
    (False, [[10, 6, 14, 1]], 1.0, {(3,)}),
]


def populate_dense(solver, costs):
    solver.init(len(costs), len(costs[0]))
    for i, row in enumerate(costs):
        solver.extend_from_values(
            i, list(range(len(row))), [float(v) for v in row]
        )


@pytest.mark.parametrize("cls", SOLVERS)
@pytest.mark.parametrize("case", range(len(CASES)))
def test_fixed_cases(cls, case):
    maximize, costs, optimal_cost, optimal_p2os = CASES[case]
    solver, solution = cls.new(10, 10, 100)
    populate_dense(solver, costs)
    solver.solve(solution, maximize)
    assert solution.num_unassigned == 0
    assert solver.get_objective(solution) == optimal_cost
    p2o = tuple(int(x) for x in solution.person_to_object)
    assert p2o in optimal_p2os, p2o
    # object_to_person must be the inverse of person_to_object
    o2p = np.asarray(solution.object_to_person)
    for i, j in enumerate(p2o):
        assert o2p[j] == i
    assert int((o2p != M).sum()) == len(costs)


@pytest.mark.parametrize("cls", SOLVERS)
def test_readme_example(cls):
    # ksparse.rs:22-72 / symmetric.rs:23-74 doc-test
    weights = [[10, 6, 14, 1], [17, 18, 16]]
    solver, solution = cls.new(10, 10, 100)
    solver.init(2, 4)
    for i, row in enumerate(weights):
        solver.extend_from_values(
            i, list(range(len(row))), [float(v) for v in row]
        )
    solver.solve(solution, maximize=False)
    assert solution.num_unassigned == 0
    assert solver.get_objective(solution) == 1.0 + 16.0
    assert list(solution.person_to_object) == [3, 2]
    assert list(solution.object_to_person) == [M, M, 1, 0]


@pytest.mark.parametrize("cls", SOLVERS)
def test_solver_reuse_and_maximize_reflip(cls):
    """Reference contract: the solver instance is reusable and the
    maximize re-flip of stored values round-trips (solver.rs:294-315,
    init_solve sign quirk solver.rs:207-230)."""
    costs = [[10, 10, 13], [4, 8, 8], [8, 5, 8]]
    solver, solution = cls.new(3, 3, 9)
    results = []
    for maximize in (False, True, False, True):
        populate_dense(solver, costs)
        solver.solve(solution, maximize)
        assert solution.num_unassigned == 0
        results.append(solver.get_objective(solution))
    assert results[0] == results[2] == 22.0
    assert results[1] == results[3] == 13.0 + 8.0 + 8.0
