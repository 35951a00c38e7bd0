"""Pins for documented deviations and API guards (VERDICT r2 items 5/7/8,
docs/PARITY.md).

- Single-arc forward bid: the reference bids +inf when a person has one
  arc (`symmetric.rs:359,378`), which poisons the price and livelocks
  after an ε-reduction reset; this package bids ``price + eps`` (the
  Khosla guard, `ksparse.rs:226`) and terminates optimally with finite
  prices.  Pinned here so the deviation cannot silently regress.
- ``ecs_satisfied`` requires a full assignment (raises instead of the
  reference's silent-False default, `solver.rs:163-170`).
- Asymmetric warm starts are ignored with a warning (unsound; see the
  solver docstrings).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import (
    ForwardAuctionSolver,
    KhoslaSolver,
    UNASSIGNED,
)


def test_single_arc_forward_terminates_optimally():
    # symmetric 3x3; person 2 has exactly ONE arc -> second-best profit
    # is -inf and the reference's bid rule produces +inf
    rows = [
        (0, [0, 1, 2], [5.0, 3.0, 8.0]),
        (1, [0, 1], [4.0, 7.0]),
        (2, [2], [2.0]),
    ]
    solver, solution = ForwardAuctionSolver.new(3, 3, 6)
    solver.init(3, 3)
    for i, cols, vals in rows:
        solver.extend_from_values(i, cols, vals)
    solver.solve(solution, maximize=False)

    assert solution.num_unassigned == 0
    assert np.all(np.isfinite(solver.prices)), "prices must stay finite"
    assert solver.nits < solver.max_iterations

    dense = np.full((3, 3), 1e6)
    for i, cols, vals in rows:
        dense[i, cols] = vals
    r, c = linear_sum_assignment(dense)
    assert solver.get_objective(solution) == pytest.approx(
        dense[r, c].sum(), abs=1e-9
    )


def test_ecs_satisfied_rejects_partial_assignment():
    solver, solution = KhoslaSolver.new(2, 2, 4)
    solver.init(2, 2)
    solver.extend_from_values(0, [0, 1], [1.0, 2.0])
    solver.extend_from_values(1, [0, 1], [3.0, 4.0])
    solver.solve(solution, maximize=False)
    tol = solver.get_toleration(4.0)
    # full assignment: evaluates fine
    assert solver.ecs_satisfied(solution.person_to_object, solution.eps, tol)
    partial = np.array(solution.person_to_object, copy=True)
    partial[1] = UNASSIGNED
    with pytest.raises(ValueError, match="full assignment"):
        solver.ecs_satisfied(partial, solution.eps, tol)


@pytest.mark.parametrize("cls", [KhoslaSolver, ForwardAuctionSolver])
def test_asymmetric_start_prices_warn_and_run_cold(cls):
    solver, solution = cls.new(2, 4, 8)
    solver.init(2, 4)
    solver.extend_from_values(0, [0, 1, 2, 3], [10.0, 6.0, 14.0, 1.0])
    solver.extend_from_values(1, [0, 1, 2], [17.0, 18.0, 16.0])
    warm = np.full(4, 100.0)
    kwargs = dict(start_prices=warm)
    with pytest.warns(UserWarning, match="start_prices ignored"):
        if cls is ForwardAuctionSolver:
            solver.solve_with_params(solution, False, **kwargs)
        else:
            solver.solve(solution, False, **kwargs)
    # cold-run result: the stale warm prices must not steer the matching
    assert solution.num_unassigned == 0
    assert solver.get_objective(solution) == pytest.approx(17.0, abs=1e-9)
