"""Solver option matrix: dtypes, start_eps paths, engine flags."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import (
    ForwardAuctionSolver,
    KhoslaSolver,
)
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_symmetric_input,
)


def oracle(solver, maximize=False):
    big = -1e9 if maximize else 1e9
    mat = dense_cost_matrix(solver, big=big, original_units=True)
    r, c = linear_sum_assignment(mat, maximize=maximize)
    return float(mat[r, c].sum())


@pytest.mark.parametrize("cls", [KhoslaSolver, ForwardAuctionSolver])
def test_float32_dtype_path(cls):
    """The f32 fast path stays ε-optimal on integer-cost instances."""
    n = 32
    solver, solution = cls.new(n, n, n * n, dtype=np.float32)
    gen_symmetric_input(solver, 21, n, 0.2, 1.0, 100.0)
    solver.map_values(np.floor)
    solver.solve(solution, False)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-6


def test_forward_start_eps_below_target_skips_scaling():
    """start_eps < target ⇒ start_from_optimal_eps: no reductions and
    optimal declared on completion (symmetric.rs:251-255)."""
    n = 16
    solver, solution = ForwardAuctionSolver.new(n, n, n * n)
    gen_symmetric_input(solver, 4, n, 0.5, 1.0, 10.0)
    solver.solve_with_params(
        solution, False, eps=0.5, start_eps=0.01
    )
    assert solution.num_unassigned == 0
    assert solver.nreductions == 0
    assert solver.optimal_soln_found


def test_forward_explicit_start_eps_scaling():
    n = 16
    solver, solution = ForwardAuctionSolver.new(n, n, n * n)
    gen_symmetric_input(solver, 4, n, 0.5, 1.0, 10.0)
    solver.solve_with_params(
        solution, False, eps=None, start_eps=5.0
    )
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9


def test_khosla_explicit_eps():
    n = 16
    solver, solution = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, 4, n, 0.5, 1.0, 10.0)
    solver.solve(solution, False, eps=0.25)
    assert solution.eps == 0.25
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * 0.25 + 1e-9


def test_negative_values_reference_quirk():
    """All-negative values interact with the reference's values[0] sign
    heuristic (solver.rs:111-115, 214-216): negative inputs are treated
    as pre-negated costs, so 'maximize' selects the |cost|-largest
    matching and reports |sum|, and 'minimize' the |cost|-smallest.
    Pinned here because our JAX engines and the sequential C++ engine
    must agree with each other (and they match the Rust semantics)."""
    costs = [[-5.0, -2.0], [-3.0, -7.0]]
    for cls in (KhoslaSolver, ForwardAuctionSolver):
        solver, solution = cls.new(2, 2, 4)
        solver.init(2, 2)
        for i, row in enumerate(costs):
            solver.extend_from_values(i, [0, 1], row)
        solver.solve(solution, maximize=True)
        # stored values flip to {5,2;3,7}: picks 5+7, reports +12
        assert solver.get_objective(solution) == 12.0
        assert list(solution.person_to_object) == [0, 1]
        solver.init(2, 2)
        for i, row in enumerate(costs):
            solver.extend_from_values(i, [0, 1], row)
        solver.solve(solution, maximize=False)
        # no flip: auction maximizes {-2,-3}, reported sign-corrected +5
        assert solver.get_objective(solution) == 5.0
        assert list(solution.person_to_object) == [1, 0]


def test_hybrid_small_instance_handoff():
    """Instances below tail_threshold take the pure-native path inside
    the hybrid driver and stay correct."""
    n = 64
    solver, solution = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, 8, n, 0.2, 1.0, 10.0)
    solver.solve(solution, False, scale_eps=True, hybrid=True)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9
