"""Warm-started prices on the public solve surface (SURVEY.md §5.4).

The reference persists prices across ε-reduction restarts inside one
solve (`symmetric.rs:290-324`); the TPU framework additionally exposes
them as a solve argument so repeated solves of similar instances reuse
the dual information.  On SYMMETRIC instances ε-CS optimality at
termination holds for any start prices (every perfect matching uses
all objects, so price sums cancel in the duality argument), and the
assertions here are oracle-checked objectives plus the round-count
saving.  On ASYMMETRIC instances warm starts are unsound and the
solvers ignore them (see test_khosla_warmstart_asymmetric_ignored).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import ForwardAuctionSolver, KhoslaSolver
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_symmetric_input,
)


def _oracle_bounds(solver, solution):
    mat = dense_cost_matrix(solver, big=1e9, original_units=True)
    r, c = linear_sum_assignment(mat)
    want = float(mat[r, c].sum())
    got = solver.get_objective(solution)
    n = solver.num_rows
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9, (want, got)


def test_khosla_warmstart_same_instance_fewer_rounds():
    n = 256
    solver, solution = KhoslaSolver.new(n, n, 20 * n)
    gen_symmetric_input(solver, 21, n, 0.05, 0.0, 10.0)
    solver.solve(solution, maximize=False, compact=True)
    cold_nits = solver.nits
    assert solution.num_unassigned == 0
    _oracle_bounds(solver, solution)
    warm_prices = solver.prices.copy()

    solver.solve(
        solution, maximize=False, compact=True, start_prices=warm_prices
    )
    assert solution.num_unassigned == 0
    _oracle_bounds(solver, solution)
    # warm duals make the re-solve much cheaper
    assert solver.nits <= cold_nits


def test_khosla_warmstart_scaled_path():
    n = 128
    solver, solution = KhoslaSolver.new(n, n, 20 * n)
    gen_symmetric_input(solver, 4, n, 0.1, 0.0, 10.0)
    solver.solve(solution, maximize=False, scale_eps=True)
    _oracle_bounds(solver, solution)
    warm = solver.prices.copy()
    solver.solve(
        solution, maximize=False, scale_eps=True, start_prices=warm
    )
    assert solution.num_unassigned == 0
    _oracle_bounds(solver, solution)


def test_forward_warmstart():
    n = 64
    rng = np.random.default_rng(13)
    costs = rng.integers(1, 100, size=(n, n)).astype(np.float64)
    solver, solution = ForwardAuctionSolver.new(n, n, n * n)
    solver.init(n, n)
    for i in range(n):
        solver.extend_from_values(i, range(n), costs[i])
    solver.solve(solution, maximize=False)
    cold_nits = solver.nits
    obj_cold = solver.get_objective(solution)
    warm = solver.prices.copy()

    # warm re-solve: skip the ladder by starting at the target eps
    solver.solve_with_params(
        solution, maximize=False, start_eps=0.5 / n, start_prices=warm
    )
    assert solution.num_unassigned == 0
    obj_warm = solver.get_objective(solution)
    # integer costs, eps < 1/n on both: exact optimum both times
    assert abs(obj_cold - obj_warm) < 1e-9
    assert solver.nits < cold_nits


def test_khosla_warmstart_shape_validation():
    n = 16
    solver, solution = KhoslaSolver.new(n, n, 4 * n)
    gen_symmetric_input(solver, 2, n, 0.5, 0.0, 10.0)
    try:
        solver.solve(solution, start_prices=np.zeros(n + 1))
    except ValueError as e:
        assert "start_prices" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_khosla_warmstart_asymmetric_ignored():
    """Warm prices on ASYMMETRIC instances are unsound (an ε-CS matching
    is only n·ε-optimal when every matching uses the same object set;
    stale prices on spare objects steer the auction away from optimal
    arcs while the certificate still passes — measured 30 % excess
    objective before the guard).  The solver must run cold instead and
    stay oracle-optimal."""
    from sparse_linear_assignment_tpu.generators import gen_ksparse_uniform

    solver, solution = KhoslaSolver.new(50, 120, 50 * 6)
    gen_ksparse_uniform(solver, 5, 50, 120, 6, max_value=9.0)
    solver.solve(solution, maximize=False)
    obj_cold = solver.get_objective(solution)
    _oracle_bounds(solver, solution)
    warm = solver.prices.copy()
    solver.solve(solution, maximize=False, start_prices=warm)
    _oracle_bounds(solver, solution)
    assert abs(solver.get_objective(solution) - obj_cold) <= (
        2 * 50 * solution.eps + 1e-9
    )


@pytest.mark.parametrize("rekw", [
    {},                                   # plain device solve
    {"scale_eps": True},                  # ε-scaled
    {"scale_eps": True, "hybrid": True},  # hybrid
])
def test_warm_start_after_scaled_solve_stays_complete(rekw):
    """Regression: ε-scaled solves leave uniformly inflated price
    levels; re-solving warm used to trip the cold-start drop threshold
    `(M/2)(span+eps)` and spuriously drop persons on a feasible
    symmetric instance (found by experiments/exp_consistency_sweep.py).
    Warm prices are now normalized (shift-invariant) and the threshold
    extended by the residual spread, so every warm re-solve must stay
    complete and n·ε-optimal."""
    from sparse_linear_assignment_tpu.generators import (
        gen_ksparse_uniform,
    )

    n = m = 10
    solver, solution = KhoslaSolver.new(n, m, n * 10)
    gen_ksparse_uniform(solver, 7, n, m, 2, max_value=50.0)
    solver.solve(solution, False, scale_eps=True, hybrid=True)
    cold_obj = solver.get_objective(solution)
    warm = solver.prices.copy()
    # the failing precondition: inflated warm level above the cold
    # drop threshold (max price 250.7 vs threshold ~245.7 on this seed)
    assert warm.max() > (m / 2.0) * (49.0 + solution.eps) * 0.99
    solver.solve(solution, False, start_prices=warm, **rekw)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    assert abs(got - cold_obj) <= n * solution.eps + 1e-9, (got, cold_obj)


@pytest.mark.parametrize("n,seed", [
    (10, 269786713), (6, 394149180), (9, 485835358),
])
@pytest.mark.parametrize("hybrid", [False, True])
def test_ladder_phase_boundary_never_drops_feasible(n, seed, hybrid):
    """Regression: the Khosla ε-ladder carried prices from a larger-ε
    phase into the next phase's SMALLER cold-start drop threshold;
    wide-span small feasible instances then spuriously dropped persons
    (3/36 random hits in the hunt that found this).  Each phase's
    threshold is now shifted by its start price level; these pinned
    cases must complete at the exact oracle optimum."""
    from sparse_linear_assignment_tpu.generators import (
        gen_ksparse_uniform,
    )

    solver, solution = KhoslaSolver.new(n, n, n * 10)
    gen_ksparse_uniform(solver, seed, n, n, 2, max_value=1000.0)
    mat = dense_cost_matrix(solver, big=1e9, original_units=True)
    r, c = linear_sum_assignment(mat)
    want = float(mat[r, c].sum())
    solver.solve(solution, False, scale_eps=True, hybrid=hybrid)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9, (got, want)
    # the native eps-ladder (the auto-router's default for large
    # symmetric instances) shares the hybrid driver and must inherit
    # the per-phase threshold shift
    solver._solve_native_ladder(solution, False, None)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9, (got, want)
