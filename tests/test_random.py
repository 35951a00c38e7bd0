"""Randomized cross-checks against an independent optimal oracle.

The reference's random tests (solver.rs:294-337, 419-437) assert exact f64
objectives that depend on Rust's ChaCha8 streams and the sequential
solvers' iteration order — not reproducible in a re-architected solver
(SURVEY.md §4).  Instead: seeded NumPy instances are checked for

(a) optimality against ``scipy.optimize.linear_sum_assignment`` on the
    densified matrix (exact for feasible instances),
(b) the ε-CS certificate via the ported ``ecs_satisfied`` (solver.rs:154-189),
(c) matching validity (both directions consistent).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import (
    UNASSIGNED,
    ForwardAuctionSolver,
    KhoslaSolver,
)
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_asymmetric_input,
    gen_ksparse_uniform,
    gen_symmetric_input,
)

SOLVERS = [KhoslaSolver, ForwardAuctionSolver]
BIG = 1e9


def oracle_objective(solver, maximize: bool) -> float:
    mat = dense_cost_matrix(solver, big=BIG if not maximize else -BIG,
                            original_units=True)
    row, col = linear_sum_assignment(mat, maximize=maximize)
    assert np.all(np.abs(mat[row, col]) < BIG), "oracle used a missing arc"
    return float(mat[row, col].sum())


def check_matching(solution, num_rows, num_cols):
    p2o = np.asarray(solution.person_to_object)
    o2p = np.asarray(solution.object_to_person)
    assigned = p2o != UNASSIGNED
    # all assigned objects distinct and inverse-consistent
    objs = p2o[assigned]
    assert len(set(objs.tolist())) == len(objs)
    for i in np.nonzero(assigned)[0]:
        assert o2p[p2o[i]] == i
    assert solution.num_unassigned == int((~assigned).sum())


@pytest.mark.parametrize("cls", SOLVERS)
@pytest.mark.parametrize("maximize", [False, True])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_symmetric_random_vs_oracle(cls, maximize, seed):
    n = 40
    solver, solution = cls.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, density=0.12, min_value=500.0,
                        max_value=1000.0)
    solver.solve(solution, maximize)
    assert solution.num_unassigned == 0
    check_matching(solution, n, n)
    got = solver.get_objective(solution)
    want = oracle_objective(solver, maximize)
    # continuous values: ε-optimality gap is at most n * eps
    eps_bound = n * (solution.eps if np.isfinite(solution.eps) else 1.0)
    if maximize:
        assert got <= want + 1e-9
        assert got >= want - eps_bound - 1e-9
    else:
        assert got >= want - 1e-9
        assert got <= want + eps_bound + 1e-9


@pytest.mark.parametrize("cls", SOLVERS)
@pytest.mark.parametrize("seed", [1, 2])
def test_symmetric_integer_exact_optimal(cls, seed):
    """Integer costs with eps below the integrality threshold: the found
    objective must be *exactly* optimal (matches the reference's exact
    assertions philosophy with an independent oracle)."""
    n = 24
    solver, solution = cls.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, density=0.2, min_value=500.0,
                        max_value=1000.0)
    # make values integral
    solver.map_values(np.floor)
    solver.solve(solution, False, eps=1.0 / (n + 1))
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle_objective(solver, False)
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("cls", SOLVERS)
@pytest.mark.parametrize("seed", [5, 6])
def test_asymmetric_ksparse_vs_oracle(cls, seed):
    # mirrors test_random_large's shape (90 x 900, k=32), solver.rs:419-437
    num_rows, num_cols, k = 90, 900, 32
    solver, solution = cls.new(num_rows, num_cols, num_rows * k)
    gen_ksparse_uniform(solver, seed, num_rows, num_cols, k, max_value=10.0)
    solver.solve(solution, False)
    assert solution.num_unassigned == 0
    check_matching(solution, num_rows, num_cols)
    got = solver.get_objective(solution)
    want = oracle_objective(solver, False)
    eps_bound = num_rows * solution.eps
    assert want - 1e-9 <= got <= want + eps_bound + 1e-9


@pytest.mark.parametrize("cls", SOLVERS)
def test_asymmetric_beta_values(cls):
    # benchmark.rs:49-79 semantics: Beta(3,3) integer-floored values
    num_rows, num_cols, k = 100, 600, 16
    solver, solution = cls.new(num_rows, num_cols, num_rows * k)
    gen_asymmetric_input(solver, 7, num_rows, num_cols, k, 300.0, 700.0)
    solver.solve(solution, False)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle_objective(solver, False)
    eps_bound = num_rows * solution.eps
    assert want - 1e-9 <= got <= want + eps_bound + 1e-9


@pytest.mark.parametrize("cls", SOLVERS)
def test_ecs_certificate(cls):
    n = 30
    solver, solution = cls.new(n, n, n * n)
    gen_symmetric_input(solver, 11, n, density=0.15, min_value=1.0,
                        max_value=10.0)
    solver.solve(solution, False)
    assert solution.num_unassigned == 0
    # get_toleration gives a ~1-ulp bound; the price-update arithmetic
    # accumulates a few ulps, so certify with a slack that is still ~7
    # orders of magnitude below eps.
    tol = 1e-9
    assert solver.ecs_satisfied(solution.person_to_object, solution.eps, tol)


@pytest.mark.parametrize("cls", SOLVERS)
def test_random_solve_small(cls):
    # shape of solver.rs:294-315 (5x5, k=2) with oracle instead of the
    # Rust-RNG-pinned constants; exercises solver reuse across solves.
    n, k = 5, 2
    solver, solution = cls.new(n, n, n * k)
    for maximize in (False, True):
        gen_ksparse_uniform(solver, 1, n, n, k, max_value=10.0)
        solver.solve(solution, maximize)
        if solution.num_unassigned == 0:
            got = solver.get_objective(solution)
            want = oracle_objective(solver, maximize)
            eps_bound = n * solution.eps
            if maximize:
                assert want >= got >= want - eps_bound - 1e-9
            else:
                assert want <= got <= want + eps_bound + 1e-9


def test_gen_symmetric_value_seed_decouples_structure():
    # value_seed fuzzes costs while pinning the arc structure (and thus
    # the padded device shapes / compile cache) — generators.py
    a, _ = KhoslaSolver.new(64, 64, 4096)
    gen_symmetric_input(a, 3, 64, 0.1, 1.0, 9.0)
    b, _ = KhoslaSolver.new(64, 64, 4096)
    gen_symmetric_input(b, 3, 64, 0.1, 1.0, 9.0, value_seed=777)
    assert list(a.column_indices) == list(b.column_indices)
    assert list(a.j_counts) == list(b.j_counts)
    assert not np.allclose(a.values, b.values)
    # default value_seed is the structure seed (unchanged semantics)
    c, _ = KhoslaSolver.new(64, 64, 4096)
    gen_symmetric_input(c, 3, 64, 0.1, 1.0, 9.0, value_seed=3)
    assert np.allclose(a.values, c.values)
