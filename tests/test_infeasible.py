"""Infeasible-instance contracts (SURVEY.md §5.3).

Khosla's price-threshold drop rule guarantees finite termination without a
perfect matching (ksparse.rs:181,218-220); the forward auction loops and is
cut off by ``max_iterations`` (symmetric.rs:190,326-328).  Mirrors
``test_random_no_perfect_matching`` (solver.rs:317-337) with NumPy seeds
chosen so the 9x9 k=3 instance has no perfect matching.
"""

import numpy as np
import pytest
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_bipartite_matching

from sparse_linear_assignment_tpu import (
    UNASSIGNED,
    ForwardAuctionSolver,
    KhoslaSolver,
)
from sparse_linear_assignment_tpu.generators import gen_ksparse_uniform


def max_matching_size(solver) -> int:
    counts = solver.j_counts.astype(np.int64)
    rows = np.repeat(np.arange(solver.num_rows), counts)
    cols = solver.column_indices.astype(np.int64)
    m = csr_matrix(
        (np.ones(len(rows)), (rows, cols)),
        shape=(solver.num_rows, solver.num_cols),
    )
    match = maximum_bipartite_matching(m, perm_type="column")
    return int((match != -1).sum())


# seeds with 9x9 k=3 instances whose maximum matching is 8 and 7
@pytest.mark.parametrize("seed,expected_matching", [(6, 8), (22, 7)])
def test_khosla_no_perfect_matching(seed, expected_matching):
    n, k = 9, 3
    solver, solution = KhoslaSolver.new(n, n, n * k)
    gen_ksparse_uniform(solver, seed, n, n, k, max_value=10.0)
    assert max_matching_size(solver) == expected_matching
    solver.solve(solution, False)
    # finite termination, partial matching found
    assert solution.num_unassigned >= n - expected_matching
    assert solution.num_unassigned < n
    # matching consistency
    p2o = np.asarray(solution.person_to_object)
    assigned = p2o != UNASSIGNED
    assert int(assigned.sum()) == n - solution.num_unassigned
    for i in np.nonzero(assigned)[0]:
        assert solution.object_to_person[p2o[i]] == i


@pytest.mark.parametrize("seed", [6, 22])
def test_forward_max_iterations_cutoff(seed):
    n, k = 9, 3
    solver, solution = ForwardAuctionSolver.new(n, n, n * k)
    gen_ksparse_uniform(solver, seed, n, n, k, max_value=10.0)
    solver.solve_with_params(solution, False, None, None, max_iterations=200)
    assert solver.nits == 200  # hit the cutoff
    assert not solver.optimal_soln_found
    assert solution.num_unassigned >= 1


def test_khosla_two_persons_one_object():
    # both persons connected only to object 0 of a 2x2 problem
    solver, solution = KhoslaSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solver.solve(solution, False)
    assert solution.num_unassigned == 1
    assert int((np.asarray(solution.person_to_object) != UNASSIGNED).sum()) == 1


def test_forward_two_persons_one_object():
    solver, solution = ForwardAuctionSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solver.solve_with_params(solution, False, None, None, max_iterations=100)
    assert solution.num_unassigned == 1
    assert not solver.optimal_soln_found


def test_forward_device_infeasibility_certificate_early_exit():
    """The device forward engine detects infeasibility via the
    Bertsekas price bound in a few*n rounds instead of crawling to
    max_iterations (extension; measured 257 s on a 2x2 infeasible
    instance through the TPU tunnel before this).  Pinned here: the
    solve must stop far below max_iterations, with the matching
    incomplete and optimal_soln_found False."""
    from sparse_linear_assignment_tpu import ForwardAuctionSolver

    solver, solution = ForwardAuctionSolver.new(2, 2, 2)
    solver.init(2, 2)
    # both persons want only object 0 -> no perfect matching; single-arc
    # rows also force the DEVICE engine (the router's parity deviation)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solver.solve(solution, False)
    assert solution.num_unassigned >= 1
    assert not solver.optimal_soln_found
    assert solver.nits < 10_000, solver.nits  # certificate, not cutoff


def test_forward_feasible_unaffected_by_certificate():
    """The price bound can never trip on feasible instances: a dense
    feasible solve through the device engine reaches the same exact
    objective as scipy."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu import ForwardAuctionSolver

    n = 24
    rng = np.random.default_rng(17)
    costs = rng.integers(1, 100, size=(n, n)).astype(np.float64)
    solver, solution = ForwardAuctionSolver.new(n, n, n * n)
    solver.init(n, n)
    for i in range(n):
        solver.extend_from_values(i, range(n), costs[i])
    solver.solve_with_params(
        solution, False, eps=1.0 / (n + 1), engine="device"
    )
    assert solution.num_unassigned == 0
    r, c = linear_sum_assignment(costs)
    got = solver.get_objective(solution)
    assert abs(got - float(costs[r, c].sum())) < 1e-9


def test_certificate_fuzz_sound_and_live():
    """Randomized soundness/liveness of the Bertsekas certificate:
    feasible instances must NEVER false-trip (solve to completion);
    Hall-violating instances must stop early with the matching
    incomplete.  (120-case version ran clean on 2026-08-20; this keeps
    a 36-case rotation in the suite.)"""
    import numpy as np

    from sparse_linear_assignment_tpu import ForwardAuctionSolver

    import jax

    rng = np.random.default_rng(0)
    for trial in range(36):
        # FIXED sizes: a random n per trial compiles ~100 fresh shapes
        # and pushed the suite past vm.max_map_count (LLVM segfault
        # late in the run — the CLAUDE.md mapping-exhaustion pitfall);
        # random STRUCTURE at two shapes keeps the fuzz value
        n = 8 if trial % 2 else 17
        infeasible = trial % 3 == 0
        solver, sol = ForwardAuctionSolver.new(n, n, n * n)
        solver.init(n, n)
        if infeasible:
            ncols_used = int(rng.integers(1, n))
            for i in range(n):
                k = int(rng.integers(1, ncols_used + 1))
                cols = np.sort(
                    rng.choice(ncols_used, size=k, replace=False)
                )
                solver.extend_from_values(i, cols, rng.uniform(0, 50, k))
        else:
            perm = rng.permutation(n)
            for i in range(n):
                extra = rng.choice(
                    n, size=int(rng.integers(0, 4)), replace=False
                )
                cols = np.unique(np.concatenate([[perm[i]], extra]))
                solver.extend_from_values(
                    i, cols, rng.uniform(0, 50, cols.size)
                )
        solver.solve_with_params(sol, False, engine="device")
        if infeasible:
            assert sol.num_unassigned >= 1, trial
            assert solver.nits < 100_000, trial
        else:
            assert sol.num_unassigned == 0, (
                trial, "certificate false-tripped on a feasible instance"
            )
    jax.clear_caches()  # shed this test's compiled programs/mappings
