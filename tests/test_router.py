"""Auto-engine routing (VERDICT r2 item 3): the default one-call
`solve()` (`solver.rs:15-20` contract) must pick the measured-fastest
correct engine per instance class while explicit arguments force a
specific engine — and every engine must agree on the result contract.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import ForwardAuctionSolver, KhoslaSolver
from sparse_linear_assignment_tpu.generators import gen_symmetric_input


def _build(n=64, seed=11):
    solver, solution = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, 0.2, 1.0, 50.0)
    return solver, solution, n


def _dense_oracle(solver, n):
    big = 1e9
    dense = np.full((n, n), big)
    start = 0
    sign = -1.0 if solver.values[0] < 0 else 1.0
    for i, cnt in enumerate(solver.j_counts):
        cols = solver.column_indices[start:start + cnt]
        dense[i, cols] = sign * solver.values[start:start + cnt]
        start += cnt
    r, c = linear_sum_assignment(dense)
    return float(dense[r, c].sum())


@pytest.mark.parametrize("engine", ["auto", "native", "device"])
def test_khosla_engines_agree(engine):
    solver, solution, n = _build()
    solver.solve(solution, maximize=False, engine=engine)
    assert solution.num_unassigned == 0
    want = _dense_oracle(solver, n)
    got = solver.get_objective(solution)
    # all engines share the n*eps optimality bound at the default eps
    assert got <= want + n * solution.eps + 1e-9
    assert got >= want - 1e-9


@pytest.mark.parametrize("engine", ["auto", "native", "device"])
def test_forward_engines_agree(engine):
    solver, solution, n = _build(seed=12)
    fsolver, fsol = ForwardAuctionSolver.new(n, n, solver.num_of_arcs())
    fsolver.init(n, n)
    start = 0
    for i, cnt in enumerate(solver.j_counts):
        fsolver.extend_from_values(
            i,
            solver.column_indices[start:start + cnt],
            solver.values[start:start + cnt],
        )
        start += cnt
    fsolver.solve(fsol, maximize=False, engine=engine)
    assert fsol.num_unassigned == 0
    assert fsolver.optimal_soln_found
    want = _dense_oracle(fsolver, n)
    assert fsolver.get_objective(fsol) == pytest.approx(want, abs=1e-6)


def test_unknown_engine_rejected():
    solver, solution, _ = _build()
    with pytest.raises(ValueError, match="unknown engine"):
        solver.solve(solution, engine="gpu")
    fsolver, fsol = ForwardAuctionSolver.new(2, 2, 4)
    fsolver.init(2, 2)
    fsolver.extend_from_values(0, [0, 1], [1.0, 2.0])
    fsolver.extend_from_values(1, [0, 1], [3.0, 4.0])
    with pytest.raises(ValueError, match="unknown engine"):
        fsolver.solve(fsol, engine="gpu")


def test_single_arc_rows_route_to_device():
    """Auto must NOT hand single-arc instances to the native engine:
    the reference bid rule it reproduces bids +inf there and spins to
    max_iterations (`symmetric.rs:359,378`)."""
    solver, solution = ForwardAuctionSolver.new(3, 3, 6)
    solver.init(3, 3)
    solver.extend_from_values(0, [0, 1, 2], [5.0, 3.0, 8.0])
    solver.extend_from_values(1, [0, 1], [4.0, 7.0])
    solver.extend_from_values(2, [2], [2.0])
    solver.solve(solution, maximize=False)  # auto
    assert solution.num_unassigned == 0
    assert solver.nits < solver.max_iterations


def test_explicit_device_args_force_device_path():
    """scale_eps/start_prices parameterize the device engines; auto must
    honor them (nits unit differs: device counts Jacobi rounds, native
    counts sequential pops — a round assigns many persons at once)."""
    solver, solution, n = _build(seed=13)
    solver.solve(solution, maximize=False, scale_eps=True)
    rounds_nits = solver.nits
    solver.solve(solution, maximize=False, engine="native")
    pops_nits = solver.nits
    # the sequential engine pops at least one person per assignment;
    # the device ladder finishes in far fewer Jacobi rounds
    assert rounds_nits < pops_nits


def test_bench_degraded_headline_small():
    """The bench driver's tunnel-outage fallback (bench.py:
    bench_headline_degraded) must run end-to-end: default solve() vs
    the sequential CPU reference, objectives agreeing within n*eps.
    Pinned at a small n so the suite covers the code path the driver
    only hits during an outage."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    try:
        import bench
    finally:
        sys.path.pop(0)
    speedup = bench.bench_headline_degraded(n=400, repeats=1)
    assert speedup > 0
