"""Native C++ sequential engine: correctness vs scipy oracle and
cross-agreement with the TPU solvers."""

import os

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import (
    UNASSIGNED,
    ForwardAuctionSolver,
    KhoslaSolver,
)
from sparse_linear_assignment_tpu.cpu_reference import (
    forward_solve_cpu,
    khosla_solve_cpu,
)
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_ksparse_uniform,
    gen_symmetric_input,
)

from test_fixed_cases import CASES, populate_dense


@pytest.mark.parametrize("case", range(len(CASES)))
def test_native_khosla_fixed_cases(case):
    maximize, costs, optimal_cost, optimal_p2os = CASES[case]
    solver, _ = KhoslaSolver.new(10, 10, 100)
    populate_dense(solver, costs)
    solution, nits = khosla_solve_cpu(solver, maximize)
    assert solution.num_unassigned == 0
    assert solver.get_objective(solution) == optimal_cost
    assert nits >= len(costs)


@pytest.mark.parametrize("case", range(len(CASES)))
def test_native_forward_fixed_cases(case):
    maximize, costs, optimal_cost, optimal_p2os = CASES[case]
    solver, _ = ForwardAuctionSolver.new(10, 10, 100)
    populate_dense(solver, costs)
    solution, nits, nreductions, optimal = forward_solve_cpu(solver, maximize)
    assert solution.num_unassigned == 0
    assert solver.get_objective(solution) == optimal_cost
    assert optimal


@pytest.mark.parametrize("engine", ["khosla", "forward"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_native_vs_oracle_symmetric(engine, seed):
    n = 40
    solver, _ = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, 0.25, 500.0, 1000.0)
    if engine == "khosla":
        solution, _ = khosla_solve_cpu(solver)
    else:
        solution, _, _, _ = forward_solve_cpu(solver)
    assert solution.num_unassigned == 0
    mat = dense_cost_matrix(solver, big=1e9, original_units=True)
    r, c = linear_sum_assignment(mat)
    want = float(mat[r, c].sum())
    got = solver.get_objective(solution)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9


@pytest.mark.parametrize("seed", [5, 6])
def test_native_agrees_with_tpu_solver(seed):
    """Sequential C++ and synchronous TPU engines must agree to 1e-9 on
    integer-cost instances where eps guarantees exact optimality (the
    BASELINE.json correctness bar)."""
    num_rows, num_cols, k = 80, 400, 16
    results = {}
    for engine in ("cpu", "jax"):
        solver, solution = KhoslaSolver.new(num_rows, num_cols, num_rows * k)
        gen_ksparse_uniform(solver, seed, num_rows, num_cols, k, 10.0)
        # integer costs + eps < 1/n ⇒ both engines reach the exact optimum
        solver.map_values(np.floor)
        eps = 1.0 / (num_rows + 1)
        if engine == "cpu":
            sol, _ = khosla_solve_cpu(solver, False, eps=eps)
        else:
            solver.solve(solution, False, eps=eps)
            sol = solution
        assert sol.num_unassigned == 0
        results[engine] = solver.get_objective(sol)
    assert abs(results["cpu"] - results["jax"]) <= 1e-9


def test_native_khosla_infeasible_terminates():
    solver, _ = KhoslaSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solution, nits = khosla_solve_cpu(solver)
    assert solution.num_unassigned == 1
    assert nits < 10_000


def test_native_forward_max_iterations():
    solver, _ = ForwardAuctionSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solution, nits, _, optimal = forward_solve_cpu(
        solver, max_iterations=500
    )
    assert nits == 500
    assert not optimal
    assert solution.num_unassigned == 1


def test_native_trace_env_gated(tmp_path):
    """SLAP_NATIVE_TRACE emits stderr state lines from the native hot
    loops (reference trace-site parity, ksparse.rs:182,189-190,246-248;
    VERDICT r4 item 6).  The level latches at first native call, so the
    probe runs in a subprocess."""
    import subprocess
    import sys

    code = (
        "import numpy as np\n"
        "from sparse_linear_assignment_tpu import KhoslaSolver\n"
        "from sparse_linear_assignment_tpu.cpu_reference import"
        " khosla_solve_cpu, forward_solve_cpu\n"
        "from sparse_linear_assignment_tpu.generators import"
        " gen_symmetric_input\n"
        "s, _ = KhoslaSolver.new(64, 64, 64 * 64)\n"
        "gen_symmetric_input(s, 5, 64, 0.2, 0.0, 10.0)\n"
        "sol, nits = khosla_solve_cpu(s)\n"
        "assert sol.num_unassigned == 0\n"
        "sol2, nits2, _, _ = forward_solve_cpu(s)\n"
        "print('PROBE_DONE', nits, nits2)\n"
    )
    env = dict(os.environ)
    env["SLAP_NATIVE_TRACE"] = "2"
    env["SLAP_NATIVE_TRACE_EVERY"] = "16"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert "PROBE_DONE" in out.stdout, (out.stdout, out.stderr[-2000:])
    err = out.stderr
    assert "[slap.native] khosla_solve start:" in err, err[-2000:]
    assert "[slap.native] khosla_solve done:" in err
    assert "[slap.native] pop=" in err  # every-K-pops state lines
    assert "[slap.native] forward_solve start:" in err
    assert "[slap.native] forward_solve done:" in err

    # and OFF by default: no trace output without the env var
    env.pop("SLAP_NATIVE_TRACE")
    env.pop("SLAP_NATIVE_TRACE_EVERY")
    out2 = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert "PROBE_DONE" in out2.stdout
    assert "[slap.native]" not in out2.stderr
