"""Tracing/observability parity (SURVEY.md §5.1, VERDICT r2 item 6).

The reference runs its README examples as doc-tests under `cargo test`
(`ksparse.rs:22-72`, `symmetric.rs:23-74`) and traces every round
(`ksparse.rs:189-190`, `symmetric.rs:406-407,465-467`).  Equivalents:
executable docstring examples on both solvers, and `SLAP_TPU_DEBUG`
round traces on every engine's round loop.
"""

import doctest

import numpy as np


def _solve_toy(solver_cls, **kwargs):
    solver, solution = solver_cls.new(10, 10, 100)
    weights = [[10, 6, 14, 1], [17, 18, 16]]
    solver.init(2, 4)
    for i, row in enumerate(weights):
        solver.extend_from_values(i, range(len(row)), row)
    solver.solve(solution, **kwargs)
    return solver, solution


def test_ksparse_docstring_example():
    import sparse_linear_assignment_tpu.ksparse as mod

    result = doctest.testmod(mod)
    assert result.attempted > 0
    assert result.failed == 0


def test_symmetric_docstring_example():
    import sparse_linear_assignment_tpu.symmetric as mod

    result = doctest.testmod(mod)
    assert result.attempted > 0
    assert result.failed == 0


def test_khosla_round_trace(capfd):
    import jax

    from sparse_linear_assignment_tpu import KhoslaSolver
    from sparse_linear_assignment_tpu.utils import set_debug

    # the debug flag takes effect at trace time; drop any programs the
    # rest of the suite already compiled without tracing
    jax.clear_caches()
    set_debug(True)
    try:
        _solve_toy(KhoslaSolver, maximize=False, compact=True)
    finally:
        set_debug(False)
    out, err = capfd.readouterr()
    assert "khosla" in out + err, (out, err)


def test_fr_round_trace(capfd):
    import jax

    from sparse_linear_assignment_tpu.batch import solve_batch
    from sparse_linear_assignment_tpu.utils import set_debug

    rng = np.random.default_rng(3)
    costs = rng.integers(1, 50, size=(2, 16, 16)).astype(np.float64)
    # the debug flag takes effect at trace time; drop any programs the
    # rest of the suite already compiled without tracing
    jax.clear_caches()
    set_debug(True)
    try:
        sol = solve_batch(costs, solver="fr")
    finally:
        set_debug(False)
    assert int(sol.num_unassigned.sum()) == 0
    out, err = capfd.readouterr()
    assert "fr round" in out + err, (out, err)


def test_hybrid_phase_trace(capfd):
    from sparse_linear_assignment_tpu import KhoslaSolver
    from sparse_linear_assignment_tpu.utils import set_debug

    set_debug(True)
    try:
        solver, solution = _solve_toy(
            KhoslaSolver, maximize=False, hybrid=True
        )
    finally:
        set_debug(False)
    assert solution.num_unassigned == 0
    out, err = capfd.readouterr()
    assert "hybrid phase" in out + err, (out, err)
