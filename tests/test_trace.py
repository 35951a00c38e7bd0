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


def test_fused_kernel_round_trace_interpret(capfd):
    """The production fused kernel prints per-round state under
    SLAP_TPU_DEBUG (VERDICT r3 item 5) — interpret-mode smoke; on
    hardware the same pl.debug_print sites lower via Mosaic."""
    import jax
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
    from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas
    from sparse_linear_assignment_tpu.utils import set_debug

    rng = np.random.default_rng(11)
    vals_t = jnp.asarray(
        rng.integers(1, 50, size=(1, 128, 128)).astype(np.float32)
    )
    states = jax.vmap(lambda v: fr_init(v, np.float32(1.0 / 129)))(vals_t)
    jax.clear_caches()  # debug flag takes effect at trace time
    set_debug(True)
    try:
        fr_chunk_pallas(vals_t, states, 4, interpret=True)
    finally:
        set_debug(False)
        jax.clear_caches()  # drop the debug-build programs again
    out, err = capfd.readouterr()
    assert "fr kernel g=0 round" in out + err, (out[-500:], err[-500:])


def test_big_kernel_round_trace_interpret(capfd):
    import jax
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
    from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk
    from sparse_linear_assignment_tpu.utils import set_debug

    rng = np.random.default_rng(12)
    vals_t = jnp.asarray(
        rng.integers(1, 50, size=(256, 256)).astype(np.float32)
    )
    state = fr_init(vals_t, np.float32(1.0 / 257))
    jax.clear_caches()
    set_debug(True)
    try:
        fr_big_chunk(vals_t, state, 4, bm=64, interpret=True)
    finally:
        set_debug(False)
        jax.clear_caches()
    out, err = capfd.readouterr()
    assert "fr big kernel round" in out + err, (out[-500:], err[-500:])
