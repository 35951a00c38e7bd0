"""Compacted / ε-scaled Khosla engines must match the plain engine's
solution-quality contract (same choice/update/drop rules)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import KhoslaSolver, UNASSIGNED
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_ksparse_uniform,
    gen_symmetric_input,
)


def oracle(solver):
    mat = dense_cost_matrix(solver, big=1e9, original_units=True)
    r, c = linear_sum_assignment(mat)
    return float(mat[r, c].sum())


@pytest.mark.parametrize("mode", ["compact", "scaled"])
@pytest.mark.parametrize("seed", [1, 2])
def test_compact_matches_plain_symmetric(mode, seed):
    n = 60
    solver, solution = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, 0.15, 1.0, 10.0)
    kwargs = (
        {"compact": True} if mode == "compact" else {"scale_eps": True}
    )
    solver.solve(solution, False, **kwargs)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9
    # matching consistency
    p2o = np.asarray(solution.person_to_object)
    for i, j in enumerate(p2o):
        assert solution.object_to_person[j] == i


@pytest.mark.parametrize("mode", ["compact", "scaled"])
def test_compact_asymmetric_ksparse(mode):
    num_rows, num_cols, k = 80, 500, 12
    solver, solution = KhoslaSolver.new(num_rows, num_cols, num_rows * k)
    gen_ksparse_uniform(solver, 3, num_rows, num_cols, k, 10.0)
    kwargs = (
        {"compact": True} if mode == "compact" else {"scale_eps": True}
    )
    solver.solve(solution, False, **kwargs)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + num_rows * solution.eps + 1e-9


@pytest.mark.parametrize("mode", ["compact", "scaled"])
def test_compact_infeasible_terminates(mode):
    solver, solution = KhoslaSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    kwargs = (
        {"compact": True} if mode == "compact" else {"scale_eps": True}
    )
    solver.solve(solution, False, **kwargs)
    assert solution.num_unassigned == 1


def test_compact_fixed_case_exact():
    costs = [
        [1000, 2, 11, 10, 8, 7, 6, 5],
        [6, 1000, 1, 8, 8, 4, 6, 7],
        [5, 12, 1000, 11, 8, 12, 3, 11],
        [11, 9, 10, 1000, 1, 9, 8, 10],
        [11, 11, 9, 4, 1000, 2, 10, 9],
        [12, 8, 5, 2, 11, 1000, 11, 9],
        [10, 11, 12, 10, 9, 12, 1000, 3],
        [10, 10, 10, 10, 6, 3, 1, 1000],
    ]
    for kwargs in ({"compact": True}, {"scale_eps": True}):
        solver, solution = KhoslaSolver.new(8, 8, 64)
        solver.init(8, 8)
        for i, row in enumerate(costs):
            solver.extend_from_values(
                i, list(range(8)), [float(v) for v in row]
            )
        solver.solve(solution, False, **kwargs)
        assert solution.num_unassigned == 0
        assert solver.get_objective(solution) == 17.0


@pytest.mark.parametrize("scale", [False, True])
@pytest.mark.parametrize("seed", [1, 2])
def test_hybrid_matches_oracle(scale, seed):
    n = 60
    solver, solution = KhoslaSolver.new(n, n, n * n)
    gen_symmetric_input(solver, seed, n, 0.15, 1.0, 10.0)
    solver.solve(solution, False, scale_eps=scale, hybrid=True)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + n * solution.eps + 1e-9
    p2o = np.asarray(solution.person_to_object)
    for i, j in enumerate(p2o):
        assert solution.object_to_person[j] == i


def test_hybrid_asymmetric():
    num_rows, num_cols, k = 80, 500, 12
    solver, solution = KhoslaSolver.new(num_rows, num_cols, num_rows * k)
    gen_ksparse_uniform(solver, 3, num_rows, num_cols, k, 10.0)
    solver.solve(solution, False, scale_eps=True, hybrid=True)
    assert solution.num_unassigned == 0
    got = solver.get_objective(solution)
    want = oracle(solver)
    assert want - 1e-9 <= got <= want + num_rows * solution.eps + 1e-9


def test_hybrid_infeasible_terminates():
    solver, solution = KhoslaSolver.new(2, 2, 2)
    solver.init(2, 2)
    solver.add_value(0, 0, 1.0)
    solver.add_value(1, 0, 2.0)
    solver.solve(solution, False, hybrid=True)
    assert solution.num_unassigned == 1


def test_full_round_matches_slot_round():
    """The full-scan round (degree-split top-2, no slot machinery) must
    evolve state bit-identically to the slot round when every active
    person occupies a slot."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.generators import gen_symmetric_input
    from sparse_linear_assignment_tpu.ksparse import KhoslaSolver
    from sparse_linear_assignment_tpu.ops.compact import (
        LState,
        khosla_full_chunk,
        khosla_run_chunk,
    )
    from sparse_linear_assignment_tpu.ops.padded import build_padded_problem
    from sparse_linear_assignment_tpu.solution import UNASSIGNED

    n = 400
    solver, _ = KhoslaSolver.new(n, n, 30 * n)
    # density high enough that k_max > 8 (exercises the split arrays)
    gen_symmetric_input(solver, 17, n, 0.04, 0.0, 10.0)
    values = -solver.values
    problem = build_padded_problem(
        n, n, solver.j_counts, solver.column_indices, values,
        dtype=np.float64,
    )
    assert problem.row_cols8 is not None  # split layout present
    eps = np.float64(1.0 / n)
    thr = np.float64((n / 2.0) * (10.0 + eps))

    def init():
        return LState(
            prices=jnp.zeros(n, jnp.float64),
            p2o=jnp.full(n, jnp.int32(UNASSIGNED)),
            o2p=jnp.full(n, jnp.int32(UNASSIGNED)),
            dropped=jnp.zeros(n, bool),
            slots=jnp.arange(n, dtype=jnp.int32),
            nits=jnp.zeros((), jnp.int32),
        )

    s_full, _ = khosla_full_chunk(problem, init(), eps, thr, 12)
    s_slot, _ = khosla_run_chunk(problem, init(), eps, thr, 12)
    np.testing.assert_array_equal(np.asarray(s_full.p2o), np.asarray(s_slot.p2o))
    np.testing.assert_array_equal(np.asarray(s_full.o2p), np.asarray(s_slot.o2p))
    np.testing.assert_array_equal(
        np.asarray(s_full.dropped), np.asarray(s_slot.dropped)
    )
    np.testing.assert_allclose(
        np.asarray(s_full.prices), np.asarray(s_slot.prices), rtol=0, atol=0
    )


class TestPushAllLeft:
    """Literal host-side parity utility for the reference's
    unassigned-list compaction (symmetric.rs:471-508)."""

    def test_reference_case_u16(self):
        # the reference's own pinned case (symmetric.rs:516-524)
        from sparse_linear_assignment_tpu.utils import push_all_left

        NONE = np.uint16(np.iinfo(np.uint16).max)
        arr = np.array([NONE, 1, 2, 3, NONE, NONE], dtype=np.uint16)
        mapper = np.array([NONE, 1, 2, 3], dtype=np.uint16)
        push_all_left(arr, mapper, 3, 3)
        np.testing.assert_array_equal(
            arr, np.array([3, 1, 2, NONE, NONE, NONE], dtype=np.uint16)
        )
        assert mapper[3] == 0  # moved id's inverse map updated in tandem

    @pytest.mark.parametrize("dtype", [np.uint16, np.uint32, np.int32])
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_partition_invariants(self, dtype, seed):
        from sparse_linear_assignment_tpu.utils import push_all_left

        rng = np.random.default_rng(seed)
        size = int(rng.integers(1, 40))
        num = int(rng.integers(0, size + 1))
        sentinel = np.iinfo(dtype).max
        ids = rng.permutation(size)[:num]
        data = np.full(size, sentinel, dtype=dtype)
        pos = rng.permutation(size)[:num]
        data[pos] = ids
        mapper = np.full(size, sentinel, dtype=dtype)
        mapper[ids] = pos
        push_all_left(data, mapper, num, size)
        # all valid ids left of the sentinels, same multiset
        assert set(int(x) for x in data[:num]) == set(int(x) for x in ids)
        assert all(int(x) == sentinel for x in data[num:])
        # mapper consistent for every surviving id
        for j in range(num):
            assert int(mapper[int(data[j])]) == j

    def test_validation(self):
        from sparse_linear_assignment_tpu.utils import push_all_left

        with pytest.raises(ValueError):
            push_all_left(
                np.zeros(4, np.uint16), np.zeros(4, np.uint32), 1, 4
            )
        with pytest.raises(ValueError):
            push_all_left(
                np.zeros(4, np.float32), np.zeros(4, np.float32), 1, 4
            )
