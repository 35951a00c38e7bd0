"""Multi-device sharded solve on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import KhoslaSolver, UNASSIGNED
from sparse_linear_assignment_tpu.generators import (
    dense_cost_matrix,
    gen_ksparse_uniform,
)
from sparse_linear_assignment_tpu.parallel import solve_sharded_khosla


def make_mesh(n_devices):
    devices = np.array(jax.devices()[:n_devices])
    return Mesh(devices, ("shard",))


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single_device(n_devices):
    assert len(jax.devices()) >= n_devices
    num_rows, num_cols, k = 96, 200, 8
    solver, solution = KhoslaSolver.new(num_rows, num_cols, num_rows * k)
    gen_ksparse_uniform(solver, 9, num_rows, num_cols, k, max_value=10.0)

    mesh = make_mesh(n_devices)
    sharded_sol, nits = solve_sharded_khosla(solver, mesh)
    assert sharded_sol.num_unassigned == 0
    assert nits > 0

    # objective must agree with the scipy oracle up to n*eps
    mat = dense_cost_matrix(solver, big=1e9)
    if solver.values[0] < 0:
        mat = np.where(np.abs(mat) < 1e9, -mat, mat)
    r, c = linear_sum_assignment(mat)
    want = float(mat[r, c].sum())
    got = solver.get_objective(sharded_sol)
    assert want - 1e-9 <= got <= want + num_rows * sharded_sol.eps + 1e-9

    # inverse consistency
    for i, j in enumerate(sharded_sol.person_to_object):
        assert sharded_sol.object_to_person[j] == i


def test_sharded_padding_sizes():
    # sizes that do NOT divide the mesh exactly
    num_rows, num_cols, k = 13, 29, 4
    solver, _ = KhoslaSolver.new(num_rows, num_cols, num_rows * k)
    gen_ksparse_uniform(solver, 5, num_rows, num_cols, k, max_value=10.0)
    mesh = make_mesh(8)
    sol, _ = solve_sharded_khosla(solver, mesh)
    assert len(sol.person_to_object) == num_rows
    assert len(sol.object_to_person) == num_cols
    assert sol.num_unassigned == 0
