"""Sparse-single crossover vs density: native ladder vs hybrid as k grows.

Round-4 follow-up to exp_n1e6 (at k≈5 the native ladder owns every n
through 1e6): per-round device cost is ~flat in k while the ladder's
sequential pops each scan O(k) arcs, so a crossover should appear as
the arc density rises.  Measures both engines on the same instances.
"""
import sys
import time

import numpy as np

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.generators import gen_symmetric_input

n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000

for k in (5, 32, 128):
    solver, solution = KhoslaSolver.new(n, n, 3 * n * k)
    t0 = time.perf_counter()
    gen_symmetric_input(solver, 42, n, k / n, 0.0, 10.0)
    t_gen = time.perf_counter() - t0
    arcs = solver.num_of_arcs()

    t0 = time.perf_counter()
    solver.solve(solution, False, engine="native")
    t_native = time.perf_counter() - t0
    obj_native = solver.get_objective(solution)
    assert solution.num_unassigned == 0

    solver.dtype = np.dtype(np.float32)
    best_h = None
    for rep in range(3):
        t0 = time.perf_counter()
        solver.solve(solution, False, scale_eps=True, hybrid=True)
        t_h = time.perf_counter() - t0
        best_h = t_h if best_h is None or t_h < best_h else best_h
        assert solution.num_unassigned == 0
        obj_h = solver.get_objective(solution)
        assert abs(obj_h - obj_native) <= n * solution.eps + 1e-6
    print(f"n={n} k={k} arcs={arcs} gen={t_gen:.1f}s: "
          f"native ladder {t_native:.2f}s, hybrid best {best_h:.2f}s "
          f"({t_native / best_h:.2f}x)", flush=True)
