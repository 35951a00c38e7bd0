"""n=1e6 k~5 sparse: where does the TPU story stand past the headline?

Round-3 roadmap item 3: the native ε-ladder owns the n=1e5 sparse
single (0.37–0.46 s); characterize 1e6.  Compares the native ladder
(the auto-route) against the hybrid mode (TPU bulk rounds + native
chain tails — the engine that wins the n=1e5 headline when a CPU
reference is the baseline) on the same instance; objectives must agree
within n·ε.

Usage: python experiments/exp_n1e6.py [n]  (default 1_000_000)
"""
import sys
import time

import numpy as np

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.generators import gen_symmetric_input

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

solver, solution = KhoslaSolver.new(n, n, 12 * n)
t0 = time.perf_counter()
gen_symmetric_input(solver, 42, n, 5.0 / n, 0.0, 10.0)
print(f"gen: {time.perf_counter() - t0:.2f}s arcs={solver.num_of_arcs()}",
      flush=True)

# native ε-ladder (the auto route for sparse singles)
t0 = time.perf_counter()
solver.solve(solution, False)
t_native = time.perf_counter() - t0
obj_native = solver.get_objective(solution)
print(f"native ladder: {t_native:.2f}s unassigned="
      f"{solution.num_unassigned} obj={obj_native:.2f} "
      f"nits={solver.nits}", flush=True)
assert solution.num_unassigned == 0

# hybrid (TPU bulk + native chain tails), f32 fast path as the headline
solver.dtype = np.dtype(np.float32)
for rep in range(3):
    t0 = time.perf_counter()
    solver.solve(solution, False, scale_eps=True, hybrid=True)
    t_hybrid = time.perf_counter() - t0
    obj_h = solver.get_objective(solution)
    print(f"hybrid rep {rep}: {t_hybrid:.2f}s unassigned="
          f"{solution.num_unassigned} obj={obj_h:.2f}", flush=True)
    assert solution.num_unassigned == 0
    assert abs(obj_h - obj_native) <= n * solution.eps + 1e-6, (
        obj_h, obj_native)
print("objectives agree within n*eps", flush=True)
