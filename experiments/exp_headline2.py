"""Experiment: hybrid headline — how many ε-phases earn their TPU
round-trips, and how steep the ladder can go with few device phases."""
import time

import numpy as np

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.generators import gen_symmetric_input
from sparse_linear_assignment_tpu.hybrid import khosla_solve_hybrid
from sparse_linear_assignment_tpu.ops.padded import build_padded_problem


def log(m):
    print(m, flush=True)


n = 100_000
solver, solution = KhoslaSolver.new(n, n, 10 * n)
t0 = time.perf_counter()
gen_symmetric_input(solver, 42, n, 5.0 / n, 0.0, 10.0)
log(f"gen: {time.perf_counter()-t0:.1f}s ({solver.num_of_arcs()} arcs)")

values = -solver.values
problem = build_padded_problem(
    n, n, solver.j_counts, solver.column_indices, values, dtype=np.float32
)
counts = solver.j_counts.astype(np.int64)
starts = np.zeros(len(counts) + 1, dtype=np.int64)
np.cumsum(counts, out=starts[1:])
eps = 1.0 / n
w_min, w_max = float(values.min()), float(values.max())

UNASSIGNED = np.iinfo(np.int32).max


def run(tag, repeats=3, **kw):
    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        prices, p2o, o2p, dropped, tr, cp = khosla_solve_hybrid(
            n, n, starts, solver.column_indices, values, problem,
            eps, w_min, w_max, scale=True, **kw)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        assert (p2o != UNASSIGNED).all()
        log(f"{tag} run{r}: {dt:.2f}s tpu_rounds={tr} cpu_pops={cp}")
    log(f"{tag}: best {best:.2f}s")
    return best


# native-only reference point for this session's tunnel weather
run("native-only ladder (tpu_phases=0)", tpu_phases=0)
run("rf=0.03 all phases (current default)")
run("rf=0.03 tpu=1", tpu_phases=1)
run("rf=0.03 tpu=2", tpu_phases=2)
run("rf=0.03 tpu=3", tpu_phases=3)
run("rf=0.01 tpu=1", reduction_factor=0.01, tpu_phases=1)
run("rf=0.01 tpu=2", reduction_factor=0.01, tpu_phases=2)
run("rf=0.002 tpu=1", reduction_factor=0.002, tpu_phases=1)
run("rf=0.002 tpu=2", reduction_factor=0.002, tpu_phases=2)
run("rf=0.03 tpu=1 c8", tpu_phases=1, chunk=8)
run("rf=0.01 tpu=1 c8", reduction_factor=0.01, tpu_phases=1, chunk=8)
