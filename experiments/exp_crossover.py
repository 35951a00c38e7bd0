"""Task: characterize where pure-TPU sparse rounds overtake the native
ε-ladder (VERDICT r2 item 4).

Sweeps n x density, same instance and same ε policy both sides:
- native: sequential C++ ε-scaling ladder (khosla_solve_hybrid,
  tpu_phases=0) — the measured-fastest engine at the n=1e5 headline;
- TPU: the device ε-scaled slot-list/full-scan engine
  (KhoslaSolver.solve(engine="device", scale_eps=True), f32).

Prints one JSON line per config; paste the table into BASELINE.md.
Usage: python experiments/exp_crossover.py [quick]
"""
import json
import sys
import time

import numpy as np

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.generators import gen_symmetric_input


def one(n, arcs_per_person, repeats=2, tpu_budget_s=600.0):
    d = arcs_per_person / n
    solver, solution = KhoslaSolver.new(
        n, n, int(n * arcs_per_person * 1.2) + 2 * n
    )
    t0 = time.perf_counter()
    gen_symmetric_input(solver, 42, n, d, 0.0, 10.0)
    gen_s = time.perf_counter() - t0
    arcs = solver.num_of_arcs()

    # native ladder
    t_nat = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        solver._solve_native_ladder(solution, False, None)
        t_nat = min(t_nat, time.perf_counter() - t0)
    obj_nat = solver.get_objective(solution)
    assert solution.num_unassigned == 0

    # pure-TPU ε-scaled — float64: the sparse device path is
    # gather-latency-bound so f64 is ~free (docs/PERFORMANCE.md dtype
    # matrix), and eps = 1/m at n >= 3e5 is below the f32 resolution
    # near the largest prices (measured: the f32 run stalls persons)
    solver.dtype = np.dtype(np.float64)
    t_tpu = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        solver.solve(solution, False, scale_eps=True, engine="device")
        dt = time.perf_counter() - t0
        t_tpu = min(t_tpu, dt)
        if dt > tpu_budget_s:
            break
    obj_tpu = solver.get_objective(solution)
    assert solution.num_unassigned == 0
    row = {
        "n": n, "arcs_per_person": arcs_per_person, "arcs": arcs,
        "gen_s": round(gen_s, 1),
        "native_ladder_s": round(t_nat, 3),
        "tpu_scaled_s": round(t_tpu, 3),
        "tpu_vs_native": round(t_nat / t_tpu, 3),
        "obj_gap": abs(obj_nat - obj_tpu),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    quick = "quick" in sys.argv[1:]
    grid = [
        (100_000, 5), (100_000, 50), (100_000, 500),
        (300_000, 5), (300_000, 50),
        (1_000_000, 5),
    ]
    if quick:
        grid = [(100_000, 5), (100_000, 50)]
    picks = [a for a in sys.argv[1:] if ":" in a]
    if picks:
        grid = [tuple(int(x) for x in p.split(":")) for p in picks]
    rows = [one(n, k) for n, k in grid]
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
