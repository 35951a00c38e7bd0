"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: batched 256x256 assignment throughput (BASELINE.json
north star: >10,000 instances/sec on one TPU core → vs_baseline is the
ratio against that 10k target).  Additional context lines go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_batched_256(batch=512, repeats=3):
    import jax

    from sparse_linear_assignment_tpu.batch import solve_batch

    rng = np.random.default_rng(0)
    n = 256
    costs = rng.integers(1, 1000, size=(batch, n, n)).astype(np.float64)

    # warm-up / compile
    t0 = time.perf_counter()
    sol = solve_batch(costs, solver="forward", dtype=np.float32)
    t1 = time.perf_counter()
    log(f"compile+first batch: {t1 - t0:.1f}s; "
        f"unassigned={int(sol.num_unassigned.sum())}")

    best = 0.0
    for _ in range(repeats):
        costs = rng.integers(1, 1000, size=(batch, n, n)).astype(np.float64)
        t0 = time.perf_counter()
        sol = solve_batch(costs, solver="forward", dtype=np.float32)
        t1 = time.perf_counter()
        ips = batch / (t1 - t0)
        log(f"batch of {batch}: {t1 - t0:.3f}s -> {ips:.0f} inst/s "
            f"(unassigned={int(sol.num_unassigned.sum())})")
        best = max(best, ips)
    return best


def main():
    value = bench_batched_256()
    print(json.dumps({
        "metric": "batched_256x256_instances_per_sec",
        "value": round(value, 1),
        "unit": "instances/sec",
        "vs_baseline": round(value / 10_000.0, 4),
    }))


if __name__ == "__main__":
    main()
