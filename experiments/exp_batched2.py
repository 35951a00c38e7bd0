"""Measure the reworked FR kernel + fused straggler continuation.

FROZEN MEASUREMENT RECORD: imports the private _fr_solve_fused schedule
helper that was DELETED when the single-deep dispatch shipped (round 4,
exp_single_deep.py) — re-running raises ImportError by design; the
numbers it produced live in docs/PERFORMANCE.md round-3 notes."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import (
    _fr_batch_init, _fr_pack_results, _fr_solve_fused, _stage_values_t,
    solve_batch,
)


def log(m):
    print(m, flush=True)


def breakdown(batch, n=256, repeats=2):
    rng = np.random.default_rng(0)
    costs = rng.integers(1, 1000, size=(batch, n, n)).astype(np.float64)
    t0 = time.perf_counter()
    dev = jnp.asarray(costs.astype(np.float32))
    jax.block_until_ready(dev)
    log(f"B={batch} staging: {time.perf_counter()-t0:.2f}s")

    values_t = _stage_values_t(dev, True)
    jax.block_until_ready(values_t)
    eps = np.float32(1.0 / n)
    budget = int(max(96, n + n // 4))
    bucket = max(128, 1 << max(0, (batch // 16 - 1)).bit_length())
    budget2 = 2 * budget

    for r in range(repeats + 1):
        t0 = time.perf_counter()
        states = _fr_batch_init(values_t, jnp.full((batch,), eps))
        states = _fr_solve_fused(values_t, states, budget, bucket, budget2)
        jax.block_until_ready(states.prices)
        t_kernel = time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = np.asarray(_fr_pack_results(states))
        t_read = time.perf_counter() - t0
        undone = int((packed[:, n + 1] == 0).sum())
        nits = packed[:, n]
        tag = "compile+" if r == 0 else ""
        log(f"B={batch} {tag}init+fusedkernel={t_kernel:.3f}s "
            f"read={t_read:.3f}s undone={undone} "
            f"nits p50={np.percentile(nits,50):.0f} max={nits.max()}")
    for _ in range(2):
        t0 = time.perf_counter()
        sol = solve_batch(costs, solver="fr", dtype=np.float32,
                          costs_device=dev)
        dt = time.perf_counter() - t0
        log(f"B={batch} solve_batch e2e: {dt:.3f}s -> {batch/dt:.0f} inst/s "
            f"(unassigned={int(sol.num_unassigned.sum())})")


if __name__ == "__main__":
    for b in [512, 2048]:
        breakdown(b)
