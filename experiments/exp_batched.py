"""Experiment: batched FR timing breakdown at several batch sizes."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import (
    _fr_batch_init, _fr_pack_results, _stage_values_t, solve_batch,
)
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas


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

    for r in range(repeats + 1):
        t0 = time.perf_counter()
        states = _fr_batch_init(values_t, jnp.full((batch,), eps))
        jax.block_until_ready(states)
        t_init = time.perf_counter() - t0

        t0 = time.perf_counter()
        states, _ = fr_chunk_pallas(values_t, states, budget)
        jax.block_until_ready(states)
        t_kernel = time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = np.asarray(_fr_pack_results(states))
        t_read = time.perf_counter() - t0
        undone = int((packed[:, n + 1] == 0).sum())
        nits = packed[:, n]
        tag = "compile+" if r == 0 else ""
        log(f"B={batch} {tag}init={t_init:.3f}s kernel({budget}r)="
            f"{t_kernel:.3f}s read={t_read:.3f}s undone={undone} "
            f"nits p50={np.percentile(nits,50):.0f} "
            f"p99={np.percentile(nits,99):.0f} max={nits.max()}")
    # end-to-end through the public API for reference
    for _ in range(2):
        t0 = time.perf_counter()
        sol = solve_batch(costs, solver="fr", dtype=np.float32,
                          costs_device=dev)
        dt = time.perf_counter() - t0
        log(f"B={batch} solve_batch e2e: {dt:.3f}s -> {batch/dt:.0f} inst/s "
            f"(unassigned={int(sol.num_unassigned.sum())})")


if __name__ == "__main__":
    for b in [512, 1024, 2048]:
        breakdown(b)
