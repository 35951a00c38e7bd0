"""Dense single instances beyond VMEM (XLA FR rounds): 1024/2048."""
import time

import numpy as np

import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu.batch import _cpu_tail_forward, solve_batch


def log(m):
    print(m, flush=True)


def median_time(fn, repeats=3):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


rng = np.random.default_rng(7)
for n in [1024, 2048]:
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    jax.block_until_ready(dev)
    hold = {}

    def tpu_run():
        hold["sol"] = solve_batch(
            costs, solver="fr", dtype=np.float32, costs_device=dev
        )

    t_tpu = median_time(tpu_run)
    sol = hold["sol"]
    assert int(sol.num_unassigned.sum()) == 0

    t_cpu = median_time(
        lambda: _cpu_tail_forward(-costs[0], 1.0 / n, 10_000_000), repeats=1
    )
    r, c = linear_sum_assignment(costs[0])
    want = float(costs[0][r, c].sum())
    assert abs(float(sol.objective[0]) - want) < 1e-6
    log(f"dense {n}x{n}: tpu {t_tpu:.3f}s native {t_cpu:.3f}s "
        f"speedup {t_cpu/t_tpu:.2f}x nits={int(sol.nits[0])}")
