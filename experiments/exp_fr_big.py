"""Big dense singles through solve_batch (streaming kernel + fused
ladder) vs the native engine, on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu.batch import _cpu_tail_forward, solve_batch


def log(m):
    print(m, flush=True)


for n in [1024, 2048, 4096]:
    rng = np.random.default_rng(7)
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    jax.block_until_ready(dev)
    hold = {}

    def tpu_run():
        hold["sol"] = solve_batch(
            costs, solver="fr", dtype=np.float32, costs_device=dev
        )

    t0 = time.perf_counter()
    tpu_run()
    log(f"n={n}: first (compile) {time.perf_counter()-t0:.1f}s "
        f"nits={int(hold['sol'].nits[0])} unassigned={int(hold['sol'].num_unassigned[0])}")
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        tpu_run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    sol = hold["sol"]
    log(f"n={n}: tpu steady best {best:.3f}s nits={int(sol.nits[0])}")

    t0 = time.perf_counter()
    _cpu_tail_forward(-costs[0], 1.0 / n, 10_000_000)
    t_cpu = time.perf_counter() - t0
    r, c = linear_sum_assignment(costs[0])
    want = float(costs[0][r, c].sum())
    ok = abs(float(sol.objective[0]) - want) < 1e-6
    log(f"n={n}: native {t_cpu:.3f}s speedup {t_cpu/best:.2f}x obj_exact={ok}")
