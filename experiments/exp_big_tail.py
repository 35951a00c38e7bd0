"""Price the native chain tail on big dense singles.

FROZEN MEASUREMENT RECORD: pokes the private _BIG_TAIL_DISABLE hook of
the in-driver tail race that was DELETED in round 4 — re-running fails
by design; the measurement it backs is in docs/PERFORMANCE.md
(round-3 fourth session) and its successor records are exp_big_tail2/3.

Same instance through the streaming kernel with the tail disabled
(pure-device war rounds) and enabled (probe chunks + sequential FR
finish), plus the from-scratch native engine for reference.  Objectives
must agree exactly (integer costs, eps < 1/n).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_assignment_tpu import batch as batch_mod
from sparse_linear_assignment_tpu.batch import _cpu_tail_forward, solve_batch

sizes = [int(s) for s in sys.argv[1:]] or [4096, 8192]

for n in sizes:
    rng = np.random.default_rng(n)
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    jax.block_until_ready(dev)
    eps = 1.0 / (n + 1)
    res = {}
    for mode, disable in (("tail", False), ("device", True)):
        batch_mod._BIG_TAIL_DISABLE = disable
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            sol = solve_batch(costs, solver="fr", dtype=np.float32, eps=eps,
                              costs_device=dev)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            print(f"n={n} {mode} rep{rep}: {dt:.3f}s nits={int(sol.nits[0])} "
                  f"unassigned={int(sol.num_unassigned.sum())}", flush=True)
        res[mode] = (best, float(sol.objective[0]))
    t0 = time.perf_counter()
    p2o_cpu, _, _ = _cpu_tail_forward(-costs[0], eps, 10_000_000)
    t_native = time.perf_counter() - t0
    obj_native = float(costs[0][np.arange(n), p2o_cpu].sum())
    assert res["tail"][1] == res["device"][1] == obj_native, (n, res, obj_native)
    print(f"n={n}: tail {res['tail'][0]:.3f}s | device {res['device'][0]:.3f}s "
          f"| native scratch {t_native:.3f}s | objective {obj_native} identical",
          flush=True)
