"""Device-resident batched throughput vs batch size (real TPU).

Generates costs ON DEVICE (zero tunnel ingress), solves with
solve_batch(costs=None, costs_device=...), and spot-checks 2 instances
against scipy.  The per-solve fixed cost (~160 ms at B=2048: packing,
readback RTT, host bookkeeping) amortizes with B.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu.batch import solve_batch

N = 256


import functools


@functools.partial(jax.jit, static_argnames=("b",))
def gen(key, b):
    return jax.random.randint(
        key, (b, N, N), 1, 1000, dtype=jnp.int32
    ).astype(jnp.float32)


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096, 8192]
    key = jax.random.PRNGKey(0)
    for b in sizes:
        key, k1 = jax.random.split(key)
        dev = gen(k1, b)
        float(np.asarray(dev[0, 0, 0]))
        t0 = time.perf_counter()
        sol = solve_batch(None, solver="fr", dtype=np.float32,
                          costs_device=dev)
        first = time.perf_counter() - t0
        rates = []
        for _ in range(4):
            t0 = time.perf_counter()
            sol = solve_batch(None, solver="fr", dtype=np.float32,
                              costs_device=dev)
            rates.append(b / (time.perf_counter() - t0))
        assert int(sol.num_unassigned.sum()) == 0
        for bi in (0, b - 1):
            host = np.asarray(dev[bi], dtype=np.float64)
            r, c = linear_sum_assignment(host)
            want = float(host[r, c].sum())
            assert abs(float(sol.objective[bi]) - want) < 1e-6, (bi,)
        print(
            f"B={b}: first {first:.1f}s, repeats "
            + " ".join(f"{r:.0f}" for r in rates)
            + f" inst/s (best {max(rates):.0f}), oracle-exact x2",
            flush=True,
        )


if __name__ == "__main__":
    main()
