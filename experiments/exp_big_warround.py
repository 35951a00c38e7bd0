"""War-round cost of the streaming big-single kernel: hoisted block
flags + bm sweep.

Per-war-round cost model before the hoist (at 8192², bm=64, G=128):
pass B paid a WIDE [1, N] predicate sum per block per round and pass A
two narrow per-block trees; the hoist replaces them with one [G, N]
histogram + one [G, BM] reduce per round, and the round-start
cardinality sum is carried instead of recomputed.  This probe times
device-only end-to-end big singles (values staged on device — upload
excluded, exp_big_tail3 protocol; sync by value readback).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import _fr_pack_single
from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk


def run(n, bm):
    rng = np.random.default_rng(8192)
    costs = rng.integers(1, 1000, size=(n, n)).astype(np.float32)
    vals_t = jnp.asarray(-costs.T)  # sign-adjusted [N, M] max-profit
    jax.block_until_ready(vals_t)
    eps = np.float32(1.0 / (n + 1))
    budget = int(max(512, 2 * n))

    st = fr_init(vals_t, eps)
    t0 = time.perf_counter()
    rounds = 0
    calls = 0
    while True:
        st, _ = fr_big_chunk(vals_t, st, budget, bm=bm)
        packed = np.asarray(_fr_pack_single(st))
        calls += 1
        rounds = int(packed[n])
        if packed[n + 1]:
            break
        if calls > 64:
            print(f"n={n} bm={bm}: DID NOT FINISH ({rounds} rounds)",
                  flush=True)
            return
    dt = time.perf_counter() - t0
    print(f"n={n} bm={bm}: {dt:.2f}s  nits={rounds}  "
          f"{dt / max(rounds, 1) * 1e6:.1f} us/round  ({calls} calls, "
          f"incl first-call compile if cold)", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    sizes = [int(a) for a in args] or [2048, 4096, 8192]
    for n in sizes:
        for bm in ([64, 128] if n > 4096 else [128, 256]):
            if n % (2 * bm):
                continue
            run(n, bm)
