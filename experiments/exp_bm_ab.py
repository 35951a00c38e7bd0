"""Clean bm A/B for the streaming big-single kernel: per (n, bm) the
solve runs twice in-process (first run pays compile/cache-load; the
SECOND is the steady-state record).  Sync via packed-value readback
(exp_big_tail3 protocol, upload excluded)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import _fr_pack_single
from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk


def solve(vals_t, n, bm, budget):
    st = fr_init(vals_t, np.float32(1.0 / (n + 1)))
    t0 = time.perf_counter()
    while True:
        st, _ = fr_big_chunk(vals_t, st, budget, bm=bm)
        packed = np.asarray(_fr_pack_single(st))
        if packed[n + 1]:
            return time.perf_counter() - t0, int(packed[n])


sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
for n in sizes:
    rng = np.random.default_rng(8192)
    costs = rng.integers(1, 1000, size=(n, n)).astype(np.float32)
    vals_t = jnp.asarray(-costs.T)
    jax.block_until_ready(vals_t)
    budget = int(max(512, 2 * n))
    for bm in (64, 128, 256):
        if n % (2 * bm) != 0:
            continue
        solve(vals_t, n, bm, budget)  # warm
        dt, nits = solve(vals_t, n, bm, budget)
        print(f"n={n} bm={bm}: steady {dt:.3f}s  nits={nits}  "
              f"{dt / nits * 1e6:.1f} us/round", flush=True)
