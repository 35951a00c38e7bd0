"""Per-phase telemetry of the big-single native chain tail.

FROZEN MEASUREMENT RECORD: imports private tail helpers
(_fr_big_native_tail, _fr_pack_single_tail) DELETED in round 4 —
re-running raises by design; the numbers live in docs/PERFORMANCE.md.

Replicates the batch.py use_big driver loop with explicit timing of
every probe chunk (rounds, free count, wall) and of the native-tail
entry/ finish phases, to locate where the wall clock goes at n >= 8192.
"""
import sys
import time

import numpy as np
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import (
    _fr_big_native_tail,
    _fr_pack_single_tail,
)
from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk
from sparse_linear_assignment_tpu.solution import UNASSIGNED

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
max_free = int(sys.argv[2]) if len(sys.argv) > 2 else 32
rng = np.random.default_rng(n)
costs = rng.integers(1, 1000, size=(n, n)).astype(np.float64)
eps = 1.0 / (n + 1)

vals_t = jnp.asarray((-costs).T.astype(np.float32))
bm = 128 if (n % 256 == 0 and n <= 4096) else 64
budget = max(512, 2 * n)
probe = max(512, n // 4)

for rep in range(2):
    t_all = time.perf_counter()
    st = fr_init(vals_t, np.float32(eps))
    rounds_i = probe
    while True:
        t0 = time.perf_counter()
        st, _ = fr_big_chunk(vals_t, st, rounds_i, bm=bm)
        packed = np.asarray(_fr_pack_single_tail(st))
        dt = time.perf_counter() - t0
        free = int(np.sum(packed[:n] == UNASSIGNED))
        print(f"rep{rep} chunk({rounds_i}): cum_rounds={int(packed[n])} "
              f"done={bool(packed[n+1])} free={free} wall={dt:.2f}s", flush=True)
        if packed[n + 1]:
            break
        if free <= max_free:
            break
        rounds_i = min(2 * rounds_i, budget)
    done = bool(packed[n + 1])
    if not done:
        out_p2o = np.empty((1, n), np.int32)
        out_nits = np.array([int(packed[n])], np.int32)
        t0 = time.perf_counter()
        ok = _fr_big_native_tail(
            (costs[None], False), 0, n, n, packed, eps, out_p2o, out_nits
        )
        dt = time.perf_counter() - t0
        pops = int(out_nits[0]) - int(packed[n])
        print(f"rep{rep} native tail: ok={ok} pops={pops} wall={dt:.2f}s",
              flush=True)
        p2o = out_p2o[0]
    else:
        p2o = packed[:n]
    print(f"rep{rep} TOTAL {time.perf_counter()-t_all:.2f}s "
          f"obj={costs[np.arange(n), p2o].sum()}", flush=True)
