"""Clean tail-vs-device comparison: values staged once (upload excluded,
the criterion setup/measure split), same instance, warm kernels.

FROZEN MEASUREMENT RECORD: imports private tail helpers DELETED in
round 4 — re-running raises by design; the final race numbers
(device-only won at 8192²) are in docs/PERFORMANCE.md."""
import sys
import time

import numpy as np
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import (
    _fr_big_native_tail,
    _fr_pack_single,
    _fr_pack_single_tail,
)
from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk
from sparse_linear_assignment_tpu.solution import UNASSIGNED

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
rng = np.random.default_rng(n)
costs = rng.integers(1, 1000, size=(n, n)).astype(np.float64)
eps = 1.0 / (n + 1)

vals_t = jnp.asarray((-costs).T.astype(np.float32))
vals_t.block_until_ready()
bm = 128 if (n % 256 == 0 and n <= 4096) else 64
budget = max(512, 2 * n)
probe = max(512, n // 4)

# warm both kernel shapes
st = fr_init(vals_t, np.float32(eps))
_ = np.asarray(_fr_pack_single_tail(fr_big_chunk(vals_t, st, probe, bm=bm)[0]))
st = fr_init(vals_t, np.float32(eps))
_ = np.asarray(_fr_pack_single(fr_big_chunk(vals_t, st, budget, bm=bm)[0]))

for mode in ("tail", "device"):
    for rep in range(3):
        t_all = time.perf_counter()
        st = fr_init(vals_t, np.float32(eps))
        rounds_i = probe if mode == "tail" else budget
        while True:
            st, _ = fr_big_chunk(vals_t, st, rounds_i, bm=bm)
            packed = np.asarray(
                _fr_pack_single_tail(st) if mode == "tail"
                else _fr_pack_single(st)
            )
            free = int(np.sum(packed[:n] == UNASSIGNED))
            if packed[n + 1]:
                break
            if mode == "tail" and free <= 32:
                break
            rounds_i = min(2 * rounds_i, budget)
        if not packed[n + 1]:
            # pure handoff (generous wall budget, no dovetail): upper
            # bound of the tail's value on this instance
            rc, p2o, _, _, _, pops, _ = _fr_big_native_tail(
                (costs[None], False), 0, n, n, packed, eps, 600.0
            )
            assert rc == 0, rc
            nits = int(packed[n])
            print(f"  (tail pops: {pops})", flush=True)
        else:
            p2o, nits = packed[:n], int(packed[n])
        print(f"{mode} rep{rep}: {time.perf_counter()-t_all:.2f}s nits={nits} "
              f"obj={costs[np.arange(n), p2o].sum()}", flush=True)
