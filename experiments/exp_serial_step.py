"""Probe: ``serial`` instances per grid step (sequential while loops,
no lockstep coupling) to amortize the measured ~12 us per-grid-step
Mosaic entry cost (exp_e2e_decomp.py: 0.05 s of the 0.62 s e2e at
B=4096 is grid-step entry).

Two measurements, B=4096 x 256^2 int mode, serial in {1, 2, 4}:
  1. all-done entry cost: run the kernel on an already-done state —
     every instance's while loop exits immediately, so the wall clock
     is pure per-step bookkeeping.  If entry cost is per STEP, serial=2
     halves it; if per INSTANCE ENTERED, it stays flat.
  2. main kernel e2e at the shipped budget (fresh init), best-of-3.

Sync rule: value readback, never bare block_until_ready.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu import batch as B
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas

n = 256
b = 4096

gen = jax.jit(lambda key: jax.random.randint(
    key, (b, n, n), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
dev = gen(jax.random.PRNGKey(0))
jax.block_until_ready(dev)

scale = B._integer_scale(None, None, n, n, True, 1000)
vt = B._stage_values_t_int(dev, True, scale)
budget = int(max(96, n + n // 4))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


# run to (mostly) done once, for the all-done entry measurement
st0 = B._fr_batch_init(vt, jnp.full((b,), 1.0))
st_done, _ = fr_chunk_pallas(vt, st0, 4096, False)
sync(st_done)
undone = int(b - np.asarray(st_done.done).sum())
print(f"prepared all-done state: {undone} undone of {b}")

for serial in (1, 2, 4):
    # warm the compile for this serial
    out, _ = fr_chunk_pallas(vt, st_done, budget, False, serial=serial)
    sync(out)
    entry = []
    for _ in range(5):
        t0 = time.perf_counter()
        out, _ = fr_chunk_pallas(vt, st_done, budget, False, serial=serial)
        sync(out)
        entry.append(time.perf_counter() - t0)
    best_e = min(entry)
    print(f"serial={serial}: all-done kernel call {best_e * 1e3:.1f} ms "
          f"({best_e / b * 1e6:.2f} us/inst entry)")

    # fresh-solve main kernel
    solve = []
    for _ in range(3):
        st = B._fr_batch_init(vt, jnp.full((b,), 1.0))
        sync(st)
        t0 = time.perf_counter()
        out, _ = fr_chunk_pallas(vt, st, budget, False, serial=serial)
        sync(out)
        solve.append(time.perf_counter() - t0)
    print(f"serial={serial}: main kernel (budget {budget}) "
          f"best {min(solve) * 1e3:.1f} ms  all {[f'{s:.3f}' for s in solve]}")
