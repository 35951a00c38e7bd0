"""Measure the fused kernel's per-instance entry cost (all-done call).

History: exp_serial_step.py showed a ~10.4 µs/instance "entry" cost
that scales with instances ENTERED, not grid steps — per-instance
state setup + epilogue.  Three structural cuts since:

- cardinality carried in via a pad scalar (was a serial [1, N] tree
  per instance entry);
- the epilogue no longer writes the never-read [6, N] zero-pad rows;
- the per-instance lax.cond + 4 Mosaic vector transposes at entry and
  exit moved into batched XLA wheres in the chunk wrapper
  (pre-oriented planes).

This probe re-measures the all-done entry cost to record how much of
the 10.4 µs those cuts removed, plus the main-kernel time at the
driver bench shape (B=4096, 256² int mode).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu import batch as B
from sparse_linear_assignment_tpu.ops import pallas_fr as PF

n = 256
b = 4096

gen = jax.jit(lambda key: jax.random.randint(
    key, (b, n, n), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
dev = gen(jax.random.PRNGKey(0))
jax.block_until_ready(dev)

scale = B._integer_scale(None, None, n, n, True, 1000)
vt = B._stage_values_t_int(dev, True, scale)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


budget_chunk = int(max(96, n + n // 4))
st_done = B._fr_batch_init(vt, jnp.full((b,), 1.0))
for i in range(16):
    st_done, alldone = PF.fr_chunk_pallas(vt, st_done, budget_chunk, False)
    print(f"prep chunk {i} alldone={bool(alldone)}", flush=True)
    if bool(alldone):
        break
print(f"undone: {int(b - np.asarray(st_done.done).sum())} of {b}",
      flush=True)

budget = budget_chunk
# all-done call: every instance enters its grid step, sees done, and
# exits — pure entry+epilogue cost
out, _ = PF.fr_chunk_pallas(vt, st_done, budget, False)
sync(out)
best = None
for _ in range(7):
    t0 = time.perf_counter()
    out, _ = PF.fr_chunk_pallas(vt, st_done, budget, False)
    sync(out)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(f"all-done entry: {best * 1e3:.1f} ms ({best / b * 1e6:.2f} "
      f"us/inst; was 10.30 before the entry cuts)", flush=True)

# main kernel from fresh state (marginal context for the same shapes)
s0 = B._fr_batch_init(vt, jnp.full((b,), 1.0))
sync(s0)
st, _ = PF.fr_chunk_pallas(vt, s0, budget, False)
sync(st)
best = None
for _ in range(5):
    t0 = time.perf_counter()
    st, _ = PF.fr_chunk_pallas(vt, s0, budget, False)
    sync(st)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
nits = int(np.asarray(st.nits).sum())
print(f"fresh budget-{budget}: {best * 1e3:.1f} ms, nits {nits} "
      f"-> {best / nits * 1e6:.3f} us/executed-round "
      f"(was 525 ms / ~0.665 us)", flush=True)
