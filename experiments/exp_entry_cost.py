"""Decompose the ~10.3 us per-instance kernel entry cost
(exp_serial_step.py: flat in `serial`, so it is per-instance
setup/epilogue work, not grid machinery).

Hypothesis: the _orient/_deorient lax.cond transposes dominate —
Mosaic [S,1]<->[1,S] vector relayouts measured ~expensive in the
int3t probe (docs/PERFORMANCE.md).  Measurement-only monkeypatch:
identity orient/deorient (semantically wrong for reverse-mode
instances; the all-done path only passes state through).

Second lever measured: skipping the 6-row zero padding writes in the
epilogue (output rows 2..7 are never read back).
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
budget = int(max(96, n + n // 4))


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


def measure(label):
    PF.fr_chunk_pallas.clear_cache()
    out, _ = PF.fr_chunk_pallas(vt, st_done, budget, False)
    sync(out)
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        out, _ = PF.fr_chunk_pallas(vt, st_done, budget, False)
        sync(out)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: all-done {best * 1e3:.1f} ms "
          f"({best / b * 1e6:.2f} us/inst)")


measure("baseline")

# identity-shaped: the forward orientation is a pass-through (prices/
# o2p already [M,1] columns, pi/p2o already [1,N] rows), so patching
# both helpers to identity removes exactly the lax.cond + 4-transposes
# pair at entry and exit
orig_orient, orig_deorient = PF._orient, PF._deorient
PF._orient = lambda mode, p, q, a, b_: (p, q, a, b_)
PF._deorient = lambda mode, p, q, a, b_: (p, q, a, b_)
measure("identity orient/deorient (measurement only)")
PF._orient, PF._deorient = orig_orient, orig_deorient

# third probe: orient cost with mode uniformly forward vs reverse is
# data-dependent; restore and re-measure to confirm the patch cycle
measure("baseline restored")
