"""Split the REAL fused kernel's cost into marginal-per-executed-round
vs per-instance fixed overhead (grid step, packing, while-loop).

Runs fr_chunk_pallas at several budgets from the same initial state;
marginal = dt/dnits between budgets, fixed = t - marginal*nits at the
smallest budget.  Sync via a scalar readback (block_until_ready through
the tunnel returns early — see docs/PERFORMANCE.md round 3).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import _fr_batch_init, _stage_values_t
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas

B, N = 512, 256

rng = np.random.default_rng(0)
costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)
values_t = _stage_values_t(jnp.asarray(costs), True)
eps = jnp.full((B,), np.float32(1.0 / N))
s0 = _fr_batch_init(values_t, eps)
float(np.asarray(s0.prices[0, 0]))

rows = []
for budget in (20, 40, 80, 160, 320):
    st, _ = fr_chunk_pallas(values_t, s0, budget)
    nits = int(np.asarray(st.nits).sum())
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        st, _ = fr_chunk_pallas(values_t, s0, budget)
        sync = float(np.asarray(st.prices[0, 0]))
        best = min(best, time.perf_counter() - t0)
    rows.append((budget, nits, best))
    print(f"budget {budget:4d}: nits {nits:7d}  best {best*1e3:7.1f} ms",
          flush=True)

for (b0, n0, t0), (b1, n1, t1) in zip(rows, rows[1:]):
    marg = (t1 - t0) / (n1 - n0) * 1e6
    print(f"marginal {b0}->{b1}: {marg:.3f} us/executed-round", flush=True)
m = (rows[-1][2] - rows[0][2]) / (rows[-1][1] - rows[0][1])
fixed = rows[0][2] - m * rows[0][1]
print(f"overall marginal {m*1e6:.3f} us/round, fixed {fixed*1e3:.1f} ms "
      f"({fixed/B*1e6:.1f} us/instance incl one readback)", flush=True)
