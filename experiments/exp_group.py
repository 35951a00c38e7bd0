"""Probe: fused FR kernel round cost vs interleave group size (real TPU).

Times a fixed-budget fr_chunk_pallas dispatch at 512x256x256 for
group in {1, 2, 4, 8} and reports seconds + us/instance-round.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import _fr_batch_init, _stage_values_t
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas

B, N = 512, 256
BUDGET = 320

rng = np.random.default_rng(0)
costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)
dev = jnp.asarray(costs)
values_t = _stage_values_t(dev, True)
jax.block_until_ready(values_t)
eps = jnp.full((B,), np.float32(1.0 / N))
s0 = _fr_batch_init(values_t, eps)
jax.block_until_ready(s0)

for group in (1, 2, 4, 8):
    t0 = time.perf_counter()
    st, _ = fr_chunk_pallas(values_t, s0, BUDGET, group=group)
    jax.block_until_ready(st)
    compile_t = time.perf_counter() - t0
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        st, _ = fr_chunk_pallas(values_t, s0, BUDGET, group=group)
        jax.block_until_ready(st)
        best = min(best, time.perf_counter() - t0)
    nits = np.asarray(st.nits)
    total_rounds = int(nits.sum())
    done = int(np.asarray(st.done).sum())
    print(
        f"group={group}: compile+1st {compile_t:.1f}s, best {best*1e3:.1f} ms,"
        f" {best/ total_rounds * 1e6:.3f} us/inst-round"
        f" (sum nits {total_rounds}, done {done}/{B},"
        f" mean nits {nits.mean():.0f}, max {nits.max()})",
        flush=True,
    )
