"""Sweep the stall-preemption horizon STALL_K0 (round-count lever).

The FR engine flips mode after stall_k no-progress rounds (doubling on
each preemption, reset on progress).  STALL_K0=8 was never swept; the
batched throughput is round-count x marginal, so a shorter/longer
initial horizon may cut mean nits.  Runs the real fused kernel at
512x256^2 with a deep budget so every instance finishes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sparse_linear_assignment_tpu.ops.fr_dense as frd
import sparse_linear_assignment_tpu.ops.pallas_fr as pfr
from sparse_linear_assignment_tpu.batch import _stage_values_t
from sparse_linear_assignment_tpu.ops.fr_dense import FRState

B, N = 512, 256
BUDGET = 2560

rng = np.random.default_rng(0)
costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)
values_t = _stage_values_t(jnp.asarray(costs), True)
float(np.asarray(values_t[0, 0, 0]))

for k0 in (2, 4, 8, 16, 32):
    pfr._STALL_K0 = np.int32(k0)
    jax.clear_caches()
    states = FRState(
        prices=jnp.zeros((B, N), jnp.float32),
        profits=jnp.max(values_t, axis=1),
        p2o=jnp.full((B, N), np.int32(2**31 - 1)),
        o2p=jnp.full((B, N), np.int32(2**31 - 1)),
        eps=jnp.full((B,), np.float32(1.0 / N)),
        forward_mode=jnp.ones((B,), bool),
        since_inc=jnp.zeros((B,), jnp.int32),
        stall_k=jnp.full((B,), k0, jnp.int32),
        nits=jnp.zeros((B,), jnp.int32),
        nreductions=jnp.zeros((B,), jnp.int32),
        optimal_found=jnp.zeros((B,), bool),
        done=jnp.zeros((B,), bool),
    )
    st, _ = pfr.fr_chunk_pallas(values_t, states, BUDGET)
    nits = np.asarray(st.nits)
    done = int(np.asarray(st.done).sum())
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = pfr.fr_chunk_pallas(values_t, states, BUDGET)
        float(np.asarray(st.prices[0, 0]))
        best = min(best, time.perf_counter() - t0)
    print(
        f"k0={k0:2d}: done {done}/{B}  nits p50 {np.percentile(nits,50):.0f}"
        f" mean {nits.mean():.0f} p99 {np.percentile(nits,99):.0f}"
        f" max {nits.max()}  sum {nits.sum()}  best {best*1e3:.0f} ms",
        flush=True,
    )
