"""A/B the pairwise-halving fused top-2 trees on the real TPU.

Measures, fused_top2 off vs on:
  (a) marginal us/executed-round of fr_chunk_pallas in BOTH modes
      (int packed-key and f32) at 512x256^2, via the budget-sweep
      protocol of exp_marginal.py (value-readback sync — plain
      block_until_ready through the tunnel returns early);
  (b) e2e solve_batch inst/s at B=4096x256^2 device-resident int mode
      (the driver bench configuration).

Context: the round decomposition (docs/PERFORMANCE.md) pinned ~83% of
the 0.665 us/inst-round int cost on serial reduction-tree latency; the
fusion removes one dependent tree in int mode (best+second) and two in
f32 (best+argbest+second).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu import batch as BM
from sparse_linear_assignment_tpu.batch import _fr_batch_init, _stage_values_t
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas

B, N = 512, 256


def sweep(values_t, s0, fused, label):
    rows = []
    for budget in (40, 160, 320):
        st, _ = fr_chunk_pallas(values_t, s0, budget, fused_top2=fused)
        nits = int(np.asarray(st.nits).sum())
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            st, _ = fr_chunk_pallas(values_t, s0, budget,
                                    fused_top2=fused)
            float(np.asarray(st.prices[0, 0]))
            best = min(best, time.perf_counter() - t0)
        rows.append((budget, nits, best))
        print(f"  {label} budget {budget:4d}: nits {nits:7d}  "
              f"best {best * 1e3:7.1f} ms", flush=True)
    m = (rows[-1][2] - rows[0][2]) / (rows[-1][1] - rows[0][1])
    print(f"  {label}: marginal {m * 1e6:.3f} us/executed-round", flush=True)
    return m


rng = np.random.default_rng(0)
costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)

print("== f32 mode ==", flush=True)
values_t = _stage_values_t(jnp.asarray(costs), True)
eps = jnp.full((B,), np.float32(1.0 / N))
s0 = _fr_batch_init(values_t, eps)
float(np.asarray(s0.prices[0, 0]))
m_off = sweep(values_t, s0, 0, "serial trees")
m_on = sweep(values_t, s0, 1, "fused top-2 ")
print(f"f32 ratio: {m_off / m_on:.3f}x", flush=True)

print("== int mode ==", flush=True)
scale = BM._integer_scale(None, None, N, N, True, 1000)
vt_int = BM._stage_values_t_int(jnp.asarray(costs), True, scale)
eps_i = jnp.full((B,), 1.0)
s0i = _fr_batch_init(vt_int, eps_i)
float(np.asarray(s0i.prices[0, 0]))
mi_off = sweep(vt_int, s0i, 0, "serial trees")
mi_on = sweep(vt_int, s0i, 1, "fused top-2 ")
print(f"int ratio: {mi_off / mi_on:.3f}x", flush=True)

print("== e2e device-resident int B=4096 (driver bench config) ==",
      flush=True)
B2 = 4096
gen = jax.jit(lambda key: jax.random.randint(
    key, (B2, N, N), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
dev = gen(jax.random.PRNGKey(0))
jax.block_until_ready(dev)
from sparse_linear_assignment_tpu.batch import solve_batch

sol = solve_batch(None, solver="fr", dtype=np.float32,
                  costs_device=dev, integer=True, max_cost=1000)
best = np.inf
for _ in range(5):
    t0 = time.perf_counter()
    sol = solve_batch(None, solver="fr", dtype=np.float32,
                      costs_device=dev, integer=True, max_cost=1000)
    assert int(sol.num_unassigned.sum()) == 0
    best = min(best, time.perf_counter() - t0)
print(f"e2e: {best:.2f}s -> {B2 / best:.0f} inst/s "
      f"(fused auto-on; compare BASELINE.md 5,365 at B=2048 / "
      f"bench 6,213 per call)", flush=True)
