"""Is the ~10 µs/instance kernel-entry cost DMA or setup compute — and
does Mosaic's grid pipelining already hide it behind compute?

Two questions the e2e decomposition (exp_e2e_decomp.py) left open about
the "grid-step entry" term it measured additively at ~12 µs/instance:

1. **Bytes or setup?**  Each grid step DMAs vals + valsᵀ (2·n²·4 B =
   512 KB at 256²) plus small planes HBM→VMEM.  If the all-done entry
   cost scales ~4× between 128² and 256², it is DMA-bandwidth; if it
   is flat, it is per-instance state setup/epilogue compute.

2. **Hidden or additive in production?**  Pallas pipelines block copies
   across grid steps (step i+1's DMA issued during step i's body).  A
   batch interleaving fresh (≈100 µs compute) and all-done (pure entry)
   instances answers whether a done instance's entry hides under its
   neighbor's compute: T_interleaved ≈ T_fresh means hidden (the
   decomposition's additive entry term is then an artifact of the
   all-done measurement), T_fresh + T_done means additive (a manual
   double-buffer restructure would be worth ~8% e2e).

Protocol notes: value-readback syncs (block_until_ready returns early
through the tunnel), best-of-5, one staged input reused.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu import batch as B
from sparse_linear_assignment_tpu.ops import pallas_fr as PF


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def best_of(fn, k=5):
    fn()  # warm
    best = None
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def stage(b, n, seed=0):
    gen = jax.jit(lambda key: jax.random.randint(
        key, (b, n, n), 1, 1000, dtype=jnp.int32).astype(jnp.float32),
        static_argnums=())
    dev = gen(jax.random.PRNGKey(seed))
    jax.block_until_ready(dev)
    scale = B._integer_scale(None, None, n, n, True, 1000)
    return B._stage_values_t_int(dev, True, scale)


def run_to_done(vt, budget, chunks=16):
    st = B._fr_batch_init(vt, jnp.full((vt.shape[0],), 1.0))
    for _ in range(chunks):
        st, alldone = PF.fr_chunk_pallas(vt, st, budget, False)
        if bool(alldone):
            break
    assert bool(alldone), "instances did not finish"
    return st


BUDGET = 320

# ---- Q1: bytes scaling of the all-done entry ----
for n in (128, 256):
    b = 2048
    vt = stage(b, n)
    st_done = run_to_done(vt, BUDGET)
    t = best_of(lambda: sync(PF.fr_chunk_pallas(vt, st_done, BUDGET, False)[0]))
    per = t / b * 1e6
    byts = 2 * n * n * 4 + 4 * 8 * n * 4
    print(f"all-done entry n={n}: {t * 1e3:.1f} ms = {per:.2f} us/inst "
          f"({byts / 1024:.0f} KiB/inst -> {byts / per / 1e3:.1f} GB/s "
          f"if DMA-bound)", flush=True)

# ---- Q2: interleaved fresh/done vs separate ----
n, b = 256, 2048
vt_a = stage(b, n, seed=1)   # fresh work
vt_b = stage(b, n, seed=2)   # will be all-done
st_done_b = run_to_done(vt_b, BUDGET)
s0_a = B._fr_batch_init(vt_a, jnp.full((b,), 1.0))
sync(s0_a)

t_fresh = best_of(
    lambda: sync(PF.fr_chunk_pallas(vt_a, s0_a, BUDGET, False)[0]))
t_done = best_of(
    lambda: sync(PF.fr_chunk_pallas(vt_b, st_done_b, BUDGET, False)[0]))
print(f"T_fresh(B={b}): {t_fresh * 1e3:.1f} ms   "
      f"T_done(B={b}): {t_done * 1e3:.1f} ms", flush=True)


@jax.jit
def interleave(a, bb):
    def ileave(x, y):
        stacked = jnp.stack([x, y], axis=1)  # [b, 2, ...]
        return stacked.reshape((x.shape[0] * 2,) + x.shape[1:])
    return jax.tree_util.tree_map(ileave, a, bb)


vt_i = interleave(vt_a, vt_b)
st_i = interleave(s0_a, st_done_b)
sync(st_i)

t_inter = best_of(
    lambda: sync(PF.fr_chunk_pallas(vt_i, st_i, BUDGET, False)[0]))
print(f"T_interleaved(B={2 * b}, half fresh half done): "
      f"{t_inter * 1e3:.1f} ms", flush=True)
print(f"  no-overlap model (T_fresh + T_done): "
      f"{(t_fresh + t_done) * 1e3:.1f} ms", flush=True)
print(f"  full-overlap model (T_fresh + ~0):  {t_fresh * 1e3:.1f} ms",
      flush=True)
hidden = (t_fresh + t_done - t_inter) / max(t_done, 1e-9)
print(f"  => {hidden * 100:.0f}% of the done-entry cost is hidden by "
      f"the neighbor's compute", flush=True)
