"""Decompose the device-resident batched e2e time at B=4096 int mode.

FROZEN MEASUREMENT RECORD: imports the private _fr_solve_fused schedule
helper DELETED when the single-deep dispatch shipped (round 4) —
re-running raises by design; the decomposition it produced is in
docs/PERFORMANCE.md (round-3 third session) and was superseded by
exp_stage_cost.py.

Where does 4096/5755 = 0.71 s go?  Kernel rounds model: mean_nits x
0.665 us x 4096.  Candidates for the rest: staging, init, argsort/
gather continuation stages, the ~2 MB packed readback through the
10-14 MB/s tunnel, host unpack.

Sync rule (docs/PERFORMANCE.md): block_until_ready through axon can
return before execution — sync with a tiny VALUE readback instead.
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
print("int scale:", scale)


def sync(x):
    # scalar-slice readback: 4 bytes over the wire, still orders the
    # computation (a full-leaf np.asarray would read MBs..GBs through
    # the ~15 MB/s tunnel and swamp the stage being timed)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timed(label, fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    sync(out)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt * 1e3:.1f} ms")
    return out, dt


# ---- warm all programs once (compile) ----
vt = B._stage_values_t_int(dev, True, scale)
st = B._fr_batch_init(vt, jnp.full((b,), 1.0))
budget = int(max(96, n + n // 4))
bucket = max(128, 1 << max(0, (b // 16 - 1)).bit_length())
budget2 = min(100_000 - budget, 2 * budget)
bucket2 = 32
budget3 = min(100_000 - budget - budget2, 8 * budget)
print("budget schedule:", budget, bucket, budget2, bucket2, budget3)
stf = B._fr_solve_fused(vt, st, budget, bucket, budget2, bucket2, budget3)
packed = B._fr_pack_results_with_objective(stf, vt, True)
sync(packed)
print("warmed")

# ---- timed stages ----
for rep in range(3):
    print(f"--- repeat {rep} ---")
    t_all0 = time.perf_counter()
    vt, t_stage = timed("stage int", B._stage_values_t_int, dev, True, scale)
    st, t_init = timed("init", B._fr_batch_init, vt, jnp.full((b,), 1.0))
    # main kernel only
    st1, t_main = timed(
        "main kernel (budget 320)",
        lambda: fr_chunk_pallas(vt, st, budget, False)[0])
    undone_main = int(b - np.asarray(st1.done).sum())
    print(f"  undone after main: {undone_main}")
    # continuation level 1
    st2, t_c1 = timed(
        "cont1 (bucket 256 x 640)",
        lambda: B._fr_continue_bucket(vt, st1, bucket, budget2, False))
    undone1 = int(b - np.asarray(st2.done).sum())
    print(f"  undone after cont1: {undone1}")
    st3, t_c2 = timed(
        "cont2 (bucket 32 x 2560)",
        lambda: B._fr_continue_bucket(vt, st2, bucket2, budget3, False))
    # pack + readback
    t0 = time.perf_counter()
    packed = B._fr_pack_results_with_objective(st3, vt, True)
    host = np.asarray(packed)
    t_read = time.perf_counter() - t0
    print(f"pack+readback ({host.nbytes / 1e6:.2f} MB): {t_read * 1e3:.1f} ms")
    t0 = time.perf_counter()
    p2o = B._unpack_p2o_u16(host[:, :n // 2], n)
    t_unpack = time.perf_counter() - t0
    print(f"host unpack: {t_unpack * 1e3:.1f} ms")
    nits = host[:, n // 2]
    done = host[:, n // 2 + 1]
    print(f"  done: {done.sum()}/{b}  nits mean={nits.mean():.1f} "
          f"p50={np.percentile(nits, 50):.0f} p90={np.percentile(nits, 90):.0f} "
          f"p99={np.percentile(nits, 99):.0f} max={nits.max()}")
    total = time.perf_counter() - t_all0
    print(f"decomposed total: {total:.3f} s -> {b / total:.0f} inst/s "
          f"(stage {t_stage:.3f} init {t_init:.3f} main {t_main:.3f} "
          f"c1 {t_c1:.3f} c2 {t_c2:.3f} read {t_read:.3f})")

# ---- fused single-call for comparison ----
for rep in range(3):
    t0 = time.perf_counter()
    st = B._fr_batch_init(vt, jnp.full((b,), 1.0))
    stf = B._fr_solve_fused(vt, st, budget, bucket, budget2, bucket2, budget3)
    host = np.asarray(B._fr_pack_results_with_objective(stf, vt, True))
    dt = time.perf_counter() - t0
    print(f"fused e2e (no solve_batch wrapper): {dt:.3f} s -> "
          f"{b / dt:.0f} inst/s")
