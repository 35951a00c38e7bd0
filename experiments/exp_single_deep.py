"""A/B: the 3-stage fused schedule vs ONE deep-budget kernel call.

FROZEN MEASUREMENT RECORD (like exp_big_tail2/3): the A/B concluded in
favor of the single deep call, which then SHIPPED — _fr_solve_fused and
the 5-tuple _fr_fused_schedule this script compares against no longer
exist, so re-running it raises.  The numbers it produced are in
docs/PERFORMANCE.md (round 4) and BASELINE.md.

Hypothesis (round 4): the two undone-first continuation stages
(argsort + 14-leaf gather/scatter + 2 extra pallas dispatches) cost
more than they save.  Done instances exit their grid step immediately,
so a single call with budget = the schedule's total (320+640+2560)
executes the SAME per-instance rounds with 4096 entries instead of
4096+256+32, and zero reorder glue.  Healthy-window decomp (2026-08-20):
main(320) ~520 ms but c1 ~242 ms + c2 ~266 ms sync-padded — the
continuation is ~25 ms of modeled work.

Timed single-sync (value readback); 5 reps each, interleaved A/B/A/B.
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
eps = jnp.full((b,), 1.0)
budget, bucket, budget2, bucket2, budget3 = B._fr_fused_schedule(
    b, n, 100_000
)
total = budget + budget2 + budget3
print(f"schedule: {budget}/{bucket}/{budget2}/{bucket2}/{budget3} "
      f"-> single-call budget {total}")


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def run_sched():
    st = B._fr_batch_init(vt, eps)
    stf = B._fr_solve_fused(vt, st, budget, bucket, budget2, bucket2,
                            budget3)
    packed = B._fr_pack_results_with_objective(stf, vt, True)
    return packed


def run_single():
    st = B._fr_batch_init(vt, eps)
    stf, _ = fr_chunk_pallas(vt, st, total)
    packed = B._fr_pack_results_with_objective(stf, vt, True)
    return packed


# warm both (single-deep is a fresh program: expect a long Mosaic
# compile on first call)
t0 = time.perf_counter()
pa = run_sched()
sync(pa)
print(f"sched warm: {time.perf_counter() - t0:.1f}s")
t0 = time.perf_counter()
ps = run_single()
sync(ps)
print(f"single warm (incl compile): {time.perf_counter() - t0:.1f}s")

ha = np.asarray(pa)
hs = np.asarray(ps)
half = n // 2
assert (ha[:, half + 1] != 0).all(), "sched not all done"
assert (hs[:, half + 1] != 0).all(), "single not all done"
print("p2o identical:", np.array_equal(ha[:, :half], hs[:, :half]))
print("objective identical:",
      np.array_equal(ha[:, half + 2:half + 4], hs[:, half + 2:half + 4]))
print("nits mean sched", ha[:, half].mean(), "single", hs[:, half].mean())

for rep in range(5):
    t0 = time.perf_counter()
    sync(run_sched())
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(run_single())
    ts = time.perf_counter() - t0
    print(f"rep {rep}: sched {ta:.3f}s ({b / ta:.0f} inst/s)  "
          f"single {ts:.3f}s ({b / ts:.0f} inst/s)")
