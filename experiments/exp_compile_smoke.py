"""Hardware compile+run smoke of the three changed kernels (small shapes)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from sparse_linear_assignment_tpu.ops.fr_dense import fr_init
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk
from sparse_linear_assignment_tpu import batch as BM
from scipy.optimize import linear_sum_assignment

rng = np.random.default_rng(1)
# 1) VMEM kernel f32 fused
b, n = 8, 256
costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
vt = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
s0 = BM._fr_batch_init(vt, jnp.full((b,), np.float32(1.0 / (n + 1))))
t0 = time.time()
st, _ = fr_chunk_pallas(vt, s0, 640)
p2o = np.asarray(st.p2o)
print(f"vmem f32 fused: compiled+ran in {time.time()-t0:.1f}s "
      f"done={np.asarray(st.done).sum()}/{b}", flush=True)
r, c = linear_sum_assignment(costs[0])
got = costs[0][np.arange(n), p2o[0]].sum()
assert abs(got - costs[0][r, c].sum()) < 1e-6, (got, costs[0][r, c].sum())
print("vmem f32 objective exact", flush=True)

# 2) VMEM kernel int fused
scale = BM._integer_scale(None, None, n, n, True, 100)
vti = BM._stage_values_t_int(jnp.asarray(costs.astype(np.float32)), True, scale)
s0i = BM._fr_batch_init(vti, jnp.full((b,), 1.0))
t0 = time.time()
sti, _ = fr_chunk_pallas(vti, s0i, 640)
p2oi = np.asarray(sti.p2o)
print(f"vmem int fused: compiled+ran in {time.time()-t0:.1f}s "
      f"done={np.asarray(sti.done).sum()}/{b}", flush=True)
goti = costs[0][np.arange(n), p2oi[0]].sum()
assert abs(goti - costs[0][r, c].sum()) < 1e-6
print("vmem int objective exact", flush=True)

# 3) streaming kernel (hoisted flags + fusions)
n2 = 1024
costs2 = rng.integers(1, 1000, size=(n2, n2)).astype(np.float32)
vt2 = jnp.asarray(-costs2.T)
st2 = fr_init(vt2, np.float32(1.0 / (n2 + 1)))
t0 = time.time()
done = False
for _ in range(16):
    st2, d = fr_big_chunk(vt2, st2, 2 * n2, bm=128)
    if bool(np.asarray(d)):
        done = True
        break
print(f"big kernel: compiled+ran in {time.time()-t0:.1f}s done={done} "
      f"nits={int(np.asarray(st2.nits))}", flush=True)
p2o2 = np.asarray(st2.p2o)
r2, c2 = linear_sum_assignment(costs2.astype(np.float64))
got2 = costs2[np.arange(n2), p2o2].sum()
assert abs(float(got2) - costs2[r2, c2].sum()) < 1e-3, (got2,)
print("big kernel objective exact — ALL COMPILE CHECKS PASS", flush=True)
