"""RTT-amortized per-stage costs of the stream's per-batch device work.

Per-stage timings with one sync per stage are unresolvable below the
tunnel RTT (~50-100 ms).  Here each stage is dispatched K times on K
DISTINCT pre-staged inputs (no CSE, no artificial chaining) with ONE
value-readback sync at the end: per-call cost = (wall - RTT) / K.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu import batch as B
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas

n, b, K = 256, 4096, 4  # K*2 x 1.07 GB must fit 16 GB HBM

gen = jax.jit(lambda key: jax.random.randint(
    key, (b, n, n), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
keys = jax.random.split(jax.random.PRNGKey(0), K)
inputs = [gen(k) for k in keys]
jax.block_until_ready(inputs)
scale = B._integer_scale(None, None, n, n, True, 1000)
eps = jnp.full((b,), 1.0)


def sync(xs):
    leaf = jax.tree_util.tree_leaves(xs[-1] if isinstance(xs, list) else xs)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timed_k(label, fn, args_list, reps=3, keep=False):
    outs = [fn(*a) for a in args_list]  # warm/compile
    sync(outs)
    best = None
    for _ in range(reps):
        del outs  # free before re-dispatch: 2x in-flight copies OOM HBM
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args_list]
        sync(outs)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    per = best / len(args_list) * 1e3
    print(f"{label}: {per:.1f} ms/call (best total {best*1e3:.0f} ms / "
          f"{len(args_list)})", flush=True)
    return outs if keep else None


# stage: int-scale + negate + transpose
timed_k("stage int (scale+negate+swapaxes)",
        lambda x: B._stage_values_t_int(x, True, scale),
        [(x,) for x in inputs])

# components
just_t = jax.jit(lambda x: jnp.swapaxes(x, 1, 2))
timed_k("swapaxes only (f32)", just_t, [(x,) for x in inputs])
just_scale = jax.jit(
    lambda x: -(jnp.round(x).astype(jnp.int32) * jnp.int32(scale)))
timed_k("round+int-scale+negate only", just_scale, [(x,) for x in inputs])

vts = [B._stage_values_t_int(x, True, scale) for x in inputs]
sync(vts)
del inputs  # free 4.3 GB before allocating solve states

# init
timed_k("fr_batch_init", lambda v: B._fr_batch_init(v, eps),
        [(v,) for v in vts])

# pack with objective (on solved states it gathers/objectives)
sts = [B._fr_batch_init(v, eps) for v in vts]
solved = [fr_chunk_pallas(v, s, 3520)[0] for v, s in zip(vts, sts)]
sync(solved[-1])
timed_k("pack_results_with_objective",
        lambda s, v: B._fr_pack_results_with_objective(s, v, True),
        list(zip(solved, vts)))

# the full solve call for reference
timed_k("fr_chunk_pallas deep (3520)",
        lambda v, s: fr_chunk_pallas(v, s, 3520)[0],
        list(zip(vts, sts)), reps=2)
