"""Device-resident batched-sparse sustained throughput (VERDICT r4
item 1, production protocol): device-generated k-regular instances,
device scatter staging (zero tunnel ingress), fused Mosaic Khosla
kernel, packed readback with on-device objective — per-call and
pipelined-stream (window=2) rates, scipy-oracle spot checks via a
small readback.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_batch_sparse_stream.py [B n m k]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_assignment_tpu.batch import (
    _sparse_dispatch,
    _sparse_finish,
    stage_batch_sparse_device,
)
from sparse_linear_assignment_tpu.batch import solve_batch_sparse_stream

B, N, M, K = 4096, 128, 512, 8
if len(sys.argv) == 5:
    B, N, M, K = map(int, sys.argv[1:])
NBATCH = 5


@jax.jit
def gen(key):
    """k distinct columns per person via top_k over random keys (the
    device analogue of the argpartition host generator) + integer
    Beta-ish values (uniform int here — value distribution does not
    change the round structure; the host sweep used Beta(3,3))."""
    kc, kv = jax.random.split(key)
    scores = jax.random.uniform(kc, (B, N, M), jnp.float32)
    _, cols = jax.lax.top_k(scores, K)
    vals = jax.random.randint(
        kv, (B, N, K), 300, 1000, dtype=jnp.int32
    ).astype(jnp.float32)
    return cols.astype(jnp.int32), vals


def main():
    from scipy.optimize import linear_sum_assignment as lsa

    keys = jax.random.split(jax.random.PRNGKey(17), NBATCH)
    t0 = time.perf_counter()
    raw = [gen(k) for k in keys]
    jax.block_until_ready(raw)
    print(f"device gen: {NBATCH}x{B}x{N}x{K} in "
          f"{time.perf_counter() - t0:.1f}s (setup, excluded)", flush=True)

    t0 = time.perf_counter()
    staged = [
        stage_batch_sparse_device(c, v, M, eps=1.0 / M) for c, v in raw
    ]
    jax.block_until_ready([s.values_t for s in staged])
    print(f"device scatter staging: {time.perf_counter() - t0:.2f}s "
          f"({B * N * M * 4 / 1e9:.2f} GB/plane x{NBATCH}, setup)",
          flush=True)

    # per-call (first = compile exposure)
    t0 = time.perf_counter()
    sol = _sparse_finish(staged[0], _sparse_dispatch(staged[0], 16),
                         10_000_000)
    print(f"first call (incl compile): {time.perf_counter() - t0:.1f}s "
          f"unassigned={int(sol.num_unassigned.sum())}", flush=True)
    rates = []
    for st in staged[1:4]:
        t0 = time.perf_counter()
        sol = _sparse_finish(st, _sparse_dispatch(st, 16), 10_000_000)
        dt = time.perf_counter() - t0
        rates.append(B / dt)
        print(f"per-call: {dt:.3f}s -> {B / dt:.0f} inst/s "
              f"(nits mean {sol.nits.mean():.1f} max {sol.nits.max()})",
              flush=True)

    # sustained stream
    sols = solve_batch_sparse_stream(staged[:2])  # warm pass
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        sols = solve_batch_sparse_stream(staged)
        dt = time.perf_counter() - t0
        rate = NBATCH * B / dt
        best = max(best, rate)
        print(f"stream x{NBATCH}: {dt:.2f}s -> {rate:.0f} inst/s "
              f"sustained", flush=True)
    assert all(int(s.num_unassigned.sum()) == 0 for s in sols)

    # oracle spot checks: read back 3 instances' compact arcs
    cols_h = np.asarray(raw[-1][0][:: B // 2])
    vals_h = np.asarray(raw[-1][1][:: B // 2])
    last = sols[-1]
    for idx, bi in enumerate(range(0, B, B // 2)):
        full = np.full((N, M), 1e9)
        for i in range(N):
            full[i, cols_h[idx, i]] = vals_h[idx, i]
        r, c = lsa(full)
        want = full[r, c].sum()
        assert last.objective[bi] == want, (bi, last.objective[bi], want)
    print("oracle exact on 3 spot checks", flush=True)
    print(f"RESULT: per-call best {max(rates):.0f} inst/s, "
          f"sustained best {best:.0f} inst/s", flush=True)


if __name__ == "__main__":
    main()
