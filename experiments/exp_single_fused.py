"""VERDICT r4 items 2+3 probe: how much of the per-call wall is serial
host submit cost, and does fusing stage+init+kernel+pack into ONE jit
program reclaim it?

The stage ledger (exp_stage_cost.py) showed every cheap stage sharing
an ~11-12 ms/call dispatch floor; the per-batch chain is 4-5 calls.
Submits are HOST work on this single-core machine, so they serialize
and cannot overlap device compute — fusing the chain into one program
should cut ~30-40 ms per batch (the stream ledger's missing ~7%) and
flip the dense 512²-1024² singles (currently 4-5 submits against a
19-86 ms native wall).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_single_fused.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import sparse_linear_assignment_tpu.batch as B
from sparse_linear_assignment_tpu.batch import (
    _fr_batch_init,
    _fr_fused_schedule,
    _fr_pack_results_with_objective,
    _stage_values_t,
    solve_batch,
)
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas


@functools.partial(
    jax.jit, static_argnames=("rounds", "pad_to", "real_b")
)
def fused_program(costs_dev, rounds, pad_to, real_b, eps_val):
    vt = _stage_values_t(costs_dev, True)
    b0, m, n = vt.shape
    if pad_to > b0:
        vt = jnp.concatenate(
            [vt, jnp.zeros((pad_to - b0, m, n), vt.dtype)]
        )
    start_eps = jnp.full((pad_to,), eps_val, vt.dtype)
    st = _fr_batch_init(vt, start_eps)
    if real_b < pad_to:
        st = st._replace(
            done=jnp.arange(pad_to, dtype=jnp.int32) >= real_b
        )
    st, _ = fr_chunk_pallas(vt, st, rounds)
    return _fr_pack_results_with_objective(st, vt, True)


def sync(x):
    return float(np.asarray(x).view(np.int32).sum())


def main():
    # 0) dispatch-floor probe: K chained tiny programs, one readback
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    tiny(x).block_until_ready()
    for k in (1, 20):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = tiny(y)
        _ = float(np.asarray(y[0, 0]))
        print(f"chained tiny dispatch x{k}: {time.perf_counter() - t0:.3f}s",
              flush=True)

    rng = np.random.default_rng(7)
    for n in (512, 896, 1024):
        costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
        dev = jnp.asarray(costs.astype(np.float32))
        jax.block_until_ready(dev)
        eps = 1.0 / (n + 1)

        # current production path (multi-dispatch)
        best_cur = None
        for _ in range(4):
            t0 = time.perf_counter()
            sol = solve_batch(costs, solver="fr", dtype=np.float32,
                              eps=eps, costs_device=dev)
            dt = time.perf_counter() - t0
            best_cur = dt if best_cur is None or dt < best_cur else best_cur
        assert int(sol.num_unassigned.sum()) == 0

        # fused one-dispatch program (bucketed to 64 like production)
        pad_to = 64
        rounds = _fr_fused_schedule(pad_to, n, 100_000)
        p = fused_program(dev, rounds, pad_to, 1, eps)
        jax.block_until_ready(p)
        best_f = None
        packed = None
        for _ in range(4):
            t0 = time.perf_counter()
            packed = np.asarray(fused_program(dev, rounds, pad_to, 1, eps))
            dt = time.perf_counter() - t0
            best_f = dt if best_f is None or dt < best_f else best_f
        half = n // 2
        assert packed[0, half + 1] != 0, "not done in budget"
        p2o = B._unpack_p2o_u16(packed[:1, :half], n)
        assert (p2o != B.UNASSIGNED).all()
        words = np.ascontiguousarray(
            packed[:1, half + 2:half + 4]).view(np.float32)
        obj = words[0, 0].astype(np.float64) + words[0, 1]
        assert abs(obj - float(sol.objective[0])) < 1e-6, (obj, sol.objective)
        print(f"n={n}: production {best_cur * 1e3:.1f} ms vs fused "
              f"one-dispatch {best_f * 1e3:.1f} ms "
              f"({best_cur / best_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
