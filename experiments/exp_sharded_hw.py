"""Hardware validation of the multi-chip batched program on a 1-device
TPU mesh.

``solve_batch_sharded[_stream]`` is the projected path past the 10k
inst/s north star (multi-chip batch sharding), but every prior run of
it used the 8-device *virtual CPU* mesh (dryrun / interpret mode).
This probe runs the REAL per-chip program — shard_map wrapping the
fused Mosaic schedule — on the one available TPU chip (d=1 mesh):

1. validates that the sharded program lowers and executes on silicon
   (Mosaic inside shard_map is a different lowering path than the
   plain jit the single-chip bench uses);
2. populates the persistent compilation cache with the sharded module;
3. prices the shard_map wrapper overhead by racing the sharded stream
   against the unsharded ``solve_batch_stream`` on the same staged
   batches in the same session — if the d=1 sharded throughput matches
   the unsharded path, the linear multi-chip projection (~8x on an
   8-chip v5e slice) rests on measured per-chip behavior, not on the
   interpret-mode stand-in.

Run SOLO (single-core host); first call may pay a fresh Mosaic compile
for the shard_map-wrapped module (~minutes, then cached).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sparse_linear_assignment_tpu.batch import solve_batch_stream
from sparse_linear_assignment_tpu.parallel import (
    solve_batch_sharded,
    solve_batch_sharded_stream,
)

N = 256
B = 4096
COPIES = 3
TOTAL = 5
REPEATS = 3


def staged_batches(batch, copies, total):
    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (batch, N, N), 1, 1000, dtype=jnp.int32
        ).astype(jnp.float32)

    keys = jax.random.split(jax.random.PRNGKey(0), copies)
    staged = [gen(k) for k in keys]
    jax.block_until_ready(staged)
    return [staged[i % copies] for i in range(total)]


def oracle_check(costs_dev, sol, k=4):
    from scipy.optimize import linear_sum_assignment as lsa

    host = np.asarray(costs_dev[:k]).astype(np.float64)
    for i in range(k):
        r, c = lsa(host[i])
        want = host[i][r, c].sum()
        got = float(sol.objective[i])
        assert abs(got - want) < 1e-6, (i, got, want)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    mesh = Mesh(np.array([dev]), ("shard",))
    staged = staged_batches(B, COPIES, TOTAL)
    # host mirror of batch 0: solve_batch_sharded evaluates the
    # objective host-side from `costs` (staging uses costs_device)
    host0 = np.asarray(staged[0])

    # --- sharded per-call path (compile + correctness) ---
    t0 = time.perf_counter()
    sol = solve_batch_sharded(
        host0,
        mesh,
        integer=True,
        max_cost=1000,
        costs_device=staged[0],
    )
    print(
        f"sharded per-call first (incl compile): "
        f"{time.perf_counter() - t0:.1f}s, "
        f"undone={int(sol.num_unassigned.sum())}, "
        f"mean nits {float(np.mean(sol.nits)):.1f}",
        flush=True,
    )
    assert int(sol.num_unassigned.sum()) == 0
    oracle_check(staged[0], sol)
    print("sharded per-call oracle check: exact", flush=True)

    percall = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        sol = solve_batch_sharded(
            host0,
            mesh,
            integer=True,
            max_cost=1000,
            costs_device=staged[0],
        )
        dt = time.perf_counter() - t0
        percall.append(B / dt)
        print(f"sharded per-call: {dt:.3f}s -> {percall[-1]:.0f} inst/s",
              flush=True)

    # --- sharded stream vs unsharded stream, same staged inputs ---
    results = {}
    for name, fn in (
        ("sharded-stream", lambda xs: solve_batch_sharded_stream(
            xs, mesh, integer=True, max_cost=1000, window=2)),
        ("unsharded-stream", lambda xs: solve_batch_stream(
            xs, integer=True, max_cost=1000, window=2)),
    ):
        fn(staged[:2])  # warm
        rates = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            sols = fn(staged)
            dt = time.perf_counter() - t0
            assert all(int(s.num_unassigned.sum()) == 0 for s in sols)
            rates.append(TOTAL * B / dt)
            print(f"{name}: {dt:.2f}s -> {rates[-1]:.0f} inst/s sustained",
                  flush=True)
        oracle_check(staged[0], sols[0])
        results[name] = (max(rates), sorted(rates)[len(rates) // 2])
        print(f"{name} best {results[name][0]:.0f} "
              f"median {results[name][1]:.0f}", flush=True)

    ratio = results["sharded-stream"][0] / results["unsharded-stream"][0]
    print(
        f"shard_map wrapper overhead at d=1: sharded/unsharded = "
        f"{ratio:.3f} (best-of-{REPEATS})",
        flush=True,
    )


if __name__ == "__main__":
    main()
