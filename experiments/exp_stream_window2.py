"""VERDICT r4 item 2: probe the last ~7% of the dense-stream ledger.

The round-4 stage ledger (exp_stage_cost.py) left ~40 ms/batch of
non-overlapped issue/readback at the 7,488 inst/s record, and the
window-3 wash was only ever measured at B=4096 (~1 GB in-flight
buffers).  This sweeps B x window interleaved in one session: smaller
batches halve the HBM pressure that made window 3 a wash, and deeper
windows can hide more of the per-batch issue latency.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_stream_window2.py
"""

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_assignment_tpu.batch import solve_batch_stream

N = 256
CONFIGS = [
    # (B, windows, nbatch)
    (4096, (2, 3), 5),
    (2048, (2, 3, 4), 10),
    (1024, (2, 3, 4, 6), 20),
]
REPS = 3


def staged_batches(b, copies, nbatch):
    gen = jax.jit(lambda key: jax.random.randint(
        key, (b, N, N), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
    keys = jax.random.split(jax.random.PRNGKey(b), copies)
    staged = [gen(k) for k in keys]
    jax.block_until_ready(staged)
    return [staged[i % copies] for i in range(nbatch)]


def main():
    for b, windows, nbatch in CONFIGS:
        batches = staged_batches(b, 3, nbatch)
        # warm every window's program path once
        solve_batch_stream(batches[:2], integer=True, max_cost=1000,
                           window=2)
        rates = {w: [] for w in windows}
        for rep, w in itertools.product(range(REPS), windows):
            t0 = time.perf_counter()
            sols = solve_batch_stream(
                batches, integer=True, max_cost=1000, window=w
            )
            dt = time.perf_counter() - t0
            assert all(int(s.num_unassigned.sum()) == 0 for s in sols)
            rates[w].append(nbatch * b / dt)
            print(f"B={b} window={w} rep{rep}: {dt:.2f}s -> "
                  f"{rates[w][-1]:.0f} inst/s", flush=True)
        for w in windows:
            r = sorted(rates[w])
            print(f"== B={b} window={w}: best {r[-1]:.0f} "
                  f"median {r[len(r) // 2]:.0f} inst/s", flush=True)
        del batches


if __name__ == "__main__":
    main()
