"""Does a larger per-batch size raise the sustained streamed throughput?

The per-call fixed costs (~35 ms dispatch/pack + host bookkeeping)
amortize with B; the readback is already hidden by the window.  Measure
solve_batch_stream at B=4096 (current bench default) vs B=8192.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_assignment_tpu.batch import solve_batch_stream

n = 256


def staged_batches(batch, copies, total):
    @jax.jit
    def gen(key):
        return jax.random.randint(
            key, (batch, n, n), 1, 1000, dtype=jnp.int32
        ).astype(jnp.float32)

    keys = jax.random.split(jax.random.PRNGKey(0), copies)
    staged = [gen(k) for k in keys]
    jax.block_until_ready(staged)
    return [staged[i % copies] for i in range(total)]


for batch, copies, total in ((4096, 3, 5), (8192, 2, 3)):
    staged = staged_batches(batch, copies, total)
    # warm (compile + allocator growth)
    solve_batch_stream(staged[:2], integer=True, max_cost=1000, window=2)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        sols = solve_batch_stream(staged, integer=True, max_cost=1000,
                                  window=2)
        dt = time.perf_counter() - t0
        assert all(int(s.num_unassigned.sum()) == 0 for s in sols)
        rates.append(total * batch / dt)
        print(f"B={batch}: {dt:.2f}s -> {rates[-1]:.0f} inst/s sustained",
              flush=True)
    print(f"B={batch} best {max(rates):.0f} median {sorted(rates)[1]:.0f}",
          flush=True)
    del staged, sols
