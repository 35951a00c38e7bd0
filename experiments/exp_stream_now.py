"""Quick sustained-stream baseline at the current tree/weather."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from sparse_linear_assignment_tpu.batch import solve_batch_stream

n, b, copies = 256, 4096, 3

gen = jax.jit(lambda key: jax.random.randint(
    key, (b, n, n), 1, 1000, dtype=jnp.int32).astype(jnp.float32))
keys = jax.random.split(jax.random.PRNGKey(0), copies)
staged = [gen(k) for k in keys]
jax.block_until_ready(staged)
staged = [staged[i % copies] for i in range(5)]

solve_batch_stream(staged[:2], integer=True, max_cost=1000, window=2)
for rep in range(4):
    t0 = time.perf_counter()
    sols = solve_batch_stream(staged, integer=True, max_cost=1000, window=2)
    dt = time.perf_counter() - t0
    assert all(int(s.num_unassigned.sum()) == 0 for s in sols)
    print(f"stream x{len(staged)}: {dt:.2f}s -> "
          f"{len(staged) * b / dt:.0f} inst/s sustained", flush=True)
