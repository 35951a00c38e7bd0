"""Minimal standalone reproducers for the backend bugs this project
works around (docs/PERFORMANCE.md pitfall list) — written for upstream
reports (JAX / Mosaic / the axon TPU tunnel).  Each case is selected by
a CLI argument and is independent of the package.

    python experiments/repro_backend_bugs.py <case>

Cases (run one at a time; the compile bombs are EXPECTED to hang or
exhaust memory — bound them with `timeout 300 ...`):

  while_gather   lax.while_loop whose body contains an HBM gather:
                 compile time explodes (multi-minute AOT, tens of GB of
                 compiler RSS) on the TPU backend.  Workaround used in
                 the package: host-chunked fixed-length lax.scan.

  lane_gather    x[:, ids] (gather along the 128-lane minor axis):
                 same explosion.  Workaround: transpose to row gathers
                 x_t[ids] (embedding-style, leading-axis).

  prefix_scan    jnp.cumsum / jnp.nonzero on 1-D int arrays lower to
                 reduce-window prefix scans that explode at n >= ~1e5.
                 Workaround: MXU prefix sum via triangular matmuls
                 (sparse_linear_assignment_tpu/ops/prefix.py).

  early_sync     jax.block_until_ready returning BEFORE the computation
                 ran when the device is reached through the axon
                 tunnel: wall-clock timings read ~0 ms for multi-ms
                 programs.  Workaround: sync benchmarks with a value
                 readback (float(np.asarray(x[0, 0]))) or chain calls
                 through data dependencies.

All four behaviors were observed 2026-08-16/17 on a TPU v5e reached
through the axon tunnel (remote AOT compile service), jax as baked into
this image.  On a healthy backend every case completes in well under a
minute; `while_gather`/`lane_gather`/`prefix_scan` should each compile
in seconds.
"""

import sys
import time

import numpy as np


def while_gather():
    import jax
    import jax.numpy as jnp
    from jax import lax

    n, k = 100_000, 8
    prices = jnp.zeros(2 * n, jnp.float32)
    cols = jnp.asarray(
        np.random.default_rng(0).integers(0, 2 * n, size=(n, k)), jnp.int32
    )

    @jax.jit
    def run(prices, cols):
        def body(state):
            i, prices = state
            # the gather inside the while body is the trigger: the same
            # body under a host loop or lax.scan compiles in seconds
            p = prices[cols]          # [n, k] gather
            best = p.min(axis=1)
            prices = prices.at[jnp.argmin(best)].add(1.0)
            return i + 1, prices

        def cond(state):
            return state[0] < 100

        return lax.while_loop(cond, body, (jnp.int32(0), prices))

    t0 = time.perf_counter()
    out = run(prices, cols)
    jax.block_until_ready(out)
    print(f"compiled+ran in {time.perf_counter() - t0:.1f}s (expected: "
          "seconds on healthy backends; multi-minute blowup here)")


def lane_gather():
    import jax
    import jax.numpy as jnp

    n = 8192
    x = jnp.zeros((128, n), jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, n, size=n), jnp.int32
    )

    @jax.jit
    def run(x, ids):
        return x[:, ids]  # gather along the minor (lane) axis

    t0 = time.perf_counter()
    out = run(x, ids)
    jax.block_until_ready(out)
    print(f"compiled+ran in {time.perf_counter() - t0:.1f}s (expected: "
          "seconds; the transposed row gather x_t[ids] is fine)")


def prefix_scan():
    import jax
    import jax.numpy as jnp

    n = 200_000
    x = jnp.ones(n, jnp.int32)

    @jax.jit
    def run(x):
        return jnp.cumsum(x)

    t0 = time.perf_counter()
    out = run(x)
    jax.block_until_ready(out)
    print(f"compiled+ran in {time.perf_counter() - t0:.1f}s (expected: "
          "seconds; explodes from n ~ 1e5 on this backend)")


def early_sync():
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).random((4096, 4096), np.float32))

    @jax.jit
    def heavy(x):
        for _ in range(8):
            x = x @ x / jnp.float32(4096.0)
        return x

    heavy(x).block_until_ready()  # warm

    t0 = time.perf_counter()
    y = heavy(x)
    jax.block_until_ready(y)
    t_sync = time.perf_counter() - t0

    t0 = time.perf_counter()
    y = heavy(x)
    _ = float(np.asarray(y[0, 0]))  # value readback forces completion
    t_read = time.perf_counter() - t0

    print(f"block_until_ready: {t_sync * 1e3:.2f} ms, "
          f"value readback: {t_read * 1e3:.2f} ms")
    print("bug present if the first number is ~0 while the second is "
          "many ms (block_until_ready returned before execution)")


if __name__ == "__main__":
    cases = {f.__name__: f for f in
             (while_gather, lane_gather, prefix_scan, early_sync)}
    if len(sys.argv) != 2 or sys.argv[1] not in cases:
        print(__doc__)
        sys.exit(2)
    cases[sys.argv[1]]()
