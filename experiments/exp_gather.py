"""Microbenchmark: in-kernel tile-bucketed gather vs XLA gather.

The sparse auction round's cost is dominated by prices[cols] (~8 ns/elem
serialized in XLA).  Mosaic's take_along_axis lowers to
tpu.dynamic_gather, which works within one 128-lane tile with table
shape == index shape.  If arcs are bucketed by price-tile (col // 128)
host-side, the in-kernel gather per tile is: broadcast the tile's
prices [1,128] -> [G,128], take_along_axis with local idx [G,128].
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(prices_ref, idx_ref, out_ref):
    # prices_ref [8, 128] (row 0 live), idx_ref/out_ref [G, 128]
    table = prices_ref[0:1, :]                          # [1, 128]
    g = idx_ref.shape[0]
    table_b = jnp.broadcast_to(table, (g, 128))
    out_ref[:] = jnp.take_along_axis(table_b, idx_ref[:], axis=1)


@functools.partial(jax.jit, static_argnames=("t", "g"))
def tiled_gather(prices2, idx2, t: int, g: int):
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((t * g, 128), jnp.float32),
    )(prices2, idx2)


@jax.jit
def xla_gather(prices, cols):
    return prices[cols]


def main():
    import sys
    m = 100_096  # ~1e5 objects, multiple of 128
    t = m // 128
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    prices = rng.random(m).astype(np.float32)
    prices2 = np.zeros((t * 8, 128), np.float32)
    prices2.reshape(t, 8, 128)[:, 0, :] = prices.reshape(t, 128)
    idx2 = rng.integers(0, 128, size=(t * g, 128)).astype(np.int32)

    p2_d = jnp.asarray(prices2)
    i2_d = jnp.asarray(idx2)
    try:
        out = tiled_gather(p2_d, i2_d, t, g)
        jax.block_until_ready(out)
    except Exception as e:
        print("KERNEL FAILED:", type(e).__name__, str(e)[:400], flush=True)
        return
    # correctness
    want = prices.reshape(t, 128)[
        np.repeat(np.arange(t), g)[:, None], idx2
    ]
    np.testing.assert_allclose(np.asarray(out), want)
    print("tiled gather correct", flush=True)

    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(tiled_gather(p2_d, i2_d, t, g))
        dt = time.perf_counter() - t0
    nel = t * g * 128
    print(f"tiled in-kernel gather: {dt*1e3:.2f} ms for {nel} elems "
          f"({dt/nel*1e9:.3f} ns/elem)", flush=True)

    # XLA reference gather, same element count
    cols = rng.integers(0, m, size=nel).astype(np.int32)
    cols_d = jnp.asarray(cols)
    prices_d = jnp.asarray(prices)
    jax.block_until_ready(xla_gather(prices_d, cols_d))
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(xla_gather(prices_d, cols_d))
        dt = time.perf_counter() - t0
    print(f"XLA gather: {dt*1e3:.2f} ms ({dt/nel*1e9:.3f} ns/elem)",
          flush=True)


if __name__ == "__main__":
    main()
