"""Price the war-round row-sparse idea: is a reduction over 8 gathered
rows materially cheaper than over all S rows?

The fused kernel's per-round cost (~0.665 us int mode) is ~4 reduction
trees.  In endgame war rounds only 1-2 persons/objects are free, yet
every tree traverses the full [S, S] tile set.  If a [8, S] -> [8, 1]
packed max (the few-free-rows form; rows pre-gathered via dynamic
sublane slices) costs much less than the [S, S] -> [S, 1] form, a
dual-mode round pays; if the tree is latency-bound rather than
traversal-bound, it does not.

Measures three loop kernels at S=256, 4096 iterations:
  A: [S, S] -> [S, 1] packed max (the current tree)
  B: [8, S] -> [8, 1] packed max on a fixed row block
  C: 8 dynamic-slice row gathers + [8, S] -> [8, 1] max (war-round
     form including the gather cost)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 256
ITERS = 4096  # overridden per run: cost = slope between two counts


def _mk(variant, iters):
    # dependency rides a VECTOR carry ([rows, 1] maxes feed the next
    # round's adds) — a scalar carry forces vector->SREG moves that
    # swamp the tree by ~10x (first probe run, recorded)
    def kernel(vals_ref, idx_ref, out_ref):
        rows = 8 if variant in ("B", "C") else S

        def body(i, acc):
            if variant == "A":
                x = vals_ref[...] + acc
            elif variant == "B":
                x = vals_ref[0:8, :] + acc
            else:  # C: dynamic row gathers then the small tree
                got = [
                    vals_ref[pl.ds(idx_ref[0, k] + (i & 0), 1), :]
                    for k in range(8)
                ]
                x = jnp.concatenate(got, axis=0) + acc
            return jnp.max(x, axis=1, keepdims=True) - jnp.int32(1)

        acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(iters), body,
            jnp.zeros((rows, 1), jnp.int32),
        )
        out_ref[...] = acc[0:1, 0:1]

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "iters"))
def run(vals, idx, variant, iters):
    return pl.pallas_call(
        _mk(variant, iters),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((S, S), lambda i: (0, 0)),
            pl.BlockSpec((1, 8), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(vals, idx)


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1 << 20, size=(S, S)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, S, size=(1, 8)), jnp.int32)
    lo, hi = 8192, 131072
    for variant in ("A", "B", "C"):
        times = {}
        for iters in (lo, hi):
            out = run(vals, idx, variant, iters)
            float(np.asarray(out)[0, 0])  # compile+sync
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                out = run(vals, idx, variant, iters)
                float(np.asarray(out)[0, 0])
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            times[iters] = best
        marg = (times[hi] - times[lo]) / (hi - lo)
        print(f"variant {variant}: marginal {marg * 1e9:.1f} ns/tree "
              f"(lo {times[lo]*1e3:.1f} ms, hi {times[hi]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
