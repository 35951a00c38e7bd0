"""Pallas TPU kernel: fused dense auction round.

One auction round on a dense instance touches the ``[M, N]`` value matrix
several times (profit, top-2 selection, conflict membership, winner
recovery, displacement checks).  Compiled as separate XLA ops those are
~6 HBM passes; this kernel keeps the whole tile resident in VMEM
(256x256 f32 = 256 KB ≪ 16 MB) and performs the entire round — bidding
(`ksparse.rs:199-214` choice rule), conflict resolution with the
deterministic smallest-person tie-break, assignment, and the ε-CS
margins needed by the forward solver's scaling logic — in a single pass
over HBM.

Layout: persons on the lane axis (``[1, N]`` vectors), objects on the
sublane axis (``[M, 1]`` vectors), so every broadcast in the round is a
natural lane/sublane broadcast with no transposes.

Used by the batched solver (`batch.py`) for instances whose dimensions
are TPU-tile aligned; the XLA path remains as fallback for other shapes
(and as the CPU/interpret reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solution import UNASSIGNED

# numpy scalar: jnp array constants cannot be captured by kernels, and a
# bare python int at INT32_MAX trips dtype-promotion recursion on this
# backend
_INT_MAX = np.int32(UNASSIGNED)


def _round_math(vals, prices, p2o, o2p, eps, not_done):
    """The full auction round on VMEM-resident values; shapes
    vals [M, N], prices/o2p [M, 1], p2o [1, N]."""
    neg_inf = -jnp.inf
    m, n = vals.shape

    profit = vals - prices                  # [M, N]

    # ---- bidding: per-person top-2 profit over objects (sublane axis) --
    best = jnp.max(profit, axis=0, keepdims=True)      # [1, N]
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    is_best = profit == best
    best_j = jnp.min(
        jnp.where(is_best, j_iota, jnp.int32(m)), axis=0, keepdims=True
    )                                                   # [1, N]
    sel = j_iota == best_j
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0, keepdims=True)
    best_val = jnp.max(jnp.where(sel, vals, neg_inf), axis=0, keepdims=True)

    unassigned = (p2o == _INT_MAX) & not_done         # [1, N]
    has_second = second != neg_inf
    price_at_best = best_val - best  # algebraic price reconstruction
    raw_bid = jnp.where(
        has_second, best_val - second + eps, price_at_best + eps
    )
    bid = jnp.where(unassigned & (best != neg_inf), raw_bid, neg_inf)

    # ---- conflict: per-object max bid, smallest-person tie-break ----
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    is_here = (best_j == j_iota) & (bid != neg_inf)     # [M, N]
    eff = jnp.where(is_here, bid, neg_inf)
    max_bid = jnp.max(eff, axis=1, keepdims=True)       # [M, 1]
    has_winner = max_bid != neg_inf
    cand = jnp.where(is_here & (eff >= max_bid), u_iota, _INT_MAX)
    winner = jnp.min(cand, axis=1, keepdims=True)       # [M, 1]

    prices_new = jnp.where(has_winner, max_bid, prices)
    o2p_new = jnp.where(has_winner, winner, o2p)

    won = jnp.max(
        (is_here & (winner == u_iota)).astype(jnp.int32),
        axis=0, keepdims=True,
    ) > 0                                               # [1, N]
    assigned = p2o != _INT_MAX
    displaced = assigned & (
        jnp.max(
            ((p2o == j_iota) & has_winner).astype(jnp.int32),
            axis=0, keepdims=True,
        ) > 0
    )
    p2o_new = jnp.where(won, best_j, jnp.where(displaced, _INT_MAX, p2o))

    # ---- ε-CS margins of the updated state (for the scaling logic) ----
    profit2 = vals - prices_new
    maxp = jnp.max(profit2, axis=0, keepdims=True)
    is_chosen = p2o_new == j_iota
    chosen = jnp.max(
        jnp.where(is_chosen, profit2, neg_inf), axis=0, keepdims=True
    )

    return prices_new, p2o_new, o2p_new, chosen, maxp


def _round_kernel(
    eps_ref,        # [1, 1] SMEM
    done_ref,       # [1, 1] SMEM (int32: 1 = instance finished)
    vals_ref,       # [M, N] VMEM — transposed cost matrix (profit values)
    prices_ref,     # [M, 1]
    p2o_ref,        # [1, N]
    o2p_ref,        # [M, 1]
    prices_out,     # [M, 1]
    p2o_out,        # [1, N]
    o2p_out,        # [M, 1]
    chosen_out,     # [1, N] ε-CS margin: chosen profit per person
    maxp_out,       # [1, N] ε-CS margin: max profit per person
):
    prices_new, p2o_new, o2p_new, chosen, maxp = _round_math(
        vals_ref[:], prices_ref[:], p2o_ref[:], o2p_ref[:],
        eps_ref[0, 0], done_ref[0, 0] == 0,
    )
    prices_out[:] = prices_new
    p2o_out[:] = p2o_new
    o2p_out[:] = o2p_new
    chosen_out[:] = chosen
    maxp_out[:] = maxp


def _batch_round_kernel(
    eps_ref,        # [B] scalar-prefetch
    done_ref,       # [B] scalar-prefetch (int32)
    vals_ref,       # [1, M, N]
    prices_ref,     # [1, M, 1]
    p2o_ref,        # [1, 1, N]
    o2p_ref,        # [1, M, 1]
    prices_out,
    p2o_out,
    o2p_out,
    chosen_out,
    maxp_out,
):
    """Grid-over-batch variant: one grid step = one instance's round.
    Batched arrays are stacked 2-D planes ([B*M, N] etc.); person-sized
    [1, N] vectors are padded to 8 sublanes (row 0 live) to satisfy TPU
    tiling."""
    i = pl.program_id(0)
    prices_new, p2o_new, o2p_new, chosen, maxp = _round_math(
        vals_ref[:], prices_ref[:], p2o_ref[0:1, :], o2p_ref[:],
        eps_ref[i], done_ref[i] == 0,
    )
    prices_out[:] = prices_new
    p2o_out[0:1, :] = p2o_new
    o2p_out[:] = o2p_new
    chosen_out[0:1, :] = chosen
    maxp_out[0:1, :] = maxp


def fused_dense_round_batch_flat(
    vals2, prices2, p2o_pad2, o2p2, eps_b, done_b, b, m, n, interpret=False
):
    """Flat-layout batched round: ``vals2 [B*M, N]``, ``prices2/o2p2
    [B*M, 1]``, ``p2o_pad2 [B*8, N]`` (row 0 of each 8-row group live).
    Keeping this layout across a scan avoids per-round pad/reshape
    traffic.  Returns the same layouts plus chosen/maxp ``[B*8, N]``."""
    dtype = vals2.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((m, n), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, 1), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i, *_: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _batch_round_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * m, 1), dtype),
            jax.ShapeDtypeStruct((b * 8, n), jnp.int32),
            jax.ShapeDtypeStruct((b * m, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * 8, n), dtype),
            jax.ShapeDtypeStruct((b * 8, n), dtype),
        ),
        interpret=interpret,
    )(
        eps_b.astype(dtype),
        done_b.astype(jnp.int32),
        vals2, prices2, p2o_pad2, o2p2,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dense_round_batch(
    vals_b, prices_b, p2o_b, o2p_b, eps_b, done_b, interpret=False
):
    """One fused auction round for a whole batch: ``vals_b [B, M, N]``,
    ``prices_b [B, M]``, ``p2o_b [B, N]``, ``o2p_b [B, M]``,
    ``eps_b [B]``, ``done_b [B]`` (bool).  Grid over instances."""
    b, m, n = vals_b.shape
    p2o_pad = jnp.zeros((b, 8, n), jnp.int32).at[:, 0, :].set(p2o_b)
    out = fused_dense_round_batch_flat(
        vals_b.reshape(b * m, n),
        prices_b.reshape(b * m, 1),
        p2o_pad.reshape(b * 8, n),
        o2p_b.reshape(b * m, 1),
        eps_b, done_b, b, m, n, interpret=interpret,
    )
    prices_new, p2o_new, o2p_new, chosen, maxp = out
    return (
        prices_new.reshape(b, m),
        p2o_new.reshape(b, 8, n)[:, 0, :],
        o2p_new.reshape(b, m),
        chosen.reshape(b, 8, n)[:, 0, :],
        maxp.reshape(b, 8, n)[:, 0, :],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dense_round(vals_t, prices, p2o, o2p, eps, done, interpret=False):
    """One fused auction round on a single dense instance.

    ``vals_t [M, N]`` float32, ``prices [M]``, ``p2o [N]``, ``o2p [M]``,
    ``eps`` scalar, ``done`` bool scalar.  Returns
    (prices', p2o', o2p', chosen_profit, max_profit).
    Best with N % 128 == 0 and M % 8 == 0 (TPU tiling).
    """
    m, n = vals_t.shape
    eps_arr = jnp.asarray(eps, vals_t.dtype).reshape(1, 1)
    done_arr = jnp.asarray(done, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        _round_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), vals_t.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, n), vals_t.dtype),
            jax.ShapeDtypeStruct((1, n), vals_t.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        eps_arr, done_arr, vals_t,
        prices.reshape(m, 1), p2o.reshape(1, n), o2p.reshape(m, 1),
    )
    prices_new, p2o_new, o2p_new, chosen, maxp = out
    return (
        prices_new[:, 0], p2o_new[0], o2p_new[:, 0], chosen[0], maxp[0]
    )
