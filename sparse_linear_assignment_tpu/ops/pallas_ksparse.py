"""Pallas TPU kernel: multi-round fused batched-sparse Khosla auction.

The batched sparse mode (the reference's own k-regular domain,
`/root/reference/src/ksparse.rs:9-19`, batched) runs densified
instances through the vmapped XLA dense rounds; the round-5 hardware
sweep (experiments/exp_batch_sparse.py) measured that path ~6 HBM
traversals of the ``[M', N]`` plane per round with a fixed 16-round
chunk against a p50 round count of 3 — most of the wall clock was
wasted traversals plus per-call overhead.  This kernel applies the
same treatment that took the dense batched mode from 57 to 7.5k
inst/s (``ops/pallas_fr.py``): the whole densified instance resident
in VMEM, **all rounds in one grid step**, and a per-instance
``while_loop`` early exit so an instance converged after 3 rounds
costs 3 rounds — not the chunk budget.

Differences from the FR kernel, driven by the problem shape:

- **Forward-only Khosla** (choice rule `ksparse.rs:199-214`, price
  update `:223-227`, drop rule `:181,218-220`): with ``m = 4-8n``
  objects per person the Jacobi auction converges in a handful of
  rounds and the reverse mode has nothing to bid (most objects stay
  unassigned), so there is no mode machinery at all.
- **Person-major ``[N, M]`` orientation** (persons on sublanes,
  objects on lanes): the per-person top-2 is one fused lane-halving
  chain (``_top2_lanes``), conflict resolution is two sublane trees,
  and the rectangular plane needs no transpose anywhere — the staged
  ``[B, N, M]`` input is the natural orientation.

Flat stacked layouts (Mosaic wants 2-D tile-aligned refs):

- ``vals2   [B*N, M] f32`` — densified sign-adjusted values, −inf at
  non-arcs (read-only)
- ``p2o2    [B*N, 1] i32`` — assignment (local column space)
- ``drop2   [B*N, 1] i32`` — dropped flags
- ``prices2 [B*8, M] f32`` — row 0: prices; row 1 lane 0: threshold;
  row 2 lane 0: eps
- ``meta2   [B*8, 128] i32`` — row 0: lane 0 nits, lane 1 done

``o2p`` is deliberately absent: the dense Khosla round only ever
*writes* it (displacement is detected from ``p2o`` + ``has_winner``),
and the host reconstructs it from the final ``p2o`` — one fewer
``[M]`` plane per instance.

Shape requirements: ``N % 8 == 0``, ``M % 128 == 0`` (the densifier
pads the compacted object axis to the lane tile for this path),
``N * M`` f32 within VMEM.  Ineligible shapes fall back to the XLA
chunk path in ``batch.py``.  Equivalence with the XLA rounds is pinned
by interpret-mode tests (tests/test_batch.py).
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
from ..utils.trace import trace_kernel_round
from .pallas_fr import _top2_lanes

_INT_MAX = np.int32(UNASSIGNED)


def _ksp_kernel(
    vals_ref,     # [N, M] VMEM
    p2o_ref,      # [N, 1] i32
    drop_ref,     # [N, 1] i32
    prices_ref,   # [8, M] f32 (row 0 prices; [1,0] threshold; [2,0] eps)
    meta_ref,     # [8, 128] i32 ([0,0] nits; [0,1] done)
    p2o_out,
    drop_out,
    prices_out,
    meta_out,
    *,
    rounds: int,
):
    n, m = vals_ref.shape
    dtype = vals_ref.dtype
    neg_inf = dtype.type(-np.inf)
    vals = vals_ref[...]
    threshold = prices_ref[1, 0]
    eps = prices_ref[2, 0]

    lane_iota = lax.broadcasted_iota(jnp.int32, (n, m), 1)
    person_iota = lax.broadcasted_iota(jnp.int32, (n, m), 0)

    p2o0 = p2o_ref[...]
    drop0 = drop_ref[...]
    prices0 = prices_ref[0:1, :]
    nits0 = meta_ref[0, 0]
    done0 = meta_ref[0, 1] != 0

    def body(c):
        i, p2o, drop, prices, nits, done = c
        profit = vals - prices  # [N, M]; -inf at non-arcs
        best, argj, second = _top2_lanes(profit, lane_iota, neg_inf)
        sel = lane_iota == argj
        best_val = jnp.max(
            jnp.where(sel, vals, neg_inf), axis=1, keepdims=True
        )
        active = (p2o == _INT_MAX) & (drop == 0)
        # price of the best object, reconstructed algebraically (same
        # formula as the XLA dense path's _price_at_best — no gather)
        price_at_best = best_val - best
        drop_now = active & (price_at_best > threshold)
        bidder = active & ~drop_now
        has_second = second != neg_inf
        bid = jnp.where(has_second, best_val - second, price_at_best) + eps

        is_here = sel & bidder
        eff = jnp.where(is_here, bid, neg_inf)  # [N, M]
        max_bid = jnp.max(eff, axis=0, keepdims=True)  # [1, M]
        has_winner = max_bid != neg_inf
        cand = jnp.where(
            is_here & (eff >= max_bid), person_iota, _INT_MAX
        )
        winner = jnp.min(cand, axis=0, keepdims=True)  # [1, M]
        prices2 = jnp.where(has_winner, max_bid, prices)

        # won (code 1) and displaced (code 2) in one coded lane
        # reduction; disjoint per person (winning requires being
        # unassigned), so max recovers both bits
        t_won = is_here & (winner == person_iota)
        t_disp = (lane_iota == p2o) & has_winner
        code = jnp.max(
            jnp.where(t_won, jnp.int32(1), jnp.int32(0))
            + jnp.where(t_disp, jnp.int32(2), jnp.int32(0)),
            axis=1, keepdims=True,
        )  # [N, 1]
        won = code == jnp.int32(1)
        displaced = (p2o != _INT_MAX) & (code == jnp.int32(2))
        p2o2 = jnp.where(won, argj, jnp.where(displaced, _INT_MAX, p2o))
        drop2 = drop | drop_now.astype(jnp.int32)

        # freeze finished instances (bit-exact with exiting early; the
        # while cond already gates, this guards the last wrap)
        p2o2 = jnp.where(done, p2o, p2o2)
        drop2 = jnp.where(done, drop, drop2)
        prices2 = jnp.where(done, prices, prices2)

        active2 = (p2o2 == _INT_MAX) & (drop2 == 0)
        nact = jnp.max(active2.astype(jnp.int32))
        nits2 = nits + (~done).astype(jnp.int32)
        done2 = done | (nact == 0)
        trace_kernel_round(
            "ksp kernel round: nits={} active={} done={}",
            nits2, nact, done2.astype(jnp.int32),
        )
        return i + jnp.int32(1), p2o2, drop2, prices2, nits2, done2

    def cond(c):
        i = c[0]
        done = c[5]
        return (i < jnp.int32(rounds)) & ~done

    final = lax.while_loop(
        cond, body, (jnp.int32(0), p2o0, drop0, prices0, nits0, done0)
    )
    _i, p2o_f, drop_f, prices_f, nits_f, done_f = final

    p2o_out[...] = p2o_f
    drop_out[...] = drop_f
    prices_out[0:1, :] = prices_f
    lane128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    meta_out[0:1, :] = jnp.where(
        lane128 == 0, nits_f,
        jnp.where(lane128 == 1, done_f.astype(jnp.int32), jnp.int32(0)),
    )


def ksp_rounds_pallas_flat(
    vals2, p2o2, drop2, prices2, meta2, b, n, m,
    rounds: int, interpret: bool = False,
):
    """Run up to ``rounds`` Khosla rounds on every instance (early exit
    per instance); flat stacked layouts per the module docstring."""
    if n % 8 or m % 128:
        raise ValueError(f"kernel needs N%8==0 and M%128==0, got {n}x{m}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((n, m), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dtype = vals2.dtype
    return pl.pallas_call(
        functools.partial(_ksp_kernel, rounds=rounds),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * n, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * 8, m), dtype),
            jax.ShapeDtypeStruct((b * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(vals2, p2o2, drop2, prices2, meta2)


@functools.partial(
    jax.jit, static_argnames=("rounds", "interpret")
)
def ksp_chunk_pallas(
    values_nm, states, eps, thresholds, rounds: int,
    interpret: bool = False,
):
    """Up to ``rounds`` fused Khosla rounds over a batched KhoslaState
    on the densified ``[B, N, M]`` person-major plane (packing to and
    from the kernel's flat layouts happens here, once per chunk).

    ``states.o2p`` passes through UNCHANGED (the dense Khosla round
    only ever writes o2p; displacement detection runs off p2o — the
    host reconstructs o2p from the final p2o, `solution.o2p_from_p2o`).
    """
    from .auction import KhoslaState

    b, n, m = values_nm.shape
    dtype = values_nm.dtype
    vals2 = values_nm.reshape(b * n, m)
    p2o2 = states.p2o.reshape(b * n, 1)
    drop2 = states.dropped.astype(jnp.int32).reshape(b * n, 1)
    prices_pad = jnp.zeros((b, 8, m), dtype)
    prices_pad = prices_pad.at[:, 0, :].set(states.prices)
    prices_pad = prices_pad.at[:, 1, 0].set(thresholds.astype(dtype))
    prices_pad = prices_pad.at[:, 2, 0].set(
        jnp.full((b,), eps, dtype)
    )
    active0 = (states.p2o == _INT_MAX) & ~states.dropped
    done0 = ~jnp.any(active0, axis=1)
    meta = jnp.zeros((b, 8, 128), jnp.int32)
    meta = meta.at[:, 0, 0].set(states.nits)
    meta = meta.at[:, 0, 1].set(done0.astype(jnp.int32))

    p2o_f, drop_f, prices_f, meta_f = ksp_rounds_pallas_flat(
        vals2, p2o2, drop2, prices_pad.reshape(b * 8, m),
        meta.reshape(b * 8, 128), b, n, m, rounds, interpret=interpret,
    )
    return KhoslaState(
        prices=prices_f.reshape(b, 8, m)[:, 0, :],
        p2o=p2o_f.reshape(b, n),
        o2p=states.o2p,
        dropped=drop_f.reshape(b, n) != 0,
        nits=meta_f.reshape(b, 8, 128)[:, 0, 0],
    )
