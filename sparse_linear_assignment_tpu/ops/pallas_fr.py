"""Pallas TPU kernel: multi-round fused forward-reverse auction.

The XLA forward-reverse round (``ops/fr_dense.py``) costs ~15 HBM
traversals of the ``[M, N]`` value matrix per round; at 512×256×256
that is ~2.7 ms/round, and the round count (not the kernel) stops being
the bottleneck.  This kernel runs **R rounds per grid step** with the
whole instance resident in VMEM (256×256 f32 = 256 KB ≪ 16 MB): HBM
reads the values once per R rounds instead of ~15 times per round, and
each round is pure VPU work on VMEM data.

Grid = one step per instance.  All per-instance state rides in four
tile-aligned arrays (flat stacked planes, same scheme as
``ops/pallas_dense.py``):

- ``vals2   [B*M, N] f32`` — sign-adjusted value matrix (read-only)
- ``prices2 [B*M, 1] f32``
- ``o2p2    [B*M, 1] i32``
- ``p2o_pad2 [B*8, N] i32`` — row 0: p2o; row 1 packs the per-instance
  scalars (lane 0 = nits, lane 1 = forward_mode, lane 2 = done)
- ``pi_pad2  [B*8, N] f32`` — row 0: person profits π; row 1 lane 0 = ε

Packing the scalars into padding rows avoids scalar-prefetch plumbing
and keeps every ref 2-D and tile-aligned (Mosaic requirements — see
docs/PERFORMANCE.md item 5).

Semantics are exactly ``fr_dense.fr_round`` with ``skip_certificate=
True`` (the no-ladder mode: start ε == target ε, full assignment is the
certificate): forward/reverse sub-round selected by the mode flag via a
real branch (`lax.cond`, so finished/inactive work is skipped, not
masked), mode flips on matching-cardinality increase, exact (π, p) dual
bookkeeping.  Equivalence is pinned by tests against the XLA rounds in
interpret mode.
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
from .fr_dense import STALL_K0, FRState

# numpy scalars: jnp constants cannot be captured by kernels on this
# backend
_INT_MAX = np.int32(UNASSIGNED)
_STALL_K0 = np.int32(STALL_K0)


def _forward_sub_v(vals, prices, pi, p2o, o2p, eps):
    """Forward sub-round; layouts vals [M,N], prices/o2p [M,1],
    pi/p2o [1,N].  Mirrors fr_dense._forward_sub (increment-form bids +
    coded won/displaced reduction — see its docstring; one fewer [M,N]
    masked-max traversal and one fewer [M,N] reduction per round)."""
    # dtype-typed scalar: a python-float -inf captured across lax.cond
    # branch jaxprs becomes an f64 binder, which Mosaic cannot lower
    neg_inf = vals.dtype.type(-np.inf)
    m, n = vals.shape
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)

    profit = vals - prices
    best = jnp.max(profit, axis=0, keepdims=True)            # [1, N]
    is_best = profit == best
    best_j = jnp.min(
        jnp.where(is_best, j_iota, jnp.int32(m)), axis=0, keepdims=True
    )
    sel = j_iota == best_j
    second = jnp.max(jnp.where(sel, neg_inf, profit), axis=0, keepdims=True)
    has_second = second != neg_inf
    floor = jnp.where(has_second, second, best)
    raw_inc = best - floor + eps

    unassigned = p2o == _INT_MAX
    bidding = unassigned & (best != neg_inf)
    inc = jnp.where(bidding, raw_inc, neg_inf)

    is_here = sel & bidding
    eff = jnp.where(is_here, inc, neg_inf)
    max_inc = jnp.max(eff, axis=1, keepdims=True)             # [M, 1]
    has_winner = max_inc != neg_inf
    cand = jnp.where(is_here & (eff >= max_inc), u_iota, _INT_MAX)
    winner = jnp.min(cand, axis=1, keepdims=True)             # [M, 1]

    prices_new = jnp.where(has_winner, prices + max_inc, prices)
    o2p_new = jnp.where(has_winner, winner, o2p)

    # won (bit 0) and displaced (bit 1) in one coded f32 reduction
    t_won = is_here & (winner == u_iota)
    t_disp = (p2o == j_iota) & has_winner
    code = jnp.sum(
        t_won.astype(jnp.float32)
        + jnp.float32(2.0) * t_disp.astype(jnp.float32),
        axis=0, keepdims=True,
    )                                                         # [1, N]
    won = (code == jnp.float32(1.0)) | (code == jnp.float32(3.0))
    displaced = (p2o != _INT_MAX) & (code >= jnp.float32(2.0))
    p2o_new = jnp.where(won, best_j, jnp.where(displaced, _INT_MAX, p2o))
    pi_new = jnp.where(won, floor - eps, pi)
    return prices_new, pi_new, p2o_new, o2p_new


def _reverse_sub_v(vals, prices, pi, p2o, o2p, eps):
    """Reverse sub-round (free objects cut their price to bid for
    persons); mirrors fr_dense._reverse_sub (increment form + coded
    won/freed reduction)."""
    neg_inf = vals.dtype.type(-np.inf)
    m, n = vals.shape
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)

    rprof = vals - pi                                         # [M, N]
    beta = jnp.max(rprof, axis=1, keepdims=True)              # [M, 1]
    is_beta = rprof == beta
    best_i = jnp.min(
        jnp.where(is_beta, u_iota, jnp.int32(n)), axis=1, keepdims=True
    )
    rsel = u_iota == best_i
    gamma = jnp.max(jnp.where(rsel, neg_inf, rprof), axis=1, keepdims=True)
    has_gamma = gamma != neg_inf
    rfloor = jnp.where(has_gamma, gamma, beta)
    pi_inc = beta - rfloor + eps

    free_obj = o2p == _INT_MAX
    bidding = free_obj & (beta != neg_inf)
    rinc = jnp.where(bidding, pi_inc, neg_inf)

    is_here = rsel & bidding
    eff = jnp.where(is_here, rinc, neg_inf)
    max_inc = jnp.max(eff, axis=0, keepdims=True)             # [1, N]
    has_rw = max_inc != neg_inf
    cand = jnp.where(is_here & (eff >= max_inc), j_iota, _INT_MAX)
    winner_obj = jnp.min(cand, axis=0, keepdims=True)         # [1, N]

    # won_obj (bit 0) and freed (bit 1) in one coded f32 reduction
    t_won = is_here & (winner_obj == j_iota)
    is_disp = has_rw & (p2o != _INT_MAX)                      # [1, N]
    t_freed = (p2o == j_iota) & is_disp
    code = jnp.sum(
        t_won.astype(jnp.float32)
        + jnp.float32(2.0) * t_freed.astype(jnp.float32),
        axis=1, keepdims=True,
    )                                                         # [M, 1]
    won_obj = (code == jnp.float32(1.0)) | (code == jnp.float32(3.0))
    freed = code >= jnp.float32(2.0)
    prices_new = jnp.where(won_obj, rfloor - eps, prices)
    pi_new = jnp.where(has_rw, pi + max_inc, pi)
    o2p_new = jnp.where(won_obj, best_i, jnp.where(freed, _INT_MAX, o2p))
    p2o_new = jnp.where(has_rw, winner_obj, p2o)
    return prices_new, pi_new, p2o_new, o2p_new


def _fr_kernel(
    vals_ref,       # [M, N] VMEM
    prices_ref,     # [M, 1]
    p2o_pad_ref,    # [8, N] i32 (row 0 p2o; row 1 = nits/mode/done)
    o2p_ref,        # [M, 1]
    pi_pad_ref,     # [8, N] f32 (row 0 pi; row 1 lane 0 = eps)
    prices_out,
    p2o_pad_out,
    o2p_out,
    pi_pad_out,
    *,
    rounds: int,
):
    vals = vals_ref[:]
    n = vals.shape[1]
    eps = pi_pad_ref[1, 0]
    nits0 = p2o_pad_ref[1, 0]
    mode0 = p2o_pad_ref[1, 1] != 0
    done0 = p2o_pad_ref[1, 2] != 0
    since0 = p2o_pad_ref[1, 3]
    stall_k0 = p2o_pad_ref[1, 4]

    carry = (
        prices_ref[:],
        pi_pad_ref[0:1, :],
        p2o_pad_ref[0:1, :],
        o2p_ref[:],
        mode0,
        done0,
        nits0,
        since0,
        stall_k0,
    )

    def body(carry):
        i, prices, pi, p2o, o2p, mode, done, nits, since, stall_k = carry
        # f32 cardinality count: integer jnp.sum/lax.reduce both pull
        # in int64 paths under x64, which Mosaic cannot lower; f32 sums
        # are exact far beyond any supported N
        card_old = jnp.sum((p2o != _INT_MAX).astype(jnp.float32))
        operand = (prices, pi, p2o, o2p)

        prices, pi, p2o, o2p = lax.cond(
            mode,
            lambda o: _forward_sub_v(vals, *o, eps),
            lambda o: _reverse_sub_v(vals, *o, eps),
            operand,
        )
        card_new = jnp.sum((p2o != _INT_MAX).astype(jnp.float32))
        increased = card_new > card_old
        # stalled-phase preemption with doubling horizon (fr_dense)
        stall_flip = ~increased & (since + 1 >= stall_k) & ~done
        mode = mode ^ ((increased | stall_flip) & ~done)
        since = jnp.where(increased | stall_flip, jnp.int32(0), since + 1)
        stall_k = jnp.where(
            increased,
            jnp.int32(_STALL_K0),
            jnp.where(stall_flip, stall_k * 2, stall_k),
        )
        nits = nits + (~done).astype(jnp.int32)
        done = done | (card_new == jnp.float32(n))
        return (
            i + jnp.int32(1),
            prices, pi, p2o, o2p, mode, done, nits, since, stall_k,
        )

    def keep_going(carry):
        i = carry[0]
        done = carry[6]
        return (i < jnp.int32(rounds)) & ~done

    # EARLY EXIT: a while_loop (not fori) so a finished instance leaves
    # its grid step immediately instead of spinning no-op rounds for the
    # rest of the budget (the done-check was a per-round lax.cond before;
    # exiting is strictly cheaper and state-identical, since done rounds
    # were no-ops).  int32 induction/bounds: python-int or i64 loop
    # carries cannot be lowered by Mosaic under jax_enable_x64.
    (_, prices, pi, p2o, o2p, mode, done, nits, since, stall_k) = (
        lax.while_loop(keep_going, body, (jnp.int32(0),) + carry)
    )

    prices_out[:] = prices
    o2p_out[:] = o2p
    lane = lax.broadcasted_iota(jnp.int32, (1, p2o.shape[1]), 1)
    meta = jnp.where(
        lane == 0,
        nits,
        jnp.where(
            lane == 1,
            mode.astype(jnp.int32),
            jnp.where(
                lane == 2,
                done.astype(jnp.int32),
                jnp.where(
                    lane == 3, since,
                    jnp.where(lane == 4, stall_k, jnp.int32(0)),
                ),
            ),
        ),
    )
    p2o_pad_out[0:1, :] = p2o
    p2o_pad_out[1:2, :] = meta
    p2o_pad_out[2:8, :] = jnp.zeros((6, p2o.shape[1]), jnp.int32)
    pi_pad_out[0:1, :] = pi
    pi_pad_out[1:2, :] = jnp.full((1, pi.shape[1]), eps, pi.dtype)
    pi_pad_out[2:8, :] = jnp.zeros((6, pi.shape[1]), pi.dtype)


def fr_rounds_pallas_flat(
    vals2, prices2, p2o_pad2, o2p2, pi_pad2, b, m, n,
    rounds: int, interpret: bool = False,
):
    """Run ``rounds`` forward-reverse rounds on every instance; flat
    stacked layouts as in the module docstring."""
    dtype = vals2.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((m, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(_fr_kernel, rounds=rounds),
        grid_spec=grid_spec,
        # the 16 MB scoped-VMEM cap is a compiler default, not the
        # hardware limit (v5e has 128 MB); raising it lets the
        # VMEM-resident kernel cover instances past 896² (the in-kernel
        # early exit pushed 896² to 16.12 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * m, 1), dtype),
            jax.ShapeDtypeStruct((b * 8, n), jnp.int32),
            jax.ShapeDtypeStruct((b * m, 1), jnp.int32),
            jax.ShapeDtypeStruct((b * 8, n), dtype),
        ),
        interpret=interpret,
    )(vals2, prices2, p2o_pad2, o2p2, pi_pad2)


@functools.partial(jax.jit, static_argnames=("rounds", "interpret"))
def fr_chunk_pallas(
    values_t, states: FRState, rounds: int, interpret: bool = False
):
    """``rounds`` fused rounds over a batched FRState (packing to and
    from the kernel's flat layouts happens here, once per chunk).

    Only valid in the no-ladder mode (start ε == target ε): the kernel
    performs no ε-scaling bookkeeping.  ``eps``/``nreductions`` pass
    through; ``optimal_found`` mirrors ``done`` (in this mode a full
    assignment is ε-optimal by construction)."""
    b, m, n = values_t.shape
    dtype = values_t.dtype
    vals2 = values_t.reshape(b * m, n)
    prices2 = states.prices.reshape(b * m, 1)
    o2p2 = states.o2p.reshape(b * m, 1)
    p2o_pad = jnp.zeros((b, 8, n), jnp.int32)
    p2o_pad = p2o_pad.at[:, 0, :].set(states.p2o)
    p2o_pad = p2o_pad.at[:, 1, 0].set(states.nits)
    p2o_pad = p2o_pad.at[:, 1, 1].set(states.forward_mode.astype(jnp.int32))
    p2o_pad = p2o_pad.at[:, 1, 2].set(states.done.astype(jnp.int32))
    p2o_pad = p2o_pad.at[:, 1, 3].set(states.since_inc)
    p2o_pad = p2o_pad.at[:, 1, 4].set(states.stall_k)
    pi_pad = jnp.zeros((b, 8, n), dtype)
    pi_pad = pi_pad.at[:, 0, :].set(states.profits)
    pi_pad = pi_pad.at[:, 1, 0].set(states.eps)

    prices2, p2o_pad2, o2p2, pi_pad2 = fr_rounds_pallas_flat(
        vals2, prices2, p2o_pad.reshape(b * 8, n), o2p2,
        pi_pad.reshape(b * 8, n), b, m, n, rounds, interpret=interpret,
    )
    p2o_pad = p2o_pad2.reshape(b, 8, n)
    pi_pad = pi_pad2.reshape(b, 8, n)
    done = p2o_pad[:, 1, 2] != 0
    new_states = FRState(
        prices=prices2.reshape(b, m),
        profits=pi_pad[:, 0, :],
        p2o=p2o_pad[:, 0, :],
        o2p=o2p2.reshape(b, m),
        eps=states.eps,
        forward_mode=p2o_pad[:, 1, 1] != 0,
        since_inc=p2o_pad[:, 1, 3],
        stall_k=p2o_pad[:, 1, 4],
        nits=p2o_pad[:, 1, 0],
        nreductions=states.nreductions,
        optimal_found=states.optimal_found | done,
        done=done,
    )
    return new_states, jnp.all(done)
