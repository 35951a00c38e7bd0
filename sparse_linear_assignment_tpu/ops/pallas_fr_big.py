"""Pallas TPU kernel: streaming forward-reverse auction for one large
dense instance (beyond-VMEM sizes: 1024² – 8192²).

The VMEM-resident kernel (``ops/pallas_fr.py``) requires the whole
instance plus round temporaries in scoped VMEM (≈4.3× the value-matrix
bytes — 1024² f32 already exceeds the 16 MB limit), so large single
instances previously fell back to XLA rounds, which cost ~15 HBM
traversals of the ``[M, N]`` matrix per round plus per-op dispatch
overhead (measured 1.76 ms/round at 1024², ~20× off the bandwidth
bound, losing to the native CPU engine).  This kernel keeps the value
matrix in HBM and streams it through a double-buffered VMEM block pair
once per round:

- the matrix is split into ``G = M / BM`` row blocks ``[BM, N]``;
- **pass A** streams blocks (async DMA overlapped with compute) and
  performs everything that needs values: refreshing the per-block
  per-person top-2 caches (forward) or the per-object top-2 reverse
  profit and cross-block winner merge (reverse).  Two skip layers keep
  endgame ε-war rounds at 1–2 block scans: forward re-scans only
  blocks whose prices changed (``dirty`` flags + persistent [G, N]
  top-2 caches, merged globally in [G, N]), reverse visits only blocks
  with free objects;
- **pass B** loops the blocks again with NO value reads — conflict
  resolution and ownership updates only need the pass-A reductions,
  iotas and broadcasts — and marks the blocks whose prices it writes;
- the round loop (`lax.while_loop`, in-kernel early exit on ``done``)
  and the mode/stall bookkeeping are identical to ``ops/pallas_fr.py``.

Per-object state (prices, owners, reverse floors) lives in packed
``[G, BM]`` VMEM scratch (16 KB-class instead of the 128×-padded
``[M, 1]`` column layout that would blow VMEM at M = 8192) — scratch
refs, not loop-carried values, because Mosaic only lowers *dynamic*
indexing through refs.  Block access transposes one ``[1, BM]`` row to
``[BM, 1]`` via a masked diagonal sum (pure VPU, BM² elements —
negligible against the BM·N block work).  Per-person accumulators ride
in ``[8, N]`` scratch rows; the mode split uses side-effecting
``pl.when`` branches (only value-returning conds are predication-safe
in Mosaic).

Semantics are exactly ``fr_dense.fr_round`` with ``skip_certificate=
True`` (no-ladder mode; start ε == target ε) — pinned bit-exact against
the XLA rounds by ``tests/test_fr_big.py`` in interpret mode.
Capability parity: the reference's symmetric forward auction
(`/root/reference/src/symmetric.rs:334-468`), extended with reverse
bidding; dense instances correspond to density-1 bench configs
(`/root/reference/benches/benchmark.rs:81-157`).
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
from .fr_dense import STALL_K0, FRState
from .pallas_fr import _top2_lanes, _top2_rows_f32

_INT_MAX = np.int32(UNASSIGNED)
_STALL_K0 = np.int32(STALL_K0)

# accumulator scratch rows (f32 [8, N] / i32 [8, N])
_BEST, _SECOND, _ACC_MAX, _CODE, _INC, _FLOOR = 0, 1, 2, 3, 4, 5
_BEST_J, _ACC_ARG = 0, 1


def _to_col(v_row):
    """[1, BM] -> [BM, 1] via masked diagonal sum (no gather, no MXU)."""
    bm = v_row.shape[1]
    r = lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    c = lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    z = v_row.dtype.type(0)
    full = jnp.broadcast_to(v_row, (bm, bm))
    return jnp.sum(jnp.where(r == c, full, z), axis=1, keepdims=True)


def _to_row(v_col):
    """[BM, 1] -> [1, BM] via masked diagonal sum."""
    bm = v_col.shape[0]
    r = lax.broadcasted_iota(jnp.int32, (bm, bm), 0)
    c = lax.broadcasted_iota(jnp.int32, (bm, bm), 1)
    z = v_col.dtype.type(0)
    full = jnp.broadcast_to(v_col, (bm, bm))
    return jnp.sum(jnp.where(r == c, full, z), axis=0, keepdims=True)


def _fr_big_kernel(
    vals_ref,       # [M, N] HBM (pl.ANY)
    prices_in,      # [G, BM] f32 VMEM (packed per-object prices)
    o2p_in,         # [G, BM] f32 (-1 = free)
    p2o_pad_in,     # [8, N] i32 (row 0 p2o; row 1 nits/mode/done/since/stall)
    pi_pad_in,      # [8, N] f32 (row 0 pi; row 1 lane 0 = eps)
    prices_out,
    o2p_out,
    p2o_pad_out,
    pi_pad_out,
    vbuf0,          # [BM, N] VMEM scratch (double buffer, even blocks)
    vbuf1,          # [BM, N] VMEM scratch (odd blocks)
    prices_ps,      # [G, BM] f32 scratch (live per-object prices)
    o2p_ps,         # [G, BM] f32 scratch (live owners, -1 = free)
    rfloor_ps,      # [G, BM] f32 scratch (reverse pass A -> B)
    besti_ps,       # [G, BM] f32 scratch (reverse targets, n = no bid)
    accf,           # [8, N] f32 scratch (best/second/acc_max/code/inc/floor)
    acci,           # [8, N] i32 scratch (best_j/acc_arg)
    blkb_ps,        # [G, N] f32 scratch (cached per-block best profit)
    blks_ps,        # [G, N] f32 scratch (cached per-block second)
    blkr_ps,        # [G, N] i32 scratch (cached per-block argbest, global)
    dirty_ps,       # [G, BM] f32 scratch (block price state stale?)
    aflag_ps,       # [G, 128] f32 scratch (hoisted pass-A block flags)
    bflag_ps,       # [G, 128] f32 scratch (hoisted pass-B block flags)
    sem,            # DMA semaphore pair
    *,
    rounds: int,
    bm: int,
):
    g_blocks = vals_ref.shape[0] // bm
    n = vals_ref.shape[1]
    dtype = vbuf0.dtype
    neg_inf = dtype.type(-np.inf)

    def start(g, buf, slot):
        # python-int indices become weak-i64 binders under x64 —
        # Mosaic's memref_slice requires i32 (docs/PERFORMANCE.md)
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(g * bm, bm), :], buf,
            sem.at[jnp.int32(slot)],
        ).start()

    def wait(g, buf, slot):
        pltpu.make_async_copy(
            vals_ref.at[pl.ds(g * bm, bm), :], buf,
            sem.at[jnp.int32(slot)],
        ).wait()

    eps = pi_pad_in[1, 0]
    prices_ps[:] = prices_in[:]
    o2p_ps[:] = o2p_in[:]

    # Block-skip predicates (free objects for reverse work, price-stale
    # top-2 caches for forward — in the endgame ε-war, measured: 1024²
    # spends ~450 of 611 rounds on ONE unassigned person, almost every
    # block is idle, and skipping idle blocks' DMA and compute makes
    # war rounds ~G× cheaper; skips are exact no-ops pinned by the
    # interpret-mode equivalence tests) are HOISTED to one [G, BM]
    # round-start reduce (aflag_ps) instead of per-block row sums —
    # see round_body.

    def mark_dirty(g, flag):
        def set_row():
            dirty_ps[pl.ds(g, 1), :] = jnp.ones((1, bm), jnp.float32)

        pl.when(flag)(set_row)

    # all caches stale on kernel entry (scratch does not survive calls)
    dirty_ps[:] = jnp.ones((g_blocks, bm), jnp.float32)
    p2o_init = p2o_pad_in[0:1, :]
    carry = (
        jnp.int32(0),
        pi_pad_in[0:1, :],
        p2o_init,
        p2o_pad_in[1, 1] != 0,    # forward mode
        p2o_pad_in[1, 2] != 0,    # done
        p2o_pad_in[1, 0],         # nits
        p2o_pad_in[1, 3],         # since_inc
        p2o_pad_in[1, 4],         # stall_k
        # matching cardinality, carried (one entry-time reduce instead
        # of one per round)
        jnp.sum((p2o_init != _INT_MAX).astype(jnp.float32)),
    )

    # prologue: block 0 of round 0 in flight before the loop; each
    # round's epilogue re-issues it for the next round so every wait
    # has a matching start (the post-loop wait consumes the last one)
    start(jnp.int32(0), vbuf0, 0)

    def round_body(carry):
        # cardinality is CARRIED between rounds (saves a serial [1, N]
        # reduction per round; exact — every p2o write path updates it
        # through card_new below)
        (i, pi, p2o, mode, done, nits, since, stall_k, card_old) = carry

        # ---- reset accumulators
        accf[_BEST:_BEST + 1, :] = jnp.full((1, n), neg_inf, dtype)
        accf[_SECOND:_SECOND + 1, :] = jnp.full((1, n), neg_inf, dtype)
        accf[_ACC_MAX:_ACC_MAX + 1, :] = jnp.full((1, n), neg_inf, dtype)
        accf[_CODE:_CODE + 1, :] = jnp.zeros((1, n), dtype)
        acci[_BEST_J:_BEST_J + 1, :] = jnp.full((1, n), _INT_MAX, jnp.int32)
        acci[_ACC_ARG:_ACC_ARG + 1, :] = jnp.full((1, n), _INT_MAX, jnp.int32)

        # ---- hoisted pass-A block predicates: ONE [G, BM] axis-1
        # reduce per flavor replaces 2·G narrow per-block trees per
        # round (the per-block dirty()/has_free() sums).  Exact: pass A
        # never writes o2p_ps, and fwd_a only clears a block's own
        # dirty row after its own scan, so round-start flags equal the
        # per-block reads they replace.  freef is reused by the pass-B
        # reverse flags (also not invalidated before pass B).
        dirtyf = jnp.sum(dirty_ps[:], axis=1, keepdims=True)       # [G, 1]
        freef = jnp.sum(
            (o2p_ps[:] < dtype.type(0)).astype(jnp.float32),
            axis=1, keepdims=True,
        )                                                          # [G, 1]
        aflag = jnp.where(mode, dirtyf, freef)
        aflag_ps[:, :] = jnp.broadcast_to(aflag, (g_blocks, 128))

        # ---- pass A: stream dirty value blocks (cached blocks skip
        # DMA and compute entirely — see dirty())
        def fwd_a(g, vals_blk):
            """Refresh block g's cached per-person top-2 (best, second,
            argbest-as-global-row); within-block ties keep the smallest
            row (the reference's determinism rule)."""
            r_local = lax.broadcasted_iota(jnp.int32, (bm, n), 0)
            prices_col = _to_col(prices_ps[pl.ds(g, 1), :])
            profit = vals_blk - prices_col
            # one pairwise-halving tree for (best, argbest, second)
            # instead of three serial reductions — identical values and
            # smallest-row tie rule (see ops/pallas_fr._top2_rows_f32;
            # bm is a power of two by construction)
            blk_best, blk_r, blk_second = _top2_rows_f32(
                profit, r_local, neg_inf
            )
            blkb_ps[pl.ds(g, 1), :] = blk_best
            blks_ps[pl.ds(g, 1), :] = blk_second
            blkr_ps[pl.ds(g, 1), :] = blk_r + g * jnp.int32(bm)
            dirty_ps[pl.ds(g, 1), :] = jnp.zeros((1, bm), jnp.float32)

        def fwd_merge():
            """Global top-2 from the [G, N] block caches (ties: the
            earliest block — ascending global rows — then the block's
            own min-row arg, reproducing the single-pass semantics)."""
            bb = blkb_ps[:]
            bs = blks_ps[:]
            br = blkr_ps[:]
            g_iota = lax.broadcasted_iota(jnp.int32, bb.shape, 0)
            gbest = jnp.max(bb, axis=0, keepdims=True)
            gstar = jnp.min(
                jnp.where(bb == gbest, g_iota, jnp.int32(g_blocks)),
                axis=0, keepdims=True,
            )
            sel = g_iota == gstar
            # the selected block contributes its second; every other
            # block's best is a candidate (equal maxima land here too)
            accf[_SECOND:_SECOND + 1, :] = jnp.max(
                jnp.where(sel, bs, bb), axis=0, keepdims=True
            )
            acci[_BEST_J:_BEST_J + 1, :] = jnp.min(
                jnp.where(bb == gbest, br, _INT_MAX), axis=0,
                keepdims=True,
            )
            accf[_BEST:_BEST + 1, :] = gbest

        def rev_a(g, vals_blk):
            """Block g's per-object reverse top-2 + cross-block merge of
            each person's winning object; stores the block's floors and
            targets for pass B."""
            r_local = lax.broadcasted_iota(jnp.int32, (bm, n), 0)
            u_iota = lax.broadcasted_iota(jnp.int32, (bm, n), 1)
            rprof = vals_blk - pi                               # [BM, N]
            # fused (beta, best_i, gamma): one lane-halving chain
            # instead of three serial full-width lane trees
            beta, best_i, gamma = _top2_lanes(rprof, u_iota, neg_inf)
            rsel = u_iota == best_i
            rfloor = jnp.where(gamma != neg_inf, gamma, beta)
            pi_inc = beta - rfloor + eps

            o2p_col = _to_col(o2p_ps[pl.ds(g, 1), :])
            free = o2p_col < dtype.type(0)
            bidding = free & (beta != neg_inf)
            rinc = jnp.where(bidding, pi_inc, neg_inf)          # [BM, 1]

            is_here = rsel & bidding
            eff = jnp.where(is_here, rinc, neg_inf)             # [BM, N]
            blk_max = jnp.max(eff, axis=0, keepdims=True)       # [1, N]
            r_global = r_local + g * jnp.int32(bm)
            blk_arg = jnp.min(
                jnp.where(is_here & (eff >= blk_max), r_global, _INT_MAX),
                axis=0, keepdims=True,
            )
            acc_max = accf[_ACC_MAX:_ACC_MAX + 1, :]
            acc_arg = acci[_ACC_ARG:_ACC_ARG + 1, :]
            take = blk_max > acc_max      # strict: earlier block wins ties
            acci[_ACC_ARG:_ACC_ARG + 1, :] = jnp.where(
                take, blk_arg, acc_arg
            )
            accf[_ACC_MAX:_ACC_MAX + 1, :] = jnp.maximum(acc_max, blk_max)

            rfloor_ps[pl.ds(g, 1), :] = _to_row(rfloor)
            besti_ps[pl.ds(g, 1), :] = _to_row(
                jnp.where(bidding, best_i, jnp.int32(n)).astype(dtype)
            )

        def need(g):
            """Fetch/compute predicate for pass A: forward re-scans only
            price-stale blocks (the top-2 cache covers the rest);
            reverse only blocks with free objects.  Reads the hoisted
            round-start flag (one scalar load) instead of reducing the
            block's row."""
            return aflag_ps[pl.ds(g, 1), 0:1][0, 0] > jnp.float32(0)

        def block_a(g, buf):
            nd = need(g)
            pl.when(mode & nd)(lambda: fwd_a(g, buf[:]))
            pl.when(~mode & nd)(lambda: rev_a(g, buf[:]))

        def pair_a(gg, c):
            g0 = jnp.int32(2) * gg
            g1 = g0 + jnp.int32(1)
            # Block 0's fetch is issued unconditionally by the
            # prologue/round epilogue, so its wait is unconditional too.
            # Skipped blocks skip start and wait under the SAME
            # predicate (a block's dirty flag is only cleared by its own
            # fwd_a, which runs after its wait; o2p_ps is not written
            # during pass A), keeping the semaphore protocol balanced.
            need0 = need(g0) | (g0 == 0)
            need1 = need(g1)
            pl.when(need0)(lambda: wait(g0, vbuf0, 0))
            pl.when(need1)(lambda: start(g1, vbuf1, 1))  # g1 < G always
            block_a(g0, vbuf0)
            pl.when(need1)(lambda: wait(g1, vbuf1, 1))

            def maybe_start_next():
                g2 = g1 + jnp.int32(1)
                pl.when(need(g2))(lambda: start(g2, vbuf0, 0))

            pl.when(g1 + 1 < jnp.int32(g_blocks))(maybe_start_next)
            block_a(g1, vbuf1)
            return c

        lax.fori_loop(
            jnp.int32(0), jnp.int32(g_blocks // 2), pair_a, jnp.int32(0)
        )
        pl.when(mode)(fwd_merge)

        # ---- mid-round person-side prep (forward quantities; cheap
        # lane math, computed unconditionally — unused in reverse mode)
        best = accf[_BEST:_BEST + 1, :]
        second = accf[_SECOND:_SECOND + 1, :]
        floor = jnp.where(second != neg_inf, second, best)
        bidding = (p2o == _INT_MAX) & (best != neg_inf)
        accf[_FLOOR:_FLOOR + 1, :] = floor
        accf[_INC:_INC + 1, :] = jnp.where(
            bidding, best - floor + eps, neg_inf
        )

        # ---- hoisted pass-B block predicates: one [G, N] histogram
        # reduce replaces a WIDE [1, N] sum per block per round (the
        # dominant war-round cost at large N: G serial 64-tile folds).
        # Forward: blocks holding some bidding person's best object;
        # reverse: blocks with a free object or a displaced person's
        # current object.  Exact: identical boolean per block as the
        # in-loop sums they replace (o2p_ps/p2o are not written between
        # here and each block's own pass-B visit).
        # bm is a power of two by construction (fr_big_chunk asserts)
        sh_bm = np.int32(bm.bit_length() - 1)

        def _blk_of(x):
            return lax.shift_right_logical(x, sh_bm)

        g_iota_n = lax.broadcasted_iota(jnp.int32, (g_blocks, n), 0)

        def _fwd_hist():
            inc_row = accf[_INC:_INC + 1, :]
            bj = acci[_BEST_J:_BEST_J + 1, :]
            active = inc_row != neg_inf
            return jnp.sum(
                ((_blk_of(bj) == g_iota_n) & active).astype(jnp.float32),
                axis=1, keepdims=True,
            )

        def _rev_hist():
            acc_max_row = accf[_ACC_MAX:_ACC_MAX + 1, :]
            rdisp = (acc_max_row != neg_inf) & (p2o != _INT_MAX)
            hist = jnp.sum(
                ((_blk_of(p2o) == g_iota_n) & rdisp).astype(jnp.float32),
                axis=1, keepdims=True,
            )
            return hist + freef  # free blocks always visit in reverse

        bflag = lax.cond(mode, _fwd_hist, _rev_hist)
        bflag_ps[:, :] = jnp.broadcast_to(bflag, (g_blocks, 128))

        # ---- pass B: conflict resolution + updates (no value reads)
        def fwd_b(g):
            """Increment-form conflict resolution + price/owner updates
            for block g (coded won/displaced accumulation)."""
            r_local = lax.broadcasted_iota(jnp.int32, (bm, n), 0)
            u_iota = lax.broadcasted_iota(jnp.int32, (bm, n), 1)
            inc = accf[_INC:_INC + 1, :]
            best_j = acci[_BEST_J:_BEST_J + 1, :]
            local_j = best_j - g * jnp.int32(bm)               # [1, N]
            is_here = (local_j == r_local) & (inc != neg_inf)
            eff = jnp.where(is_here, inc, neg_inf)             # [BM, N]
            # fused (max_inc, winner): one lane-halving chain instead
            # of two serial full-width lane trees.  Equivalent tie
            # rule: the old path took the min u_iota among eff ==
            # max_inc positions; the halving carries the smallest
            # index achieving the max.
            max_inc, winner, _ = _top2_lanes(
                eff, u_iota, neg_inf, want_second=False
            )
            has_winner = max_inc != neg_inf

            prices_col = _to_col(prices_ps[pl.ds(g, 1), :])
            prices_ps[pl.ds(g, 1), :] = _to_row(
                jnp.where(has_winner, prices_col + max_inc, prices_col)
            )
            o2p_col = _to_col(o2p_ps[pl.ds(g, 1), :])
            o2p_ps[pl.ds(g, 1), :] = _to_row(
                jnp.where(has_winner, winner.astype(dtype), o2p_col)
            )
            mark_dirty(
                g, jnp.sum(has_winner.astype(jnp.float32)) > jnp.float32(0)
            )

            t_won = is_here & (winner == u_iota)
            r_global = r_local + g * jnp.int32(bm)
            t_disp = (p2o == r_global) & has_winner
            accf[_CODE:_CODE + 1, :] = accf[_CODE:_CODE + 1, :] + jnp.sum(
                t_won.astype(dtype) + dtype.type(2.0) * t_disp.astype(dtype),
                axis=0, keepdims=True,
            )

        def rev_b(g):
            """Price cuts + ownership updates for block g (coded
            won/freed reduction)."""
            r_local = lax.broadcasted_iota(jnp.int32, (bm, n), 0)
            u_iota = lax.broadcasted_iota(jnp.int32, (bm, n), 1)
            r_global = r_local + g * jnp.int32(bm)
            acc_max = accf[_ACC_MAX:_ACC_MAX + 1, :]
            acc_arg = acci[_ACC_ARG:_ACC_ARG + 1, :]

            besti_col = _to_col(besti_ps[pl.ds(g, 1), :]).astype(jnp.int32)
            rfloor_col = _to_col(rfloor_ps[pl.ds(g, 1), :])
            is_here = u_iota == besti_col     # sentinel n never matches
            has_rw = acc_max != neg_inf                        # [1, N]
            t_won = is_here & (acc_arg == r_global)
            is_disp = has_rw & (p2o != _INT_MAX)
            t_freed = (p2o == r_global) & is_disp
            code = jnp.sum(
                t_won.astype(dtype) + dtype.type(2.0) * t_freed.astype(dtype),
                axis=1, keepdims=True,
            )                                                  # [BM, 1]
            won_obj = (code == dtype.type(1.0)) | (code == dtype.type(3.0))
            freed = code >= dtype.type(2.0)

            prices_col = _to_col(prices_ps[pl.ds(g, 1), :])
            prices_ps[pl.ds(g, 1), :] = _to_row(
                jnp.where(won_obj, rfloor_col - eps, prices_col)
            )
            o2p_col = _to_col(o2p_ps[pl.ds(g, 1), :])
            o2p_ps[pl.ds(g, 1), :] = _to_row(
                jnp.where(
                    won_obj, besti_col.astype(dtype),
                    jnp.where(freed, dtype.type(-1), o2p_col),
                )
            )
            mark_dirty(
                g, jnp.sum(won_obj.astype(jnp.float32)) > jnp.float32(0)
            )

        def block_b(g, c):
            # block-has-work flags hoisted to the [G, N] histogram
            # above — one scalar load per block instead of a wide
            # [1, N] sum per block per round
            bneed = bflag_ps[pl.ds(g, 1), 0:1][0, 0] > jnp.float32(0)
            pl.when(mode & bneed)(lambda: fwd_b(g))
            pl.when(~mode & bneed)(lambda: rev_b(g))
            return c

        lax.fori_loop(
            jnp.int32(0), jnp.int32(g_blocks), block_b, jnp.int32(0)
        )

        # prefetch next round's first block behind the lane-side tail
        start(jnp.int32(0), vbuf0, 0)

        # ---- end-of-round person-side updates (pure value cond)
        code = accf[_CODE:_CODE + 1, :]
        best_j = acci[_BEST_J:_BEST_J + 1, :]
        floor = accf[_FLOOR:_FLOOR + 1, :]
        acc_max = accf[_ACC_MAX:_ACC_MAX + 1, :]
        acc_arg = acci[_ACC_ARG:_ACC_ARG + 1, :]

        def fwd_end(op):
            pi, p2o = op
            won = (code == dtype.type(1.0)) | (code == dtype.type(3.0))
            displaced = (p2o != _INT_MAX) & (code >= dtype.type(2.0))
            p2o = jnp.where(
                won, best_j, jnp.where(displaced, _INT_MAX, p2o)
            )
            pi = jnp.where(won, floor - eps, pi)
            return pi, p2o

        def rev_end(op):
            pi, p2o = op
            has_rw = acc_max != neg_inf
            pi = jnp.where(has_rw, pi + acc_max, pi)
            p2o = jnp.where(has_rw, acc_arg, p2o)
            return pi, p2o

        pi, p2o = lax.cond(mode, fwd_end, rev_end, (pi, p2o))

        # ---- bookkeeping (identical to ops/pallas_fr.py)
        card_new = jnp.sum((p2o != _INT_MAX).astype(jnp.float32))
        increased = card_new > card_old
        stall_flip = ~increased & (since + 1 >= stall_k) & ~done
        mode = mode ^ ((increased | stall_flip) & ~done)
        since = jnp.where(increased | stall_flip, jnp.int32(0), since + 1)
        stall_k = jnp.where(
            increased,
            _STALL_K0,
            jnp.where(stall_flip, stall_k * 2, stall_k),
        )
        nits = nits + (~done).astype(jnp.int32)
        done = done | (card_new == jnp.float32(n))
        # in-kernel round trace (zero ops when SLAP_TPU_DEBUG unset):
        # hot-loop visibility parity with ksparse.rs:189-190
        # (all args int32: Mosaic's debug_print placeholders only
        # lower 32-bit integers)
        trace_kernel_round(
            "fr big kernel round: nits={} mode={} card={} done={}",
            nits, mode.astype(jnp.int32), card_new.astype(jnp.int32),
            done.astype(jnp.int32),
        )
        return (i + jnp.int32(1), pi, p2o, mode, done, nits, since,
                stall_k, card_new)

    def keep_going(carry):
        return (carry[0] < jnp.int32(rounds)) & ~carry[4]

    (_, pi, p2o, mode, done, nits, since, stall_k, _card) = lax.while_loop(
        keep_going, round_body, carry
    )
    wait(jnp.int32(0), vbuf0, 0)              # consume outstanding DMA

    prices_out[:] = prices_ps[:]
    o2p_out[:] = o2p_ps[:]
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
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
    p2o_pad_out[2:8, :] = jnp.zeros((6, n), jnp.int32)
    pi_pad_out[0:1, :] = pi
    pi_pad_out[1:2, :] = jnp.full((1, n), eps, pi.dtype)
    pi_pad_out[2:8, :] = jnp.zeros((6, n), pi.dtype)


@functools.partial(
    jax.jit, static_argnames=("rounds", "bm", "interpret")
)
def fr_big_chunk(
    vals_t, state: FRState, rounds: int, bm: int = 128,
    interpret: bool = False,
):
    """Run up to ``rounds`` streamed FR rounds on one dense instance.

    ``vals_t [M, N]`` (objects × persons, sign-adjusted max-profit
    values); ``state`` is an unbatched :class:`FRState` as produced by
    ``fr_dense.fr_init``.  Requires ``N % 128 == 0`` and
    ``M % (2·bm) == 0`` (the DMA double buffer is unrolled in pairs) —
    the caller pads.  Only valid in the no-ladder mode (start ε ==
    target ε); ``eps``/``nreductions`` pass through, ``optimal_found``
    mirrors ``done``."""
    m, n = vals_t.shape
    assert n % 128 == 0 and m % (2 * bm) == 0
    # the fused in-block top-2 halves rows repeatedly (pallas_fr helper)
    assert bm >= 2 and bm & (bm - 1) == 0, "bm must be a power of two"
    g = m // bm
    dtype = vals_t.dtype

    prices_p = state.prices.reshape(g, bm)
    o2p_p = jnp.where(
        state.o2p == _INT_MAX, jnp.int32(-1), state.o2p
    ).astype(dtype).reshape(g, bm)
    p2o_pad = jnp.zeros((8, n), jnp.int32)
    p2o_pad = p2o_pad.at[0, :].set(state.p2o)
    p2o_pad = p2o_pad.at[1, 0].set(state.nits)
    p2o_pad = p2o_pad.at[1, 1].set(state.forward_mode.astype(jnp.int32))
    p2o_pad = p2o_pad.at[1, 2].set(state.done.astype(jnp.int32))
    p2o_pad = p2o_pad.at[1, 3].set(state.since_inc)
    p2o_pad = p2o_pad.at[1, 4].set(state.stall_k)
    pi_pad = jnp.zeros((8, n), dtype)
    pi_pad = pi_pad.at[0, :].set(state.profits)
    pi_pad = pi_pad.at[1, 0].set(state.eps)

    prices_p, o2p_p, p2o_pad, pi_pad = pl.pallas_call(
        functools.partial(_fr_big_kernel, rounds=rounds, bm=bm),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
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
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, bm), dtype),
            jax.ShapeDtypeStruct((g, bm), dtype),
            jax.ShapeDtypeStruct((8, n), jnp.int32),
            jax.ShapeDtypeStruct((8, n), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, n), dtype),
            pltpu.VMEM((bm, n), dtype),
            pltpu.VMEM((g, bm), dtype),
            pltpu.VMEM((g, bm), dtype),
            pltpu.VMEM((g, bm), dtype),
            pltpu.VMEM((g, bm), dtype),
            pltpu.VMEM((8, n), dtype),
            pltpu.VMEM((8, n), jnp.int32),
            pltpu.VMEM((g, n), dtype),
            pltpu.VMEM((g, n), dtype),
            pltpu.VMEM((g, n), jnp.int32),
            pltpu.VMEM((g, bm), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.VMEM((g, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the block top-2 caches add 3 [G, N] buffers (~12 MB at
        # 8192²/bm=64); the 16 MB scoped-VMEM cap is a compiler
        # default, not hardware (docs/PERFORMANCE.md)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(vals_t, prices_p, o2p_p, p2o_pad, pi_pad)

    o2p_f = o2p_p.reshape(m)
    done = p2o_pad[1, 2] != 0
    new_state = FRState(
        prices=prices_p.reshape(m),
        profits=pi_pad[0, :],
        p2o=p2o_pad[0, :],
        o2p=jnp.where(
            o2p_f < dtype.type(0), _INT_MAX, o2p_f.astype(jnp.int32)
        ),
        eps=state.eps,
        forward_mode=p2o_pad[1, 1] != 0,
        since_inc=p2o_pad[1, 3],
        stall_k=p2o_pad[1, 4],
        nits=p2o_pad[1, 0],
        nreductions=state.nreductions,
        optimal_found=state.optimal_found | done,
        done=done,
    )
    return new_state, done
