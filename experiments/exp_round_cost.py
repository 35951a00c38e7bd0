"""Decompose the fused FR round cost at 256x256 (real TPU).

Runs a forward-only probe kernel (same op mix as one forward sub-round
+ bookkeeping) for a FIXED number of rounds per grid step, with pieces
statically removed, to locate where the ~1.3 us/inst-round goes.

Variants:
  full      — the real forward sub + delta bookkeeping
  no_argb   — best_j replaced by a constant (drops the axis-0 min)
  no_second — second := best (drops one axis-0 max)
  no_ax0    — best/best_j/second all dummies (drops all 3 axis-0 reds)
  no_ax1    — max_inc/winner dummies (drops both axis-1 reductions)
  no_code   — code := 0 (drops the coded sum)
  elem_only — all reductions dummied (pure elementwise)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, ROUNDS = 512, 256, 320
_INT_MAX = np.int32(2**31 - 1)


def _kernel(vals_ref, prices_ref, pi_ref, p2o_ref, o2p_ref,
            prices_out, pi_out, p2o_out, o2p_out, *, variant, rounds):
    from jax.experimental import pallas as _pl
    vals = vals_ref[:]
    neg_inf = vals.dtype.type(-np.inf)
    m, n = vals.shape
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    eps = jnp.float32(1.0 / n)

    no_ax0 = variant in ("no_ax0", "elem_only")
    no_ax1 = variant in ("no_ax1", "elem_only")
    no_code = variant in ("no_code", "elem_only")
    code_mxu = variant in ("code_mxu", "all_mxu")
    winner_mxu = variant in ("winner_mxu", "all_mxu")
    bestj_mxu = variant in ("bestj_mxu", "all_mxu")
    tree = variant == "tree"
    ones_row = jnp.ones((1, m), jnp.float32)
    iota_row = lax.broadcasted_iota(jnp.float32, (1, m), 1)
    ones_col = jnp.ones((n, 1), jnp.float32)
    iota_col = lax.broadcasted_iota(jnp.float32, (n, 1), 0)

    def tfold(x, op, stop=8):
        """Log-depth axis-0 fold down to `stop` rows (static slices)."""
        r = x.shape[0]
        while r > stop:
            h = r // 2
            x = op(x[:h], x[h:])
            r = h
        return x

    def tmax0(x):
        return jnp.max(tfold(x, jnp.maximum), axis=0, keepdims=True)

    def tmin0(x):
        return jnp.min(tfold(x, jnp.minimum), axis=0, keepdims=True)

    def tsum0(x):
        return jnp.sum(tfold(x, jnp.add), axis=0, keepdims=True)

    def body(i, carry):
        rowp, colpi, colp2o, rowo2p, card = carry
        profit = vals - rowp
        if no_ax0:
            best = profit[0:1, :]
            best_j = colp2o * 0
            second = best - jnp.float32(1.0)
        elif tree:
            best = tmax0(profit)
            is_best = profit == best
            best_j = tmin0(jnp.where(is_best, j_iota, jnp.int32(m)))
            sel0 = j_iota == best_j
            second = tmax0(jnp.where(sel0, neg_inf, profit))
        else:
            best = jnp.max(profit, axis=0, keepdims=True)
            is_best = profit == best
            if variant == "no_argb":
                best_j = colp2o * 0
            elif bestj_mxu:
                # argbest via MXU dot (valid when the max is unique per
                # column; TIMING-ONLY here — the real kernel would need
                # a tie fallback under a scalar cond)
                best_j = lax.dot_general(
                    iota_row, is_best.astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
            else:
                best_j = jnp.min(
                    jnp.where(is_best, j_iota, jnp.int32(m)),
                    axis=0, keepdims=True,
                )
            if variant == "no_second":
                second = best
            else:
                sel0 = j_iota == best_j
                second = jnp.max(
                    jnp.where(sel0, neg_inf, profit),
                    axis=0, keepdims=True,
                )
        sel = j_iota == best_j
        has_second = second != neg_inf
        floor = jnp.where(has_second, second, best)
        raw_inc = best - floor + eps
        unassigned = colp2o == _INT_MAX
        bidding = unassigned & (best != neg_inf)
        inc = jnp.where(bidding, raw_inc, neg_inf)
        is_here = sel & bidding
        eff = jnp.where(is_here, inc, neg_inf)
        if no_ax1:
            max_inc = eff[:, 0:1]
            winner = rowo2p * 0 + 1
        elif winner_mxu:
            max_inc = jnp.max(eff, axis=1, keepdims=True)
            t_at_max = (is_here & (eff >= max_inc)).astype(jnp.float32)
            winner = lax.dot_general(
                t_at_max, iota_col,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        else:
            max_inc = jnp.max(eff, axis=1, keepdims=True)
            cand = jnp.where(is_here & (eff >= max_inc), u_iota, _INT_MAX)
            winner = jnp.min(cand, axis=1, keepdims=True)
        has_winner = max_inc != neg_inf
        rowp2 = jnp.where(has_winner, rowp + max_inc, rowp)
        rowo2p2 = jnp.where(has_winner, winner, rowo2p)
        t_won = is_here & (winner == u_iota)
        t_disp = (colp2o == j_iota) & has_winner
        if no_code:
            code = best * 0
        elif tree:
            code = tsum0(
                t_won.astype(jnp.float32)
                + jnp.float32(2.0) * t_disp.astype(jnp.float32)
            )
        elif code_mxu:
            code = lax.dot_general(
                ones_row,
                t_won.astype(jnp.float32)
                + jnp.float32(2.0) * t_disp.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            code = jnp.sum(
                t_won.astype(jnp.float32)
                + jnp.float32(2.0) * t_disp.astype(jnp.float32),
                axis=0, keepdims=True,
            )
        won = (code == jnp.float32(1.0)) | (code == jnp.float32(3.0))
        displaced = (colp2o != _INT_MAX) & (code >= jnp.float32(2.0))
        colp2o2 = jnp.where(
            won, best_j, jnp.where(displaced, _INT_MAX, colp2o)
        )
        colpi2 = jnp.where(won, floor - eps, colpi)
        if variant == "elem_only":
            delta = code[0, 0]
        else:
            delta = jnp.sum(
                won.astype(jnp.float32) - displaced.astype(jnp.float32)
            )
        if variant in ("conds8", "conds8_taken"):
            # price the scf.if overhead: 8 conditionals per round, all
            # skipped (conds8) or all taken (conds8_taken) with a tiny
            # body — the go/no-go number for per-block skip designs
            taken = variant == "conds8_taken"
            for q in range(8):
                pred = (delta >= jnp.float32(-1.0)) if taken else (
                    delta < jnp.float32(-1.0)
                )

                def _tiny(q=q):
                    prices_out[q:q + 1, :] = rowp2[q:q + 1, :]

                _pl.when(pred)(_tiny)
        return (rowp2, colpi2, colp2o2, rowo2p2, card + delta)

    carry = (
        prices_ref[:], pi_ref[0:1, :], p2o_ref[0:1, :], o2p_ref[:],
        jnp.float32(0.0),
    )
    rowp, colpi, colp2o, rowo2p, card = lax.fori_loop(
        jnp.int32(0), jnp.int32(rounds), body, carry
    )
    prices_out[:] = rowp
    pi_out[0:1, :] = colpi + card
    pi_out[1:8, :] = jnp.zeros((7, n), jnp.float32)
    p2o_out[0:1, :] = colp2o
    p2o_out[1:8, :] = jnp.zeros((7, n), jnp.int32)
    o2p_out[:] = rowo2p


@functools.partial(jax.jit, static_argnames=("variant", "rounds"))
def run(vals2, prices2, pi2, p2o2, o2p2, variant, rounds):
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, rounds=rounds),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((S, S), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, S), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, S), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((S, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, S), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, S), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 1), lambda i: (i, i * 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * S, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * 8, S), jnp.float32),
            jax.ShapeDtypeStruct((B * 8, S), jnp.int32),
            jax.ShapeDtypeStruct((B * S, 1), jnp.int32),
        ),
    )(vals2, prices2, pi2, p2o2, o2p2)


def main():
    rng = np.random.default_rng(0)
    vals2 = jnp.asarray(
        -rng.integers(1, 1000, size=(B * S, S)).astype(np.float32)
    )
    prices2 = jnp.zeros((B * S, 1), jnp.float32)
    pi2 = jnp.zeros((B * 8, S), jnp.float32)
    p2o2 = jnp.full((B * 8, S), _INT_MAX, jnp.int32)
    o2p2 = jnp.full((B * S, 1), _INT_MAX, jnp.int32)
    jax.block_until_ready((vals2, prices2, pi2, p2o2, o2p2))

    variants = sys.argv[1:] or [
        "full", "no_argb", "no_second", "no_ax0", "no_ax1",
        "no_code", "elem_only", "code_mxu", "winner_mxu", "bestj_mxu",
        "all_mxu",
    ]

    def chained(v, k):
        """k chained calls (each feeds the last outputs) + one value
        readback: defeats async-dispatch timing artifacts through the
        tunnel — per-call cost is the slope between k=1 and k=K."""
        p, pi, p2o, o2p = prices2, pi2, p2o2, o2p2
        t0 = time.perf_counter()
        for _ in range(k):
            p, pi, p2o, o2p = run(vals2, p, pi, p2o, o2p, v, ROUNDS)
        float(np.asarray(p[0, 0]))
        return time.perf_counter() - t0

    K = 8
    for v in variants:
        chained(v, 1)  # compile
        t1 = min(chained(v, 1) for _ in range(3))
        tk = min(chained(v, K) for _ in range(3))
        per_call = (tk - t1) / (K - 1)
        per = per_call / (B * ROUNDS) * 1e6
        print(
            f"{v:10s}: t1 {t1*1e3:7.1f} ms  per-call {per_call*1e3:7.1f} ms"
            f"  {per:6.3f} us/inst-round",
            flush=True,
        )


if __name__ == "__main__":
    main()
