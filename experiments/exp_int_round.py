"""Integer-auction packed-key probe at 256x256 (real TPU).

Hypothesis (round-3): the fused FR round's floor is ~6 reduction-tree
latencies; packed value+index keys were rejected for f32 (mantissa
truncation breaks the integer-cost exactness contract), but with the
WHOLE auction in scaled int32 arithmetic (costs*(n+1), eps=1) the
packing is exact: key = (value << 8) | (255 - index), one max tree
returns both the max and its min-index argmax.  That fuses best+argbest
and max_inc+winner -> 6 trees become 4.

Variants (forward-only sub-round + bookkeeping, fixed rounds):
  f32    — the round-cost probe's "full" (baseline, 6 trees)
  int6   — same structure in int32 (isolates dtype cost, 6 trees)
  int4   — int32 with packed keys (4 trees)
  mix4   — f32 elementwise arithmetic (exact: scaled ints < 2^24),
           int32 only for the two packed key trees (4 trees)
  int4m  — int4 with an int32 MAX code tree (shipped round-3 kernel)
  int4r  — int4m + cardinality delta from the ROW side
           (sum over [M,1] of has_winner & row-was-free — kills the
           [1,N] cross-lane delta sum)
  int3t  — int4r + conflict resolution in the TRANSPOSED layout:
           per-person bid keys are built in phase 1 ([1,N]), two
           vector transposes move them to [N,1], the winner tree
           becomes an axis-0 (sublane) max over [N,M], and one
           transpose brings the [1,M] result back — NO cross-lane
           [S,S] reduction tree remains in the round
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
_SENT = np.int32(-(2**30))  # "minus infinity" for int32 keys/profits
SH = 8  # index bits (S = 256)
MASK = np.int32((1 << SH) - 1)


def _kernel(vals_ref, prices_ref, pi_ref, p2o_ref, o2p_ref,
            prices_out, pi_out, p2o_out, o2p_out, *, variant, rounds):
    vals = vals_ref[:]
    is_int = variant.startswith("int")
    mix = variant == "mix4"
    packed = variant in ("int4", "int4m", "int3", "int4r", "int3t")
    m, n = vals.shape
    j_iota = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    u_iota = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    if is_int:
        neg_inf = _SENT
        eps = jnp.int32(1)
    elif mix:
        neg_inf = np.float32(-np.inf)
        eps = jnp.float32(1.0)  # scaled-integer lattice, eps = 1
    else:
        neg_inf = np.float32(-np.inf)
        eps = jnp.float32(1.0 / n)
    revj = MASK - j_iota
    revu = MASK - u_iota

    def body(i, carry):
        rowp, colpi, colp2o, rowo2p, card = carry
        profit = vals - rowp
        if mix:
            # f32 arithmetic (exact on the scaled-integer lattice),
            # int32 only inside the packed selection trees
            ikey = (profit.astype(jnp.int32) << SH) | revj
            bestk = jnp.max(ikey, axis=0, keepdims=True)
            best = (bestk >> SH).astype(jnp.float32)
            best_j = MASK - (bestk & MASK)
            sel = j_iota == best_j
        elif packed:
            key = (profit << SH) | revj
            bestk = jnp.max(key, axis=0, keepdims=True)
            best = bestk >> SH
            best_j = MASK - (bestk & MASK)
            sel = j_iota == best_j
        else:
            best = jnp.max(profit, axis=0, keepdims=True)
            is_best = profit == best
            best_j = jnp.min(
                jnp.where(is_best, j_iota, jnp.int32(m)),
                axis=0, keepdims=True,
            )
            sel = j_iota == best_j
        second = jnp.max(jnp.where(sel, neg_inf, profit),
                         axis=0, keepdims=True)
        has_second = second != neg_inf
        floor = jnp.where(has_second, second, best)
        raw_inc = best - floor + eps
        unassigned = colp2o == _INT_MAX
        bidding = unassigned & (best != neg_inf)
        is_here = sel & bidding
        if variant == "int3t":
            # transposed conflict resolution: build per-person bid keys
            # in the [1, N] row, transpose the two vectors, and resolve
            # per-object winners with an axis-0 (sublane) max over the
            # [N, M] layout — no cross-lane [S, S] tree
            lane1n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
            bidkey = jnp.where(
                bidding, (raw_inc << SH) | (MASK - lane1n), _SENT
            )                                                  # [1, N]
            bidkeyT = jnp.swapaxes(bidkey, 0, 1)               # [N, 1]
            bjT = jnp.swapaxes(best_j, 0, 1)                   # [N, 1]
            key2T = jnp.where(u_iota == bjT, bidkeyT, _SENT)   # [N, M]
            k2T = jnp.max(key2T, axis=0, keepdims=True)        # [1, M]
            k2 = jnp.swapaxes(k2T, 0, 1)                       # [M, 1]
            has_winner = k2 != _SENT
            max_inc = k2 >> SH
            winner = MASK - (k2 & MASK)
        elif packed or mix:
            iinc = raw_inc.astype(jnp.int32) if mix else raw_inc
            key2 = jnp.where(is_here, (iinc << SH) | revu, _SENT)
            k2 = jnp.max(key2, axis=1, keepdims=True)
            has_winner = k2 != _SENT
            max_inc = (
                (k2 >> SH).astype(jnp.float32) if mix else k2 >> SH
            )
            winner = MASK - (k2 & MASK)
        else:
            inc = jnp.where(bidding, raw_inc, neg_inf)
            eff = jnp.where(is_here, inc, neg_inf)
            max_inc = jnp.max(eff, axis=1, keepdims=True)
            has_winner = max_inc != neg_inf
            cand = jnp.where(is_here & (eff >= max_inc), u_iota, _INT_MAX)
            winner = jnp.min(cand, axis=1, keepdims=True)
        rowp2 = jnp.where(has_winner, rowp + max_inc, rowp)
        rowo2p2 = jnp.where(has_winner, winner, rowo2p)
        t_won = is_here & (winner == u_iota)
        t_disp = (colp2o == j_iota) & has_winner
        if variant == "int3":
            code = jnp.int32(0) * best_j
            won = code == jnp.int32(1)
            displaced = (colp2o != _INT_MAX) & (code == jnp.int32(2))
        elif variant in ("int4m", "int4r", "int3t"):
            # won/displaced are disjoint per column (won => was
            # unassigned, displaced => was assigned), so an int32 MAX
            # tree replaces the f32 sum (no astype, no i64 widening)
            code = jnp.max(
                jnp.where(t_won, jnp.int32(1), jnp.int32(0))
                + jnp.where(t_disp, jnp.int32(2), jnp.int32(0)),
                axis=0, keepdims=True,
            )
            won = code == jnp.int32(1)
            displaced = (colp2o != _INT_MAX) & (code == jnp.int32(2))
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
        if variant in ("int4r", "int3t"):
            # cardinality delta from the ROW side: every row with a
            # winner gains its (previously unassigned) winner; the
            # previous owner, if any, is displaced — net +1 only when
            # the row was free.  [M, 1] sublane sum, no cross-lane tree
            delta = jnp.sum(
                jnp.where(
                    has_winner & (rowo2p == _INT_MAX),
                    jnp.float32(1.0), jnp.float32(0.0),
                )
            )
        else:
            delta = jnp.sum(
                won.astype(jnp.float32) - displaced.astype(jnp.float32)
            )
        return (rowp2, colpi2, colp2o2, rowo2p2, card + delta)

    carry = (
        prices_ref[:], pi_ref[0:1, :], p2o_ref[0:1, :], o2p_ref[:],
        jnp.float32(0.0),
    )
    rowp, colpi, colp2o, rowo2p, card = lax.fori_loop(
        jnp.int32(0), jnp.int32(rounds), body, carry
    )
    prices_out[:] = rowp
    pi_out[0:1, :] = colpi + card.astype(colpi.dtype)
    pi_out[1:8, :] = jnp.zeros((7, n), colpi.dtype)
    p2o_out[0:1, :] = colp2o
    p2o_out[1:8, :] = jnp.zeros((7, n), jnp.int32)
    o2p_out[:] = rowo2p


@functools.partial(jax.jit, static_argnames=("variant", "rounds"))
def run(vals2, prices2, pi2, p2o2, o2p2, variant, rounds):
    dt = vals2.dtype
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
            jax.ShapeDtypeStruct((B * S, 1), dt),
            jax.ShapeDtypeStruct((B * 8, S), dt),
            jax.ShapeDtypeStruct((B * 8, S), jnp.int32),
            jax.ShapeDtypeStruct((B * S, 1), jnp.int32),
        ),
    )(vals2, prices2, pi2, p2o2, o2p2)


def main():
    rng = np.random.default_rng(0)
    raw = -rng.integers(1, 1000, size=(B * S, S))
    inputs = {}
    inputs["f32"] = (
        jnp.asarray(raw.astype(np.float32)),
        jnp.zeros((B * S, 1), jnp.float32),
        jnp.zeros((B * 8, S), jnp.float32),
    )
    vi = jnp.asarray((raw * (S + 1)).astype(np.int32))
    for v in ("int6", "int4", "int4m", "int3", "int4r", "int3t"):
        inputs[v] = (
            vi,
            jnp.zeros((B * S, 1), jnp.int32),
            jnp.zeros((B * 8, S), jnp.int32),
        )
    inputs["mix4"] = (
        jnp.asarray((raw * (S + 1)).astype(np.float32)),
        jnp.zeros((B * S, 1), jnp.float32),
        jnp.zeros((B * 8, S), jnp.float32),
    )
    p2o2 = jnp.full((B * 8, S), _INT_MAX, jnp.int32)
    o2p2 = jnp.full((B * S, 1), _INT_MAX, jnp.int32)
    jax.block_until_ready((p2o2, o2p2))

    variants = sys.argv[1:] or ["f32", "int6", "int4", "mix4"]

    def chained(v, k):
        vals2, prices2, pi2 = inputs[v]
        p, pi, p2o, o2p = prices2, pi2, p2o2, o2p2
        t0 = time.perf_counter()
        for _ in range(k):
            p, pi, p2o, o2p = run(vals2, p, pi, p2o, o2p, v, ROUNDS)
        float(np.asarray(p[0, 0]))  # value readback: real sync
        return time.perf_counter() - t0

    K = 8
    for v in variants:
        chained(v, 1)  # compile
        t1 = min(chained(v, 1) for _ in range(3))
        tk = min(chained(v, K) for _ in range(3))
        per_call = (tk - t1) / (K - 1)
        per = per_call / (B * ROUNDS) * 1e6
        print(
            f"{v:6s}: t1 {t1*1e3:7.1f} ms  per-call {per_call*1e3:7.1f} ms"
            f"  {per:6.3f} us/inst-round",
            flush=True,
        )

    # bit-exactness: the restructured rounds must leave identical state
    if "int4m" in variants and "int3t" in variants:
        outs = {}
        for v in ("int4m", "int3t"):
            vals2, prices2, pi2 = inputs[v]
            outs[v] = run(vals2, prices2, pi2, p2o2, o2p2, v, ROUNDS)
        for a, b, name in zip(outs["int4m"], outs["int3t"],
                              ("prices", "pi+card", "p2o", "o2p")):
            same = bool(jnp.all(a == b))
            print(f"int3t == int4m [{name}]: {same}")
            assert same, name


if __name__ == "__main__":
    main()
