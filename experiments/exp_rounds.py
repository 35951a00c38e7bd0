"""Experiment: FR round-count under init-price variants and a 2-level
eps ladder (no kernel changes; init tweaks reuse the compiled kernel)."""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from sparse_linear_assignment_tpu.batch import (
    _fr_batch_init, _fr_pack_results, _stage_values_t,
)
from sparse_linear_assignment_tpu.ops.fr_dense import STALL_K0, FRState
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas
from sparse_linear_assignment_tpu.solution import UNASSIGNED

_INT_MAX = jnp.int32(UNASSIGNED)


def log(m):
    print(m, flush=True)


@jax.jit
def _init_with_prices(values_t, start_eps, prices0):
    b, m, n = values_t.shape
    dtype = values_t.dtype
    return FRState(
        prices=prices0.astype(dtype),
        profits=jnp.max(values_t - prices0[:, :, None], axis=1),
        p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
        o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
        eps=start_eps.astype(dtype),
        forward_mode=jnp.ones((b,), bool),
        since_inc=jnp.zeros((b,), jnp.int32),
        stall_k=jnp.full((b,), STALL_K0, jnp.int32),
        nits=jnp.zeros((b,), jnp.int32),
        nreductions=jnp.zeros((b,), jnp.int32),
        optimal_found=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
    )


@jax.jit
def _fr_release(values_t, states: FRState, eps2):
    """Keep-valid release at the reduced eps2 + profit refresh (the
    fr_dense reduction step, applied batchwise between kernel calls)."""
    b, m, n = values_t.shape
    profit = values_t - states.prices[:, :, None]          # [B, M, N]
    max_profit = jnp.max(profit, axis=1)                   # [B, N]
    j_iota = lax.broadcasted_iota(jnp.int32, (b, m, n), 1)
    is_chosen = states.p2o[:, None, :] == j_iota
    neg_inf = jnp.asarray(-np.inf, profit.dtype)
    chosen_profit = jnp.max(jnp.where(is_chosen, profit, neg_inf), axis=1)
    assigned = states.p2o != _INT_MAX
    keep = assigned & (chosen_profit >= max_profit - eps2)
    release = assigned & ~keep
    freed = jnp.any(is_chosen & release[:, None, :], axis=2)  # [B, M]
    p2o = jnp.where(release, _INT_MAX, states.p2o)
    o2p = jnp.where(freed, _INT_MAX, states.o2p)
    undone = jnp.any(p2o == _INT_MAX, axis=1)
    return states._replace(
        prices=states.prices,
        profits=max_profit.astype(states.profits.dtype),
        p2o=p2o,
        o2p=o2p,
        eps=jnp.full_like(states.eps, eps2),
        forward_mode=jnp.ones_like(states.forward_mode),
        since_inc=jnp.zeros_like(states.since_inc),
        stall_k=jnp.full_like(states.stall_k, STALL_K0),
        done=~undone,
    )


def report(tag, states, values_t, n, t):
    packed = np.asarray(_fr_pack_results(states))
    nits = packed[:, n]
    undone = int((packed[:, n + 1] == 0).sum())
    log(f"{tag}: t={t:.3f}s nits p10={np.percentile(nits,10):.0f} "
        f"p50={np.percentile(nits,50):.0f} p90={np.percentile(nits,90):.0f} "
        f"p99={np.percentile(nits,99):.0f} max={nits.max()} undone={undone}")
    return packed


def check_exact(packed, costs, n, k=4):
    from scipy.optimize import linear_sum_assignment
    bad = 0
    for b in range(k):
        p2o = packed[b, :n]
        if (p2o == UNASSIGNED).any():
            continue
        got = costs[b][np.arange(n), p2o].sum()
        r, c = linear_sum_assignment(costs[b])
        want = costs[b][r, c].sum()
        if abs(got - want) > 1e-6:
            bad += 1
            log(f"  INEXACT b={b}: {got} vs {want}")
    if not bad:
        log("  exact vs scipy on spot checks")


def main(batch=512, n=256):
    rng = np.random.default_rng(0)
    costs = rng.integers(1, 1000, size=(batch, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    values_t = _stage_values_t(dev, True)
    jax.block_until_ready(values_t)
    eps = np.float32(1.0 / n)
    eps_b = jnp.full((batch,), eps)
    budget = 320

    # --- baseline
    for _ in range(2):
        t0 = time.perf_counter()
        states = _fr_batch_init(values_t, eps_b)
        states, _ = fr_chunk_pallas(values_t, states, budget)
        jax.block_until_ready(states.prices)
        t = time.perf_counter() - t0
    packed = report("baseline prices=0", states, values_t, n, t)
    check_exact(packed, -costs, n)  # minimize -> negated values

    # --- colmax price inits
    colmax = jnp.max(values_t, axis=2)  # [B, M] per-object max value
    span = 999.0
    for alpha in [0.0, 0.05, 0.15, 0.3]:
        prices0 = colmax - np.float32(alpha * span)
        for _ in range(2):
            t0 = time.perf_counter()
            states = _init_with_prices(values_t, eps_b, prices0)
            states, _ = fr_chunk_pallas(values_t, states, budget)
            jax.block_until_ready(states.prices)
            t = time.perf_counter() - t0
        packed = report(f"prices=colmax-{alpha}*span", states, values_t, n, t)
        check_exact(packed, -costs, n)

    # --- 2-level eps ladder
    for eps1_mult, b1 in [(8.0, 64), (32.0, 64), (8.0, 96)]:
        eps1 = jnp.full((batch,), np.float32(eps1_mult / n))
        for _ in range(2):
            t0 = time.perf_counter()
            states = _fr_batch_init(values_t, eps1)
            states, _ = fr_chunk_pallas(values_t, states, b1)
            states = _fr_release(values_t, states, np.float32(eps))
            states, _ = fr_chunk_pallas(values_t, states, budget - b1)
            jax.block_until_ready(states.prices)
            t = time.perf_counter() - t0
        packed = report(
            f"ladder eps1={eps1_mult}/n b1={b1}", states, values_t, n, t
        )
        check_exact(packed, -costs, n)


if __name__ == "__main__":
    main()
