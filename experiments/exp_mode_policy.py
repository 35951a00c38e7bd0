"""Round-count study of FR mode-switching policies (CPU-runnable).

The batched throughput ledger (docs/PERFORMANCE.md) is ~135 µs per
256² instance: 104 µs of rounds (nits mean ~157 × 0.665 µs) + 12 µs
entry + ~19 µs residual.  Every per-round cost lever is measured and
priced; the round COUNT itself is set by the mode-switching policy in
``ops/fr_dense.py:fr_round`` (flip on cardinality increase, plus
stall preemption with doubling horizon).  nits is a pure function of
the policy and the instance — backend-independent — so alternative
policies rank on CPU.

Policies (shipped = P0):
  P0  flip on increase OR stall (k0=8, doubling, reset on increase)
  P1  flip on stall only (k0=8, doubling)
  P2  flip on increase OR stall (k0=8 FIXED, no doubling)
  P3  strict alternation (flip every round) — livelock check
  P5  flip on any no-progress round (k=1, no doubling)
  P6  k0=2 doubling variant of P0
  P7  k0=4 doubling variant of P0

Run:  JAX_PLATFORMS=cpu python experiments/exp_mode_policy.py [n] [B]
"""
import functools
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from sparse_linear_assignment_tpu.ops.fr_dense import (
    _forward_sub,
    _reverse_sub,
    _INT_MAX,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SCALE = N + 1  # integer-auction lattice: eps = 1 == 1/(N+1) original
BUDGET = 64 * N  # generous cap; report DNF if hit


def gen(seed):
    rng = np.random.default_rng(seed)
    costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.int64)
    # staged like _stage_values_t_int: maximize-profit orientation
    vals_t = np.swapaxes(-(costs * SCALE), 1, 2).astype(np.int32)
    return costs, jnp.asarray(vals_t)


def policy_round(vals_t, st, *, flip_on_inc, double, k0, alternate):
    prices, profits, p2o, o2p, fwd, since, stall_k, nits, done = st
    eps = jnp.int32(1)
    prices, profits, p2o, o2p = _forward_sub(
        vals_t, prices, profits, p2o, o2p, eps, done | ~fwd)
    prices, profits, p2o, o2p = _reverse_sub(
        vals_t, prices, profits, p2o, o2p, eps, done | fwd)
    increased = (
        jnp.sum(p2o != _INT_MAX, dtype=jnp.int32)
        > jnp.sum(st[2] != _INT_MAX, dtype=jnp.int32)
    )
    if alternate:
        flip = ~done
    else:
        stall_flip = ~increased & (since + 1 >= stall_k) & ~done
        flip = (stall_flip | (increased & flip_on_inc)) & ~done
        since = jnp.where(
            done, since, jnp.where(increased | stall_flip, 0, since + 1))
        if double:
            stall_k = jnp.where(
                increased, jnp.int32(k0),
                jnp.where(stall_flip, stall_k * 2, stall_k))
    fwd = fwd ^ flip
    nits = nits + (~done).astype(jnp.int32)
    done = done | (jnp.sum(p2o == _INT_MAX, dtype=jnp.int32) == 0)
    return prices, profits, p2o, o2p, fwd, since, stall_k, nits, done


def init_state(vals_t, k0):
    m, n = vals_t.shape
    return (
        jnp.zeros(m, jnp.int32),
        jnp.max(vals_t, axis=0),
        jnp.full(n, _INT_MAX, jnp.int32),
        jnp.full(m, _INT_MAX, jnp.int32),
        jnp.ones((), bool),
        jnp.zeros((), jnp.int32),
        jnp.full((), k0, jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )


@functools.partial(jax.jit, static_argnames=(
    "flip_on_inc", "double", "k0", "alternate"))
def run_policy(vt_b, *, flip_on_inc, double, k0, alternate):
    def one(vals_t):
        st = init_state(vals_t, k0)

        def chunk(st, _):
            def rnd(st, _):
                return policy_round(
                    vals_t, st, flip_on_inc=flip_on_inc, double=double,
                    k0=k0, alternate=alternate), None
            st, _ = lax.scan(rnd, st, None, length=64)
            return st, None

        st, _ = lax.scan(chunk, st, None, length=BUDGET // 64)
        return st[2], st[7], st[8]  # p2o, nits, done

    return jax.vmap(one)(vt_b)


POLICIES = {
    "P0 ship k0=8 dbl+inc": dict(flip_on_inc=True, double=True, k0=8,
                                 alternate=False),
    "P1 stall-only k0=8":   dict(flip_on_inc=False, double=True, k0=8,
                                 alternate=False),
    "P2 inc+fixed k=8":     dict(flip_on_inc=True, double=False, k0=8,
                                 alternate=False),
    "P3 alternate":         dict(flip_on_inc=False, double=False, k0=1,
                                 alternate=True),
    "P5 flip-no-progress":  dict(flip_on_inc=True, double=False, k0=1,
                                 alternate=False),
    "P6 ship k0=2":         dict(flip_on_inc=True, double=True, k0=2,
                                 alternate=False),
    "P7 ship k0=4":         dict(flip_on_inc=True, double=True, k0=4,
                                 alternate=False),
}


def main():
    costs, vt = gen(0)
    from scipy.optimize import linear_sum_assignment

    print(f"n={N} B={B} budget={BUDGET} lattice scale={SCALE}", flush=True)
    for name, kw in POLICIES.items():
        t0 = time.time()
        p2o, nits, done = run_policy(vt, **kw)
        p2o, nits, done = map(np.asarray, (p2o, nits, done))
        dnf = int((~done).sum())
        q = np.percentile(nits, [50, 99])
        line = (f"{name:22s} mean {nits.mean():7.1f} p50 {q[0]:6.0f} "
                f"p99 {q[1]:6.0f} max {nits.max():6d} DNF {dnf:3d} "
                f"[{time.time() - t0:.0f}s]")
        # exactness spot checks (done instances only)
        bad = 0
        for b in (0, 1, B // 2, B - 1):
            if not done[b]:
                continue
            r, c = linear_sum_assignment(costs[b])
            want = costs[b][r, c].sum()
            got = costs[b][np.arange(N), p2o[b]].sum()
            bad += int(got != want)
        print(line + ("  EXACT" if bad == 0 else f"  WRONG x{bad}"),
              flush=True)


if __name__ == "__main__":
    main()
