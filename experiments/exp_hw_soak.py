"""Randomized HARDWARE consistency soak (real TPU, bounded wall clock).

The CPU-side sweep (``exp_consistency_sweep.py``) fuzzes every engine
in interpret/XLA-CPU mode; this soak fuzzes the *production Mosaic
lowerings on the real chip* — the fused forward-reverse kernel (int and
float modes), the pipelined stream mode, the HBM-streaming big-single
kernel, the rectangular forward engine, and the hybrid sparse headline
path — against the scipy oracle (or an independent engine), with
randomized VALUES over a small fixed shape menu (fixed shapes keep the
compile-cache zoo bounded; the value distributions are the fuzz axis:
uniform, tie-heavy, negative, wide-range).

Usage: python experiments/exp_hw_soak.py [minutes] [base_seed]

Run SOLO (single-core host; see docs/PERFORMANCE.md). First iteration
pays cold compiles for any uncached shapes; later iterations are pure
execution.
"""

import sys
import time

import numpy as np

from scipy.optimize import linear_sum_assignment as lsa

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.batch import (
    solve_batch,
    solve_batch_stream,
)
from sparse_linear_assignment_tpu.generators import gen_symmetric_input

B, N = 64, 256


def oracle_obj(mat, maximize):
    r, c = lsa(np.asarray(mat, dtype=np.float64), maximize=maximize)
    return float(np.asarray(mat, dtype=np.float64)[r, c].sum())


def spot_check(tag, costs, sol, maximize, exact, spots=3, rng=None):
    assert int(np.asarray(sol.num_unassigned).sum()) == 0, (
        tag, "unassigned", np.asarray(sol.num_unassigned))
    b, n, _ = costs.shape
    idx = rng.choice(b, size=min(spots, b), replace=False)
    p2o = np.asarray(sol.person_to_object)
    for i in idx:
        want = oracle_obj(costs[i], maximize)
        got = float(
            np.asarray(costs[i], dtype=np.float64)[np.arange(n), p2o[i]].sum()
        )
        obj = float(np.asarray(sol.objective)[i])
        assert abs(obj - got) < 1e-6, (tag, i, "objective!=matching", obj, got)
        if exact:
            assert got == want, (tag, i, got, want)
        else:
            eps_arr = np.asarray(sol.eps).ravel()
            eps = float(eps_arr[i] if eps_arr.size > 1 else eps_arr[0])
            tol = n * eps + 1e-9
            assert (got - want if not maximize else want - got) <= tol, (
                tag, i, got, want, tol)


def batched_cases(rng, it):
    cnt = 0
    # A: uniform ints (auto int mode)
    costs = rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)
    mx = bool(rng.integers(2))
    sol = solve_batch(costs, maximize=mx, solver="fr")
    spot_check("int-uniform", costs, sol, mx, exact=True, rng=rng)
    cnt += 1
    # B: tie-heavy ints
    costs = rng.integers(1, 5, size=(B, N, N)).astype(np.float32)
    sol = solve_batch(costs, maximize=False, solver="fr")
    spot_check("int-ties", costs, sol, False, exact=True, rng=rng)
    cnt += 1
    # C: negative ints (sign quirk through the batch path)
    costs = rng.integers(-500, 500, size=(B, N, N)).astype(np.float32)
    mx = bool(rng.integers(2))
    sol = solve_batch(costs, maximize=mx, solver="fr")
    spot_check("int-negative", costs, sol, mx, exact=True, rng=rng)
    cnt += 1
    # D: float costs (certificate bound, not exact)
    costs = (rng.random((B, N, N)) * 100.0).astype(np.float32)
    sol = solve_batch(costs, maximize=False, solver="fr")
    spot_check("float-uniform", costs, sol, False, exact=False, rng=rng)
    cnt += 1
    # E: wide-range ints past the int-lattice guard -> f64 path
    costs = rng.integers(1, 1_000_000, size=(B, N, N)).astype(np.float64)
    sol = solve_batch(costs, maximize=False, solver="fr", dtype=np.float64)
    spot_check("int-wide-f64", costs, sol, False, exact=True, rng=rng)
    cnt += 1
    return cnt


def stream_cases(rng, it):
    import jax.numpy as jnp

    batches = [
        jnp.asarray(
            rng.integers(1, 1000, size=(B, N, N)).astype(np.float32)
        )
        for _ in range(2)
    ]
    sols = solve_batch_stream(batches, integer=True, max_cost=1000,
                              window=2)
    for d, s in zip(batches, sols):
        spot_check("stream-int", np.asarray(d), s, False, exact=True,
                   rng=rng, spots=2)
    return 1


def big_single_case(rng, it, n=1152):
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    mx = bool(rng.integers(2))
    sol = solve_batch(costs, maximize=mx, solver="fr", dtype=np.float32,
                      eps=1.0 / (n + 1))
    spot_check("big-single", costs, sol, mx, exact=True, rng=rng, spots=1)
    return 1


def rect_cases(rng, it, b=16, n=96, m=160):
    costs = (rng.random((b, n, m)) * 50.0).astype(np.float32)
    sol = solve_batch(costs, maximize=False)  # auto -> forward on rect
    spot_check("rect-forward", costs, sol, False, exact=False, rng=rng,
               spots=2)
    return 1


def sparse_batch_case(rng, it, b=256, n=128, m=512, k=8):
    """Batched-sparse fused Mosaic kernel (round 5): host-staged dense
    engine + device-resident staging on alternating iterations, both
    oracle-exact on the integer lattice."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.batch import (
        _sparse_dispatch,
        _sparse_finish,
        solve_batch_sparse,
        stage_batch_sparse_device,
    )
    from sparse_linear_assignment_tpu.generators import gen_batch_ksparse
    from scipy.optimize import linear_sum_assignment as lsa

    seed = int(rng.integers(0, 10**9))
    cols, vals = gen_batch_ksparse(seed, b, n, m, k)
    if it % 2:
        sol = solve_batch_sparse(cols, vals, m, engine="dense")
    else:
        st = stage_batch_sparse_device(
            jnp.asarray(cols), jnp.asarray(vals, jnp.float32), m
        )
        sol = _sparse_finish(st, _sparse_dispatch(st, 16), 10_000_000)
    assert int(sol.num_unassigned.sum()) == 0
    for bi in rng.choice(b, size=2, replace=False):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, cols[bi, i]] = vals[bi, i]
        r, c = lsa(full)
        assert sol.objective[bi] == full[r, c].sum(), (seed, bi)
    return 1


def hybrid_case(rng, it, n=100_000):
    """Hybrid TPU-bulk + native-tail vs the independent native ε-ladder
    (router default) on a fresh sparse instance.  n must exceed the
    hybrid's tail_threshold (65536) for a real TPU bulk phase.  The arc
    STRUCTURE stays the headline's (seed 42: same max degrees, same
    padded device shapes, so the compiled-program cache is hit); the
    VALUE stream is fresh per case (value_seed) — costs are the fuzzed
    axis."""
    vseed = int(rng.integers(1, 2**31 - 1))
    solver, solution = KhoslaSolver.new(n, n, 10 * n)
    gen_symmetric_input(solver, 42, n, 5.0 / n, 0.0, 10.0,
                        value_seed=vseed)
    solver.dtype = np.dtype(np.float32)
    solver.solve(solution, False, scale_eps=True, hybrid=True)
    assert solution.num_unassigned == 0, solution.num_unassigned
    obj_h = solver.get_objective(solution)

    ref, rsol = KhoslaSolver.new(n, n, 10 * n)
    gen_symmetric_input(ref, 42, n, 5.0 / n, 0.0, 10.0, value_seed=vseed)
    ref.solve(rsol, False)  # engine="auto" -> native ε-ladder
    assert rsol.num_unassigned == 0
    obj_r = ref.get_objective(rsol)
    # both ε-optimal at their achieved eps: objectives within n*(ε1+ε2)
    tol = n * (float(solution.eps) + float(rsol.eps)) + 1e-6
    assert abs(obj_h - obj_r) <= tol, ("hybrid-vs-ladder", vseed, obj_h,
                                       obj_r, tol)
    return 1


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(987_654 + base)
    deadline = time.time() + 60 * minutes
    counts = {"batched": 0, "stream": 0, "big": 0, "rect": 0,
              "hybrid": 0, "sparse": 0}
    it = 0
    while time.time() < deadline:
        it += 1
        t0 = time.time()
        counts["batched"] += batched_cases(rng, it)
        counts["stream"] += stream_cases(rng, it)
        counts["sparse"] += sparse_batch_case(rng, it)
        counts["rect"] += rect_cases(rng, it)
        if it % 2 == 0:
            counts["big"] += big_single_case(rng, it)
        if it % 4 == 1:
            counts["hybrid"] += hybrid_case(rng, it)
        print(f"[{time.strftime('%H:%M:%S')}] iter {it} "
              f"({time.time() - t0:.1f}s): {counts}", flush=True)
    print(f"HW SOAK CLEAN: {counts} (production TPU paths vs oracle)")


if __name__ == "__main__":
    main()
