"""Randomized cross-engine consistency sweep (CPU, bounded wall clock).

Solves a stream of random small instances through every public engine
combination and checks each result against the scipy oracle (or the
infeasibility contract).  Run when a structural change lands to flush
out cross-engine disagreements the fixed-seed suite can miss.

Usage: python experiments/exp_consistency_sweep.py [minutes] [--sharded]
(--sharded adds the 8-virtual-device mesh engines to the rotation)
"""

import os
import sys
import time

import numpy as np

if "--sharded" in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # outage-safe

from scipy.optimize import linear_sum_assignment  # noqa: E402

from sparse_linear_assignment_tpu import (  # noqa: E402
    ForwardAuctionSolver,
    KhoslaSolver,
)
from sparse_linear_assignment_tpu.generators import (  # noqa: E402
    dense_cost_matrix,
    gen_ksparse_uniform,
    gen_symmetric_input,
)

BIG = 1e9


def oracle(solver, maximize):
    mat = dense_cost_matrix(solver, big=BIG if not maximize else -BIG,
                            original_units=True)
    r, c = linear_sum_assignment(mat, maximize=maximize)
    picked = mat[r, c]
    if np.any(np.abs(picked) >= BIG / 2):
        return None  # oracle forced a missing arc: not perfectly matchable
    return float(picked.sum())


def check(tag, solver, solution, maximize, want, n):
    got = solver.get_objective(solution)
    eps = solution.eps if np.isfinite(solution.eps) else 0.0
    if want is None:
        # infeasible as a perfect matching: engines must report >= 1
        # unassigned (Khosla drop rule / Forward max_iterations)
        assert solution.num_unassigned >= 1, (
            tag, "expected unassigned", solution.num_unassigned)
        return
    assert solution.num_unassigned == 0, (tag, solution.num_unassigned)
    # ε-CS slack: a minimize solve may be up to n·eps ABOVE the optimum
    # (and never below it); a maximize solve up to n·eps BELOW
    if maximize:
        lo, hi = want - n * eps - 1e-5, want + 1e-5
    else:
        lo, hi = want - 1e-5, want + n * eps + 1e-5
    assert lo <= got <= hi, (tag, got, want, eps)


def khosla_cases(rng, case_seed):
    n = int(rng.integers(8, 96))
    asym = bool(rng.integers(0, 2))
    m = n + int(rng.integers(1, 40)) if asym else n
    k = int(rng.integers(2, min(9, m)))
    maximize = bool(rng.integers(0, 2))
    f32 = bool(rng.integers(0, 2))
    solver, solution = KhoslaSolver.new(n, m, n * (k + 8))
    if asym or bool(rng.integers(0, 2)):
        gen_ksparse_uniform(solver, case_seed, n, m, k, max_value=50.0)
    else:
        gen_symmetric_input(solver, case_seed, n, min(1.0, 3.0 * k / n),
                            1.0, 50.0)
    if f32:
        solver.dtype = np.dtype(np.float32)
    want = oracle(solver, maximize)
    engines = [("native", dict(engine="native")),
               ("device", dict(engine="device")),
               ("auto", dict())]
    if not asym:
        engines += [("scaled", dict(scale_eps=True)),
                    ("hybrid", dict(scale_eps=True, hybrid=True))]
    for name, kw in engines:
        solver.solve(solution, maximize, **kw)
        check(f"khosla/{name}/s{case_seed}", solver, solution,
              maximize, want, n)
    # warm-start reuse on symmetric instances
    if not asym and want is not None:
        warm = solver.prices.copy()
        solver.solve(solution, maximize, start_prices=warm)
        check(f"khosla/warm/s{case_seed}", solver, solution,
              maximize, want, n)
    return 1


def forward_cases(rng, case_seed):
    n = int(rng.integers(8, 96))
    k = int(rng.integers(2, min(9, n)))
    maximize = bool(rng.integers(0, 2))
    solver, solution = ForwardAuctionSolver.new(n, n, n * (k + 8))
    gen_ksparse_uniform(solver, case_seed, n, n, k, max_value=50.0)
    want = oracle(solver, maximize)
    solver.solve(solution, maximize)
    if want is None:
        assert solution.num_unassigned >= 1 or not solver.optimal_soln_found
    else:
        check(f"forward/default/s{case_seed}", solver, solution,
              maximize, want, n)
        solver.solve_with_params(solution, maximize, eps=1.0 / (2 * n))
        check(f"forward/params/s{case_seed}", solver, solution,
              maximize, want, n)
    return 1


def batch_cases(rng, case_seed):
    from sparse_linear_assignment_tpu.batch import solve_batch

    b = int(rng.integers(2, 5))
    n = 128
    maximize = bool(rng.integers(0, 2))
    costs = rng.integers(1, 200, size=(b, n, n)).astype(np.float64)
    sols = {}
    sols["fr"] = solve_batch(costs, solver="fr", dtype=np.float32,
                             eps=1.0 / (n + 1), maximize=maximize)
    sols["forward"] = solve_batch(costs, solver="forward",
                                  dtype=np.float32, eps=1.0 / (n + 1),
                                  maximize=maximize)
    sols["khosla"] = solve_batch(costs, solver="khosla",
                                 dtype=np.float32, eps=1.0 / (n + 1),
                                 maximize=maximize)
    for name, sol in sols.items():
        assert int(sol.num_unassigned.sum()) == 0, (name, case_seed)
        for bi in range(b):
            r, c = linear_sum_assignment(costs[bi], maximize=maximize)
            want = float(costs[bi][r, c].sum())
            got = float(sol.objective[bi])
            assert abs(got - want) < 1e-6, (name, case_seed, bi, got, want)
    return 1


def batch_sparse_cases(rng, case_seed):
    """Batched k-sparse Khosla (the reference's own domain, vmapped) vs
    the densified scipy oracle, feasible + infeasible members mixed."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    b = int(rng.integers(2, 5))
    n = int(rng.integers(8, 48))
    m = n + int(rng.integers(0, 16))
    k = int(rng.integers(2, 6))
    cols = np.full((b, n, k), -1, np.int64)
    vals = np.zeros((b, n, k), np.float64)
    for bi in range(b):
        for i in range(n):
            deg = int(rng.integers(1, k + 1))
            cols[bi, i, :deg] = rng.choice(m, size=deg, replace=False)
            vals[bi, i, :deg] = rng.uniform(1.0, 50.0, size=deg)
    import sparse_linear_assignment_tpu.batch as batch_mod

    # rotate all three engines: padded gathers, densified XLA rounds,
    # and (every third case) the fused Mosaic kernel in interpret mode
    pick = case_seed % 3
    if pick == 2 and n % 8 == 0:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
        try:
            sol = solve_batch_sparse(
                cols, vals, m, eps=0.5 / m, engine="dense"
            )
        finally:
            batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    else:
        sol = solve_batch_sparse(
            cols, vals, m, eps=0.5 / m,
            engine="dense" if pick == 1 else "padded",
        )
    for bi in range(b):
        dense = np.full((n, m), BIG)
        for i in range(n):
            live = cols[bi, i] >= 0
            dense[i, cols[bi, i][live]] = vals[bi, i][live]
        r, c = linear_sum_assignment(dense)
        feasible = not np.any(dense[r, c] >= BIG / 2)
        unass = int(sol.num_unassigned[bi])
        if feasible:
            assert unass == 0, (case_seed, bi, unass)
            want = float(dense[r, c].sum())
            got = float(sol.objective[bi])
            assert want - 1e-6 <= got <= want + n * 0.5 / m + 1e-6, (
                case_seed, bi, got, want)
        else:
            assert unass >= 1, (case_seed, bi)
    return 1


def sharded_cases(rng, case_seed, mesh):
    """Sharded engines on the virtual mesh: khosla (person-sharded),
    data-parallel batched FR, object-sharded dense FR single."""
    from sparse_linear_assignment_tpu.parallel import (
        solve_batch_sharded,
        solve_fr_dense_sharded,
        solve_sharded_khosla,
    )

    n = int(rng.integers(16, 80))
    m = n + int(rng.integers(0, 40))
    k = int(rng.integers(2, 7))
    seed = int(rng.integers(0, 10**9))
    solver, _ = KhoslaSolver.new(n, m, n * (k + 8))
    gen_ksparse_uniform(solver, seed, n, m, k, max_value=50.0)
    mat = dense_cost_matrix(solver, big=BIG, original_units=True)
    r, c = linear_sum_assignment(mat)
    feasible = not np.any(mat[r, c] >= BIG / 2)
    sol, _nits = solve_sharded_khosla(solver, mesh)
    if feasible:
        assert sol.num_unassigned == 0, ("sh-khosla", seed)
        got = solver.get_objective(sol)
        want = float(mat[r, c].sum())
        assert want - 1e-9 <= got <= want + n * sol.eps + 1e-9, (
            seed, got, want)
    else:
        assert sol.num_unassigned >= 1, ("sh-khosla-inf", seed)

    b = int(rng.integers(2, 12))
    nb = 128
    costs = rng.integers(1, 200, size=(b, nb, nb)).astype(np.float64)
    bs = solve_batch_sharded(costs, mesh, eps=1.0 / (nb + 1))
    assert int(np.asarray(bs.num_unassigned).sum()) == 0, ("sh-batch",
                                                           case_seed)
    bi = int(rng.integers(0, b))
    r, c = linear_sum_assignment(costs[bi])
    assert abs(float(bs.objective[bi])
               - float(costs[bi][r, c].sum())) < 1e-6

    nd = int(rng.integers(3, 10)) * 8
    dcosts = rng.integers(1, 100, size=(nd, nd)).astype(np.float64)
    _p2o, _o2p, unass, _dn, obj = solve_fr_dense_sharded(
        dcosts, mesh, chunk=16)
    assert unass == 0
    r, c = linear_sum_assignment(dcosts)
    assert abs(obj - float(dcosts[r, c].sum())) <= 1.0 + 1e-6
    return 1


def main():
    args = [a for a in sys.argv[1:] if a != "--sharded"]
    minutes = float(args[0]) if args else 10.0
    base = int(args[1]) if len(args) > 1 else 0  # fresh base => new cases
    mesh = None
    if "--sharded" in sys.argv:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("shard",))
    deadline = time.time() + 60 * minutes
    rng = np.random.default_rng(12345 + base)
    counts = {"khosla": 0, "forward": 0, "batch": 0, "sparse": 0,
              "sharded": 0}
    case_seed = base
    while time.time() < deadline:
        case_seed += 1
        counts["khosla"] += khosla_cases(rng, case_seed)
        counts["forward"] += forward_cases(rng, case_seed)
        if case_seed % 8 == 0:
            counts["batch"] += batch_cases(rng, case_seed)
        if case_seed % 4 == 0:
            counts["sparse"] += batch_sparse_cases(rng, case_seed)
        if mesh is not None:
            counts["sharded"] += sharded_cases(rng, case_seed, mesh)
        if case_seed % 25 == 0:
            # Random shapes compile fresh executables every case; each
            # holds several JIT code mappings, and the process dies at
            # vm.max_map_count (65530, ~150 cases: mmap ENOMEM surfaces
            # as "LLVM compilation error: Cannot allocate memory" with
            # 127 GB free — measured 2026-08-19, ~335 maps/case).
            # Dropping the compiled-program caches unmaps them; the
            # persistent XLA:CPU AOT cache keeps recompiles cheap.
            jax.clear_caches()
            try:
                with open(f"/proc/{os.getpid()}/maps") as f:
                    nmaps = sum(1 for _ in f)
            except OSError:
                nmaps = -1
            print(f"[{time.strftime('%H:%M:%S')}] cases: {counts} "
                  f"(maps: {nmaps})", flush=True)
    print(f"SWEEP CLEAN: {counts} (every engine vs scipy oracle)")


if __name__ == "__main__":
    main()
