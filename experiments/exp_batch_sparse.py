"""Hardware characterization of the batched SPARSE mode (VERDICT r4
item 1): the reference's own k-regular domain (`ksparse.rs:9-19`),
batched — previously zero hardware numbers.

Per config: stage the densified problem once (criterion setup/measure
split, `benchmark.rs:111-125`), time the dense-engine solve (first call
= compile exposure, then repeats), report inst/s + nits distribution;
native sequential extrapolation from a subsample (solve-only walls
through the C++ engine, the per-instance column the VERDICT prescribes);
scipy-oracle spot checks.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/exp_batch_sparse.py [quick]
"""

import sys
import time

import numpy as np

from sparse_linear_assignment_tpu import KhoslaSolver
from sparse_linear_assignment_tpu.batch import (
    _sparse_solve_staged,
    _sparse_stage_dense,
)
from sparse_linear_assignment_tpu.cpu_reference import khosla_solve_cpu
from sparse_linear_assignment_tpu.generators import gen_batch_ksparse

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"

CONFIGS = [
    # (B, n, m, k)
    (4096, 128, 512, 8),
    (4096, 128, 1024, 8),
    (2048, 256, 1024, 8),
    (1024, 256, 2048, 8),
]
if QUICK:
    CONFIGS = [(512, 128, 512, 8)]

REPEATS = 3
NATIVE_SAMPLE = 32


def native_extrapolation(columns, values, m, eps, sample):
    """Median per-instance solve wall of the sequential C++ engine ×
    B (build excluded — capacity-hint reuse, README.md:27-29)."""
    b, n, k = columns.shape
    solver, _ = KhoslaSolver.new(n, m, n * k)
    walls = []
    nits_all = []
    for bi in range(sample):
        solver.init(n, m)
        mask = columns[bi] >= 0
        counts = mask.sum(axis=1)
        solver.extend_from_csr(
            counts, columns[bi][mask].astype(np.int64), values[bi][mask]
        )
        t0 = time.perf_counter()
        sol, nits = khosla_solve_cpu(solver, eps=eps)
        walls.append(time.perf_counter() - t0)
        nits_all.append(nits)
        assert sol.num_unassigned == 0, (bi, sol.num_unassigned)
    med = sorted(walls)[len(walls) // 2]
    return med, float(np.mean(nits_all))


def main():
    from scipy.optimize import linear_sum_assignment as lsa

    for (b, n, m, k) in CONFIGS:
        eps = 1.0 / m
        t0 = time.perf_counter()
        columns, values = gen_batch_ksparse(1234 + b, b, n, m, k)
        t_gen = time.perf_counter() - t0
        work = -values  # minimize
        arc_mask = columns >= 0
        w_lo = work.reshape(b, -1).min(axis=1)
        w_hi = work.reshape(b, -1).max(axis=1)
        thresholds = (m / 2.0) * (w_hi - w_lo + eps)

        t0 = time.perf_counter()
        st = _sparse_stage_dense(
            columns, values, arc_mask, work, m, eps, thresholds,
            np.float32,
        )
        st.values_t.block_until_ready()
        t_stage = time.perf_counter() - t0
        # person-major (kernel route) planes are [B, N, M']
        mp = st.values_t.shape[2 if st.person_major else 1]
        print(
            f"== B={b} n={n} m={m} k={k}: gen {t_gen:.1f}s, "
            f"densified M'={mp} ({mp / (n * k):.2f}x arcs, "
            f"{b * mp * n * 4 / 1e9:.2f} GB), stage {t_stage:.1f}s",
            flush=True,
        )

        t0 = time.perf_counter()
        sol = _sparse_solve_staged(st, 10_000_000, 16)
        t_first = time.perf_counter() - t0
        walls = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            sol = _sparse_solve_staged(st, 10_000_000, 16)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        nits = sol.nits
        print(
            f"   dense engine: first {t_first:.2f}s, repeats "
            + "/".join(f"{w:.3f}s" for w in walls)
            + f" -> best {b / best:.0f} inst/s; nits mean {nits.mean():.1f} "
            f"p50 {np.percentile(nits, 50):.0f} p99 "
            f"{np.percentile(nits, 99):.0f} max {nits.max()}; "
            f"unassigned {int(sol.num_unassigned.sum())}",
            flush=True,
        )

        # oracle spot checks (integer lattice + eps < 1/n: exact)
        for bi in (0, b // 2, b - 1):
            full = np.full((n, m), 1e9)
            for i in range(n):
                full[i, columns[bi, i]] = values[bi, i]
            r, c = lsa(full)
            want = full[r, c].sum()
            assert sol.objective[bi] == want, (bi, sol.objective[bi], want)
        print("   oracle exact on 3 spot checks", flush=True)

        med, nits_cpu = native_extrapolation(
            columns, values, m, eps, NATIVE_SAMPLE
        )
        native_rate = 1.0 / med
        print(
            f"   native sequential: {med * 1e6:.0f} us/inst median "
            f"(~{nits_cpu:.0f} pops) -> {native_rate:.0f} inst/s "
            f"extrapolated; TPU/native = {(b / best) / native_rate:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
