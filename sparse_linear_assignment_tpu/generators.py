"""Seeded random problem generators.

Same *semantics* as the reference's bench generators
(`/root/reference/benches/benchmark.rs:16-79`) — NumPy RNG streams instead
of Rust's ChaCha8, so instances are reproducible here but not bit-identical
to the Rust crate's (objectives are therefore checked against an
independent optimal oracle, not against the Rust RNG-dependent constants).
"""

from __future__ import annotations

import numpy as np


def gen_symmetric_input(
    solver,
    seed: int,
    size: int,
    density: float,
    min_value: float,
    max_value: float,
    value_seed=None,
) -> None:
    """Bernoulli(density) square instance with a shuffled *ensured* perfect
    matching (`benchmark.rs:16-47`), values U[min_value, max_value).

    ``value_seed`` (default: ``seed``) decouples the value stream from
    the arc-structure stream: a fixed ``seed`` with varying
    ``value_seed`` fuzzes costs while keeping the padded device shapes
    (max row/column degree) — and therefore the compiled-program cache —
    fixed."""
    val_rng = np.random.default_rng(
        seed if value_seed is None else value_seed
    )
    filter_rng = np.random.default_rng(seed + 1)

    ensured = filter_rng.permutation(size)
    solver.init(size, size)
    # per-row draws in row order define the seeded instance; rows are
    # collected and ingested in ONE bulk extend_from_csr (identical
    # instance, without n Python-level per-row append calls)
    row_cols = []
    row_vals = []
    if size <= 4096:
        keep = filter_rng.random((size, size)) < density
        keep[np.arange(size), ensured] = True
        for i in range(size):
            cols = np.nonzero(keep[i])[0]
            row_cols.append(cols)
            row_vals.append(
                val_rng.uniform(min_value, max_value, size=cols.shape[0])
            )
    else:
        # large instances: fully vectorized — per-row arc counts
        # Binomial(size, density), positions drawn with replacement and
        # deduped via a sorted (row, col) key (collision probability
        # ~density per draw, so the realized count distribution is
        # Binomial thinned by ~density^2 — indistinguishable at the
        # densities used here; same distribution family, different
        # stream than the O(size^2) Bernoulli sweep, exactly like the
        # per-row-choice variant this replaces).  The per-row Python
        # loop it replaces was the headline bench's dominant setup cost
        # (~2.3 s at n=1e5; this path runs in ~60 ms).
        n_extra = filter_rng.binomial(size, density, size=size)
        total = int(n_extra.sum())
        row_ids = np.repeat(np.arange(size, dtype=np.int64), n_extra)
        flat_cols = filter_rng.integers(0, size, size=total, dtype=np.int64)
        row_ids = np.concatenate(
            [row_ids, np.arange(size, dtype=np.int64)]
        )
        flat_cols = np.concatenate([flat_cols, ensured.astype(np.int64)])
        key = np.unique(row_ids * np.int64(size) + flat_cols)
        j_counts = np.bincount(key // size, minlength=size)
        solver.extend_from_csr(
            j_counts,
            key % size,
            val_rng.uniform(min_value, max_value, size=key.shape[0]),
        )
        return
    if row_cols:
        solver.extend_from_csr(
            [c.shape[0] for c in row_cols],
            np.concatenate(row_cols),
            np.concatenate(row_vals),
        )


def gen_asymmetric_input(
    solver,
    seed: int,
    num_of_people: int,
    num_of_objects: int,
    arcs_per_person: int,
    min_value: float,
    range_width: float,
) -> None:
    """k-regular sparse instance: ``arcs_per_person`` distinct objects per
    person, Beta(3,3)-distributed integer-floored values scaled to
    [min_value, min_value + range_width) (`benchmark.rs:49-79`)."""
    val_rng = np.random.default_rng(seed)
    filter_rng = np.random.default_rng(seed + 1)

    solver.init(num_of_people, num_of_objects)
    row_cols = []
    row_vals = []
    for i in range(num_of_people):
        cols = np.sort(
            filter_rng.choice(num_of_objects, size=arcs_per_person, replace=False)
        )
        vals = np.floor(
            range_width * val_rng.beta(3.0, 3.0, size=arcs_per_person)
            + min_value
        )
        row_cols.append(cols)
        row_vals.append(vals)
    if row_cols:
        solver.extend_from_csr(
            np.full(num_of_people, arcs_per_person),
            np.concatenate(row_cols),
            np.concatenate(row_vals),
        )


def gen_ksparse_uniform(
    solver,
    seed: int,
    num_rows: int,
    num_cols: int,
    arcs_per_person: int,
    max_value: float,
) -> None:
    """Uniform-value k-sparse instance (the generic test fixture,
    `solver.rs:261-292`)."""
    val_rng = np.random.default_rng(seed)
    filter_rng = np.random.default_rng(seed + 1)

    solver.init(num_rows, num_cols)
    row_cols = []
    row_vals = []
    for i in range(num_rows):
        cols = np.sort(
            filter_rng.choice(num_cols, size=arcs_per_person, replace=False)
        )
        row_cols.append(cols)
        row_vals.append(val_rng.uniform(0.0, max_value, size=arcs_per_person))
    if row_cols:
        solver.extend_from_csr(
            np.full(num_rows, arcs_per_person),
            np.concatenate(row_cols),
            np.concatenate(row_vals),
        )


def dense_cost_matrix(solver, big: float = 1e9,
                      original_units: bool = False) -> np.ndarray:
    """Densify the solver's CSR into a full matrix with ``big`` for missing
    arcs — for oracle (scipy) cross-checks.

    ``original_units=True`` undoes the in-place sign flip that a
    minimize/maximize ``solve`` may have applied to the stored values
    (`solver.rs:214-216`; the same ``values[0]``-sign rule
    ``get_objective`` uses, `solver.rs:111-115`), so the returned arcs
    are always in the caller's original cost units regardless of solve
    history.  Only real arcs are corrected; the ``big`` fill is left
    untouched.
    """
    mat = np.full((solver.num_rows, solver.num_cols), big, dtype=np.float64)
    counts = solver.j_counts.astype(np.int64)
    cols = solver.column_indices.astype(np.int64)
    vals = solver.values
    if original_units and vals.size and vals[0] < 0:
        vals = -vals
    rows = np.repeat(np.arange(solver.num_rows, dtype=np.int64), counts)
    mat[rows, cols] = vals
    return mat


def gen_batch_ksparse(
    seed: int,
    b: int,
    n: int,
    m: int,
    k: int,
    min_value: float = 300.0,
    range_width: float = 700.0,
):
    """Batched k-regular sparse instances for :func:`solve_batch_sparse`:
    ``columns[B, N, K]`` (k distinct objects per person, sorted) and
    ``values[B, N, K]`` (Beta(3,3) integer-floored, scaled to
    [min_value, min_value + range_width) — the reference's asymmetric
    bench value distribution, `benchmark.rs:49-79`, batched).

    Vectorized: a Python per-row ``rng.choice`` loop at B·N ~ 10^6 rows
    costs minutes; argpartition over chunked random keys samples every
    row's k distinct columns at memory-bandwidth speed.
    """
    val_rng = np.random.default_rng(seed)
    filter_rng = np.random.default_rng(seed + 1)
    cols = np.empty((b, n, k), dtype=np.int32)
    chunk = max(1, (1 << 27) // max(1, n * m))  # ~512 MB f32 keys/chunk
    for s in range(0, b, chunk):
        e = min(b, s + chunk)
        keys = filter_rng.random((e - s, n, m), dtype=np.float32)
        part = np.argpartition(keys, k - 1, axis=2)[:, :, :k]
        cols[s:e] = np.sort(part, axis=2).astype(np.int32)
    vals = np.floor(
        range_width * val_rng.beta(3.0, 3.0, size=(b, n, k)) + min_value
    )
    return cols, vals
