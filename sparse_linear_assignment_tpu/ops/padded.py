"""Padded dual-layout (CSR + CSC) device representation of a sparse LAP.

The reference stores arcs in a flat CSR triple and scans rows sequentially
(`/root/reference/src/solver.rs:23-38`).  The TPU-native layout is different
in two deliberate ways:

1. **Person-major padded CSR, transposed to ``[K, N]``** — persons live on
   the 128-wide lane axis, the (small) per-person arc slots live on the
   sublane axis, so the per-person top-2 profit reduction is ``K`` vector
   ops over ``N``-wide registers.

2. **Object-major padded CSC ``[Kc, M]``** — the *transposed* graph.  Bid
   conflict resolution (the reference's scatter-max,
   `/root/reference/src/symmetric.rs:386-405`) becomes a *gather* of each
   object's incident persons' bids followed by a masked max over the
   sublane axis.  This eliminates every scatter from the solve loop; XLA
   TPU scatters serialize on duplicate indices while gathers vectorize.

Both layouts are built host-side in NumPy once per solve and shipped to
HBM; everything afterwards runs inside one ``lax.while_loop`` under jit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..solution import INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
class PaddedProblem:
    """Fixed-shape device arrays describing one LAP instance.

    Attributes
    ----------
    row_cols : int32[K, N]   column index of arc slot a of person u (pad: 0)
    row_vals : f[K, N]       arc value (pad: 0, masked)
    row_mask : bool[K, N]    validity of the arc slot
    col_persons : int32[Kc, M]  person indices incident to object j (pad: 0)
    col_mask : bool[Kc, M]
    row_cols_t / row_vals_t / row_mask_t : [N, K] transposes of the
        person-major arrays.  Compacted rounds gather whole person rows;
        a leading-axis (embedding-style) gather ``x_t[ids]`` is the fast,
        compile-friendly path on this TPU backend, while the equivalent
        lane-axis gather ``x[:, ids]`` sends its compiler into
        multi-minute blowups.

    Degree-split arrays (present when ``k_max > 8`` — ``None``
    otherwise): every per-arc gather costs ~8 ns/element on this
    backend and rectangular padding to ``k_max`` inflates the arc count
    (2.24× on the n=1e5 headline, k_max 22 vs mean 6), so full-scan
    rounds use the first 8 arc slots of every person
    (``row_cols8/row_vals8/row_mask8 [8, N]``) plus an overflow block
    holding only the arcs beyond 8 of the few high-degree persons
    (``ovf_person [V]``, ``ovf_cols/ovf_vals/ovf_mask [k_max−8, V]``);
    per-person top-2 results merge exactly (base slots precede overflow
    slots in row order, so first-maximum tie-breaks are preserved).
    """

    def __init__(self, row_cols, row_vals, row_mask, col_persons, col_mask,
                 row_cols_t=None, row_vals_t=None, row_mask_t=None,
                 row_cols8=None, row_vals8=None, row_mask8=None,
                 ovf_person=None, ovf_cols=None, ovf_vals=None,
                 ovf_mask=None):
        self.row_cols = row_cols
        self.row_vals = row_vals
        self.row_mask = row_mask
        self.col_persons = col_persons
        self.col_mask = col_mask
        self.row_cols_t = row_cols_t
        self.row_vals_t = row_vals_t
        self.row_mask_t = row_mask_t
        self.row_cols8 = row_cols8
        self.row_vals8 = row_vals8
        self.row_mask8 = row_mask8
        self.ovf_person = ovf_person
        self.ovf_cols = ovf_cols
        self.ovf_vals = ovf_vals
        self.ovf_mask = ovf_mask

    @property
    def dtype(self):
        return self.row_vals.dtype

    @property
    def num_rows(self) -> int:
        return self.row_cols.shape[1]

    @property
    def num_cols(self) -> int:
        return self.col_persons.shape[1]

    def tree_flatten(self):
        children = (
            self.row_cols,
            self.row_vals,
            self.row_mask,
            self.col_persons,
            self.col_mask,
            self.row_cols_t,
            self.row_vals_t,
            self.row_mask_t,
            self.row_cols8,
            self.row_vals8,
            self.row_mask8,
            self.ovf_person,
            self.ovf_cols,
            self.ovf_vals,
            self.ovf_mask,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux: Any, children):
        del aux
        return cls(*children)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_padded_problem(
    num_rows: int,
    num_cols: int,
    j_counts: np.ndarray,
    column_indices: np.ndarray,
    values: np.ndarray,
    dtype=np.float32,
    k_pad_multiple: int = 1,
    to_device: bool = True,
) -> PaddedProblem:
    """Convert host CSR (reference layout, `solver.rs:41-106`) into the
    dual padded layout.  Pure NumPy; with ``to_device`` the arrays ship
    to HBM once (host-driven solve loops would otherwise re-transfer
    per dispatch); ``to_device=False`` keeps NumPy for batch stacking.
    """
    counts = np.asarray(j_counts, dtype=np.int64)
    cols = np.asarray(column_indices, dtype=np.int64)
    vals = np.asarray(values)
    nnz = cols.shape[0]
    assert counts.sum() == nnz

    k_max = int(counts.max()) if counts.size else 1
    k_max = max(1, _round_up(k_max, k_pad_multiple))

    row_of_arc = np.repeat(np.arange(num_rows, dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos_in_row = np.arange(nnz, dtype=np.int64) - starts[row_of_arc]

    row_cols = np.zeros((k_max, num_rows), dtype=INDEX_DTYPE)
    row_vals = np.zeros((k_max, num_rows), dtype=dtype)
    row_mask = np.zeros((k_max, num_rows), dtype=bool)
    row_cols[pos_in_row, row_of_arc] = cols
    row_vals[pos_in_row, row_of_arc] = vals.astype(dtype)
    row_mask[pos_in_row, row_of_arc] = True

    # Transposed (object-major) incidence for gather-only conflict resolution.
    in_counts = np.bincount(cols, minlength=num_cols).astype(np.int64)
    kc_max = int(in_counts.max()) if in_counts.size else 1
    kc_max = max(1, _round_up(kc_max, k_pad_multiple))

    order = np.argsort(cols, kind="stable")
    col_sorted = cols[order]
    person_sorted = row_of_arc[order]
    col_starts = np.concatenate([[0], np.cumsum(in_counts)])[:-1]
    pos_in_col = np.arange(nnz, dtype=np.int64) - col_starts[col_sorted]

    col_persons = np.zeros((kc_max, num_cols), dtype=INDEX_DTYPE)
    col_mask = np.zeros((kc_max, num_cols), dtype=bool)
    col_persons[pos_in_col, col_sorted] = person_sorted
    col_mask[pos_in_col, col_sorted] = True

    # degree-split arrays (see class docstring) when padding is wasteful
    split = {}
    if k_max > 8:
        ovf = np.nonzero(counts > 8)[0]
        if ovf.size:
            split = dict(
                row_cols8=row_cols[:8],
                row_vals8=row_vals[:8],
                row_mask8=row_mask[:8],
                ovf_person=ovf.astype(INDEX_DTYPE),
                ovf_cols=np.ascontiguousarray(row_cols[8:, ovf]),
                ovf_vals=np.ascontiguousarray(row_vals[8:, ovf]),
                ovf_mask=np.ascontiguousarray(row_mask[8:, ovf]),
            )

    problem = PaddedProblem(
        row_cols=row_cols,
        row_vals=row_vals,
        row_mask=row_mask,
        col_persons=col_persons,
        col_mask=col_mask,
        row_cols_t=np.ascontiguousarray(row_cols.T),
        row_vals_t=np.ascontiguousarray(row_vals.T),
        row_mask_t=np.ascontiguousarray(row_mask.T),
        **split,
    )
    if not to_device:
        return problem
    # ship to the device once — host-driven solve loops dispatch many
    # small programs against these arrays, and leaving them as NumPy
    # would re-transfer the whole problem on every dispatch
    return jax.tree_util.tree_map(jnp.asarray, problem)
