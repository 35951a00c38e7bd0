"""Solution object and index conventions.

TPU-native analogue of the reference's data model
(``/root/reference/src/solution.rs:4-54``): the reference is generic over
``u16``/``u32`` index types with ``I::max_value()`` as the "unassigned"
sentinel.  On TPU the native index type is ``int32``; we keep the same
public contract with ``UNASSIGNED == 2**31 - 1`` (``INT32_MAX``) playing the
role of ``u32::MAX``.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# Sentinel marking unassigned people/objects (reference: I::max_value(),
# /root/reference/src/solution.rs:27-34).  int32 is the TPU-native index type.
UNASSIGNED: int = np.iinfo(np.int32).max

INDEX_DTYPE = np.int32


def unassigned_value(index_dtype=INDEX_DTYPE) -> int:
    """The UNASSIGNED sentinel for an index dtype — the reference's
    ``I::max_value()`` convention (``solution.rs:27-34``): ``2**31 - 1``
    for int32, ``65535`` for uint16, ``2**32 - 1`` for uint32."""
    return int(np.iinfo(np.dtype(index_dtype)).max)


def convert_indices(arr: np.ndarray, index_dtype) -> np.ndarray:
    """Convert an int32 assignment array to another index width,
    remapping the ``UNASSIGNED`` sentinel to the target dtype's
    ``max_value()`` — the TPU-native form of the reference's
    ``UnsignedInt`` u16/u32 genericity (``solution.rs:4-17``).

    Device compute always runs int32 (the TPU-native index type; the
    batched readback already travels u16-packed on the wire); narrower
    widths are a host-storage concern, so the width choice is this
    explicit O(n) conversion rather than a type parameter.  Raises
    ``ValueError`` if a real index does not fit (sentinel excluded)."""
    dt = np.dtype(index_dtype)
    arr = np.asarray(arr)
    sent = unassigned_value(dt)
    real = arr != UNASSIGNED
    if real.any():
        hi = int(arr[real].max())
        lo = int(arr[real].min())
        if hi >= sent or lo < 0:
            raise ValueError(
                f"index {hi if hi >= sent else lo} does not fit "
                f"{dt.name} (sentinel {sent})"
            )
    return np.where(real, arr, sent).astype(dt)


@dataclasses.dataclass
class AuctionSolution:
    """Result of a linear assignment solve.

    Mirrors ``AuctionSolution<I>`` (``/root/reference/src/solution.rs:22-54``):

    - ``person_to_object[i]`` — object owned by person ``i`` (``UNASSIGNED``
      if person ``i`` has no object).
    - ``object_to_person[j]`` — person owning object ``j`` (``UNASSIGNED``
      if unowned).
    - ``num_unassigned`` — number of unassigned people (perfect matching
      iff 0).
    - ``eps`` — the ε at which the solution was found; ε-optimal if a
      perfect matching exists.
    """

    person_to_object: np.ndarray
    object_to_person: np.ndarray
    num_unassigned: int
    eps: float

    @classmethod
    def new(cls, row_capacity: int = 0, column_capacity: int = 0) -> "AuctionSolution":
        """Fresh solution in the reference's initial state
        (``solution.rs:46-53``): empty assignment vectors,
        ``num_unassigned`` at the sentinel, ``eps = NaN``."""
        # Capacity hints are deliberately unused HERE: the assignment
        # arrays are rebuilt by init_solve per solve (~50 us at n=1e5 —
        # noise), and reusing buffers in place would mutate results a
        # caller holds from a previous solve (warm starts pass
        # solver.prices back in; see solver.init_solve).  The hints DO
        # preallocate the solver-side CSR storage (solver.rs:9-13
        # parity), where reallocation was measurable.
        del row_capacity, column_capacity
        return cls(
            person_to_object=np.zeros(0, dtype=INDEX_DTYPE),
            object_to_person=np.zeros(0, dtype=INDEX_DTYPE),
            num_unassigned=UNASSIGNED,
            eps=math.nan,
        )

    def astype_index(self, index_dtype) -> "AuctionSolution":
        """A copy with both assignment arrays in another index width
        (u16/u32 — the reference's ``AuctionSolution<I>`` genericity,
        ``solution.rs:4-17``), sentinel remapped to the target dtype's
        ``max_value()``.  See :func:`convert_indices`."""
        return AuctionSolution(
            person_to_object=convert_indices(
                self.person_to_object, index_dtype
            ),
            object_to_person=convert_indices(
                self.object_to_person, index_dtype
            ),
            num_unassigned=self.num_unassigned,
            eps=self.eps,
        )


def o2p_from_p2o(p2o: np.ndarray, num_cols: int) -> np.ndarray:
    """Reconstruct object→person from person→object host-side (the
    matching is injective on assigned pairs, so the inverse is exact).
    Accepts ``[N]`` or batched ``[B, N]``; unmatched objects get the
    ``UNASSIGNED`` sentinel.  Used instead of reading o2p back from the
    device — a second readback costs full tunnel latency."""
    p2o = np.asarray(p2o)
    batched = p2o.ndim == 2
    p2o2 = p2o if batched else p2o[None, :]
    o2p = np.full((p2o2.shape[0], num_cols), UNASSIGNED, dtype=np.int32)
    rows, cols = np.nonzero(p2o2 != UNASSIGNED)
    o2p[rows, p2o2[rows, cols]] = cols
    return o2p if batched else o2p[0]
