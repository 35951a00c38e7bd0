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
        del row_capacity, column_capacity  # capacity hints are a no-op here
        return cls(
            person_to_object=np.zeros(0, dtype=INDEX_DTYPE),
            object_to_person=np.zeros(0, dtype=INDEX_DTYPE),
            num_unassigned=UNASSIGNED,
            eps=math.nan,
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
