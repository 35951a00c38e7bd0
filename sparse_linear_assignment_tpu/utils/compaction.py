"""Host-side unassigned-list compaction (reference parity utility).

The reference keeps the Forward solver's unassigned-person list dense by
partitioning valid ids left of the ``I::MAX`` sentinels after every
round, updating the inverse position map in tandem
(``push_all_left``, reference ``src/symmetric.rs:471-508``; pinned by
``test_push_all_left``, ``src/symmetric.rs:516-524``).

On the TPU engines this data structure is unnecessary — a dense boolean
``unassigned`` mask replaces the compacted list because masked bids are
free on a vector machine (SURVEY §2 ledger; the device-side analogue of
the *role* is ``ops/prefix.py:compact_indices`` and the slot-list
invariant in ``ops/compact.py``).  This module provides the literal
host-side utility anyway so callers porting code from the reference
find the same function with the same contract, and so the reference's
unit test pins identical behavior here.
"""

from __future__ import annotations

import numpy as np


def push_all_left(data, mapper, num_ints: int, size: int) -> None:
    """Partition the valid ids of ``data`` left of the sentinels,
    in place, updating ``mapper`` in tandem.

    Contract (= reference ``push_all_left``, ``symmetric.rs:471-508``):

    - ``data`` holds ``num_ints`` valid ids and sentinel entries equal
      to the dtype's max value (``np.iinfo(data.dtype).max`` — the
      reference's ``I::max_value()`` / the package's ``UNASSIGNED`` for
      int32/uint32).
    - ``mapper[i]`` gives the position of id ``i`` in ``data`` and is
      kept consistent for every id that moves.
    - ``size`` bounds the right-hand scan exactly as in the reference
      (``right_track < size``); the right cursor starts at
      ``num_ints``.
    - Order of the surviving ids is not part of the contract, but the
      cursor walk is the reference's, so results match it exactly
      (e.g. ``[MAX, 1, 2, 3, MAX, MAX] -> [3, 1, 2, MAX, MAX, MAX]``).

    Both arrays must be mutable 1-D integer ndarrays of the same dtype;
    unsigned (u16/u32 — the reference's index types) and int32 (this
    package's device index type) all work.
    """
    data = np.asarray(data)
    mapper = np.asarray(mapper)
    if data.ndim != 1 or mapper.ndim != 1:
        raise ValueError("push_all_left expects 1-D arrays")
    if data.dtype != mapper.dtype:
        raise ValueError(
            f"data/mapper dtypes differ: {data.dtype} vs {mapper.dtype}"
        )
    if not np.issubdtype(data.dtype, np.integer):
        raise ValueError(f"integer arrays required, got {data.dtype}")
    sentinel = np.iinfo(data.dtype).max
    if num_ints == 0:
        return

    left = 0
    right = num_ints
    while left < num_ints:
        if data[left] == sentinel:
            while right < size and data[right] == sentinel:
                right += 1
            # mirrors the reference exactly: when the scan stops at
            # ``size`` the slot there is taken as-is (callers guarantee
            # a valid id is in range; the bound only limits the scan)
            i = data[right]
            data[left] = i
            data[right] = sentinel
            mapper[int(i)] = left
        left += 1
