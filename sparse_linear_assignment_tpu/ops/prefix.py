"""MXU-native prefix sums and stream compaction.

``jnp.nonzero`` / ``jnp.cumsum`` lower to reduce-window prefix scans that
this TPU backend compiles pathologically (hundreds of seconds, multi-GB
compile RSS, scoped-VMEM overflows).  A prefix sum is just a triangular
matrix product, and the MXU eats those: reshape to ``[B, 128]`` lanes,
multiply by a constant upper-triangular ones matrix for the intra-block
inclusive scan, then scan the ``[B]`` block totals the same way.  Exact in
float32 for counts < 2^24.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

_LANE = 128


def _triu_ones(k: int, dtype) -> jnp.ndarray:
    """Upper-triangular ones (inclusive scan operator): out = x @ T."""
    return jnp.asarray(np.triu(np.ones((k, k))), dtype)


def prefix_sum(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a boolean/int 1-D array via MXU matmuls.

    Returns int32 of the same length.  Supports lengths up to
    ``128 * 128 * 128`` (~2M) with two levels of blocking.
    """
    n = mask.shape[0]
    b = -(-n // _LANE)
    padded = b * _LANE
    x = jnp.zeros(padded, jnp.float32).at[:n].set(mask.astype(jnp.float32))
    x = x.reshape(b, _LANE)
    tri = _triu_ones(_LANE, jnp.float32)
    intra = jnp.dot(x, tri, preferred_element_type=jnp.float32)  # [B, 128]
    totals = intra[:, -1]  # [B]

    if b <= _LANE * _LANE:
        # scan block totals with the same trick (one or two more levels)
        b2 = -(-b // _LANE)
        t = jnp.zeros(b2 * _LANE, jnp.float32).at[:b].set(totals)
        t = t.reshape(b2, _LANE)
        intra2 = jnp.dot(t, tri, preferred_element_type=jnp.float32)
        totals2 = intra2[:, -1]
        tri2 = _triu_ones(b2, jnp.float32)
        off2 = jnp.dot(totals2[None, :], tri2,
                       preferred_element_type=jnp.float32)[0] - totals2
        block_incl = (intra2 + off2[:, None]).reshape(-1)[:b]  # [B] inclusive
    else:  # pragma: no cover - beyond supported size
        raise ValueError("prefix_sum supports lengths up to ~2M")

    block_excl = block_incl - totals  # exclusive offsets per block
    out = (intra + block_excl[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def compact_indices(mask: jnp.ndarray, size: int):
    """Indices of the first ``size`` True positions (padded with 0) plus
    the total True count — a gather-light replacement for
    ``jnp.nonzero(mask, size=size)``.
    """
    n = mask.shape[0]
    pos = prefix_sum(mask)  # inclusive; pos[i]-1 = slot of i when mask[i]
    count = pos[n - 1] if n > 0 else jnp.int32(0)
    slot = pos - 1
    in_set = mask & (slot < size)
    person = lax.broadcasted_iota(jnp.int32, (n,), 0)
    scat = jnp.where(in_set, slot, size)
    ids = jnp.zeros(size + 1, jnp.int32).at[scat].set(person)[:size]
    return ids, count
