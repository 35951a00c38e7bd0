"""Direct property tests for the pairwise-halving fused reductions
(`ops/pallas_fr._top2_rows / _top2_rows_f32 / _top2_lanes`), which the
VMEM and streaming kernels share.  The kernel equivalence suites cover
them in situ; these pin the helpers' contracts — values, smallest-index
tie rule, second-over-positions semantics — against naive references on
adversarial inputs (dense ties, -inf columns, single row)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sparse_linear_assignment_tpu.ops.pallas_fr import (
    _top2_lanes,
    _top2_rows,
    _top2_rows_f32,
)

SENT = np.int32(-(2**31) + 1)


def naive_top2_rows(key):
    """Best and second-best key per column over distinct positions."""
    srt = np.sort(key, axis=0)
    return srt[-1:], srt[-2:-1] if key.shape[0] > 1 else np.full_like(
        srt[-1:], SENT
    )


@pytest.mark.parametrize("m", [1, 2, 8, 64, 256])
def test_top2_rows_matches_sort(m):
    rng = np.random.default_rng(3)
    # small value range forces many exact ties; keys stay unique via
    # the index low bits like the kernel's packing
    n = 128
    sh = 8
    vals = rng.integers(-40, 40, size=(m, n)).astype(np.int32)
    j = np.arange(m, dtype=np.int32)[:, None] * np.ones((1, n), np.int32)
    key = (vals << sh) | (np.int32(255) - j)
    b, s = _top2_rows(jnp.asarray(key), SENT)
    nb, ns = naive_top2_rows(key)
    np.testing.assert_array_equal(np.asarray(b), nb)
    np.testing.assert_array_equal(np.asarray(s), ns)


@pytest.mark.parametrize("m", [1, 2, 16, 128])
def test_top2_rows_f32_tie_rule(m):
    rng = np.random.default_rng(4)
    n = 128
    profit = rng.integers(0, 4, size=(m, n)).astype(np.float32)
    if m >= 3:
        profit[m // 2, :] = profit[0, :]  # engineered cross-stride ties
    j_iota = np.broadcast_to(
        np.arange(m, dtype=np.int32)[:, None], (m, n)
    ).copy()
    b, bj, s = _top2_rows_f32(
        jnp.asarray(profit), jnp.asarray(j_iota), np.float32(-np.inf)
    )
    best = profit.max(axis=0, keepdims=True)
    arg = profit.argmax(axis=0)[None, :]  # numpy argmax = first max
    np.testing.assert_array_equal(np.asarray(b), best)
    np.testing.assert_array_equal(np.asarray(bj), arg.astype(np.int32))
    masked = profit.copy()
    masked[arg[0], np.arange(n)] = -np.inf
    second = masked.max(axis=0, keepdims=True) if m > 1 else np.full(
        (1, n), -np.inf, np.float32
    )
    np.testing.assert_array_equal(np.asarray(s), second)


@pytest.mark.parametrize("n", [128, 256, 384, 1024])
@pytest.mark.parametrize("want_second", [True, False])
def test_top2_lanes_matches_naive(n, want_second):
    rng = np.random.default_rng(5)
    m = 16
    x = rng.integers(0, 5, size=(m, n)).astype(np.float32)
    x[3, :] = -np.inf  # an all--inf row: arg is still well-defined
    u = np.broadcast_to(np.arange(n, dtype=np.int32)[None, :], (m, n)).copy()
    b, arg, s = _top2_lanes(
        jnp.asarray(x), jnp.asarray(u), np.float32(-np.inf),
        want_second=want_second,
    )
    best = x.max(axis=1, keepdims=True)
    first = x.argmax(axis=1)[:, None].astype(np.int32)
    np.testing.assert_array_equal(np.asarray(b), best)
    np.testing.assert_array_equal(np.asarray(arg), first)
    if want_second:
        masked = x.copy()
        masked[np.arange(m), first[:, 0]] = -np.inf
        np.testing.assert_array_equal(
            np.asarray(s), masked.max(axis=1, keepdims=True)
        )
    else:
        assert s is None
