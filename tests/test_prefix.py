"""MXU-native prefix sum / compaction unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from sparse_linear_assignment_tpu.ops.prefix import compact_indices, prefix_sum


@pytest.mark.parametrize("n", [1, 7, 128, 129, 1000, 16384, 100_000])
def test_prefix_sum_matches_numpy(n):
    rng = np.random.default_rng(n)
    mask = rng.random(n) < 0.3
    got = np.asarray(prefix_sum(jnp.asarray(mask)))
    want = np.cumsum(mask).astype(np.int32)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,size", [(1000, 256), (1000, 2048), (100_000, 4096)])
def test_compact_indices(n, size):
    rng = np.random.default_rng(size)
    mask = rng.random(n) < 0.05
    ids, count = compact_indices(jnp.asarray(mask), size)
    want = np.nonzero(mask)[0]
    assert int(count) == len(want)
    take = min(size, len(want))
    np.testing.assert_array_equal(np.asarray(ids)[:take], want[:take])
