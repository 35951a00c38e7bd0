"""Pallas multi-round FR kernel vs the XLA rounds (interpret mode).

The kernel must be bit-equivalent to ``fr_dense.fr_round`` with
``skip_certificate=True`` (same deterministic tie-breaks), since the
batch driver switches between them by backend/tiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu.ops.fr_dense import FRState, fr_round
from sparse_linear_assignment_tpu.ops.pallas_fr import fr_chunk_pallas


def _init_states(values_t, eps):
    b, m, n = values_t.shape
    dtype = values_t.dtype
    return FRState(
        prices=jnp.zeros((b, m), dtype),
        profits=jnp.max(values_t, axis=1),
        p2o=jnp.full((b, n), jnp.int32(2**31 - 1)),
        o2p=jnp.full((b, m), jnp.int32(2**31 - 1)),
        eps=jnp.full((b,), eps, dtype),
        forward_mode=jnp.ones((b,), bool),
        since_inc=jnp.zeros((b,), jnp.int32),
        stall_k=jnp.full((b,), 8, jnp.int32),
        nits=jnp.zeros((b,), jnp.int32),
        nreductions=jnp.zeros((b,), jnp.int32),
        optimal_found=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
    )


def _xla_rounds(values_t, states, target_eps, rounds):
    def one(vals_t, state):
        def body(s, _):
            return (
                fr_round(
                    vals_t, s, target_eps, np.float32(0.0),
                    jnp.int32(10**6), skip_certificate=True,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=rounds)
        return state

    return jax.vmap(one)(values_t, states)


@pytest.mark.parametrize("rounds", [1, 7, 40])
@pytest.mark.parametrize(
    "group,serial", [(1, 1), (2, 1), (4, 1), (1, 2), (1, 4), (2, 2)]
)
@pytest.mark.parametrize("mode", ["f32", "int"])
def test_kernel_matches_xla_rounds(rounds, group, serial, mode):
    rng = np.random.default_rng(5)
    b, n = 4, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    if mode == "int":
        # integer-auction lattice: costs scaled by (n+1), eps = 1; the
        # kernel's packed-key trees must match the XLA sentinel rounds
        # bit-for-bit
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.int32) * (n + 1)
        )
        eps = np.int32(1)
    else:
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.float32)
        )
        eps = np.float32(1.0 / n)
    s0 = _init_states(values_t, eps)

    want = _xla_rounds(values_t, s0, eps, rounds)
    got, _ = fr_chunk_pallas(values_t, s0, rounds, interpret=True,
                             group=group, serial=serial)

    np.testing.assert_array_equal(np.asarray(got.p2o), np.asarray(want.p2o))
    np.testing.assert_array_equal(np.asarray(got.o2p), np.asarray(want.o2p))
    np.testing.assert_array_equal(
        np.asarray(got.done), np.asarray(want.done)
    )
    np.testing.assert_array_equal(
        np.asarray(got.forward_mode), np.asarray(want.forward_mode)
    )
    np.testing.assert_array_equal(
        np.asarray(got.nits), np.asarray(want.nits)
    )
    np.testing.assert_array_equal(
        np.asarray(got.since_inc), np.asarray(want.since_inc)
    )
    np.testing.assert_array_equal(
        np.asarray(got.stall_k), np.asarray(want.stall_k)
    )
    np.testing.assert_allclose(
        np.asarray(got.prices), np.asarray(want.prices), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(got.profits), np.asarray(want.profits), rtol=0, atol=0
    )


@pytest.mark.parametrize("rounds", [7, 40])
@pytest.mark.parametrize("fused", [0, 1])
@pytest.mark.parametrize("mode", ["f32", "int"])
@pytest.mark.parametrize("n", [128, 256])
def test_kernel_fused_top2_matches(rounds, fused, mode, n):
    """The pairwise-halving fused top-2 trees (int: best+second packed;
    f32: best+argbest+second and the fused winner pair) must be
    bit-identical to the serial-tree paths, including the
    smallest-index tie rule (the low-entropy integer costs here produce
    many exact profit ties).  n=256 exercises at least one lane-halving
    stage (128 is the tail width — zero stages)."""
    rng = np.random.default_rng(11)
    b = 4
    # values in [1, 8): dense exact ties to stress the index tie rule
    costs = rng.integers(1, 8, size=(b, n, n)).astype(np.float64)
    if mode == "int":
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.int32) * (n + 1)
        )
        eps = np.int32(1)
    else:
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.float32)
        )
        eps = np.float32(1.0 / n)
    s0 = _init_states(values_t, eps)
    want = _xla_rounds(values_t, s0, eps, rounds)
    got, _ = fr_chunk_pallas(values_t, s0, rounds, interpret=True,
                             fused_top2=fused)
    np.testing.assert_array_equal(np.asarray(got.p2o), np.asarray(want.p2o))
    np.testing.assert_array_equal(np.asarray(got.o2p), np.asarray(want.o2p))
    np.testing.assert_array_equal(
        np.asarray(got.prices), np.asarray(want.prices)
    )
    np.testing.assert_array_equal(
        np.asarray(got.nits), np.asarray(want.nits)
    )
    np.testing.assert_array_equal(
        np.asarray(got.done), np.asarray(want.done)
    )


@pytest.mark.parametrize("mode", ["f32", "int"])
def test_kernel_chunk_boundary_roundtrip(mode):
    """Split 40 rounds into 7 + 33 across two chunk calls: the state
    crossing the wrapper boundary mid-solve (mixed forward/reverse
    modes across the batch) must round-trip the pre-orientation packing
    exactly — same result as one 40-round call and as the XLA rounds."""
    rng = np.random.default_rng(13)
    b, n = 4, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    if mode == "int":
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.int32) * (n + 1)
        )
        eps = np.int32(1)
    else:
        values_t = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
        eps = np.float32(1.0 / n)
    s0 = _init_states(values_t, eps)
    want = _xla_rounds(values_t, s0, eps, 40)
    mid, _ = fr_chunk_pallas(values_t, s0, 7, interpret=True)
    # the boundary state must actually mix modes, else the reverse
    # orientation packing is not exercised (7 rounds of FR on these
    # instances flips at least one instance into reverse mode)
    modes = np.asarray(mid.forward_mode)
    assert not modes.all(), "boundary state is all-forward; pick rounds"
    got, _ = fr_chunk_pallas(values_t, mid, 33, interpret=True)
    for f in ("p2o", "o2p", "prices", "profits", "nits", "done",
              "forward_mode", "since_inc", "stall_k"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
            err_msg=f,
        )


def test_fused_top2_guard_non_pow2():
    """Forcing the fused tree on a non-power-of-two size must raise
    (the halving loop would silently drop rows); auto must fall back."""
    rng = np.random.default_rng(12)
    b, n = 2, 192
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    values_t = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
    eps = np.float32(1.0 / n)
    s0 = _init_states(values_t, eps)
    with pytest.raises(ValueError, match="power-of-two"):
        fr_chunk_pallas(values_t, s0, 4, interpret=True, fused_top2=1)
    want = _xla_rounds(values_t, s0, eps, 8)
    got, _ = fr_chunk_pallas(values_t, s0, 8, interpret=True)  # auto
    np.testing.assert_array_equal(np.asarray(got.p2o), np.asarray(want.p2o))
    np.testing.assert_array_equal(
        np.asarray(got.prices), np.asarray(want.prices)
    )


def test_kernel_solves_to_optimum_interpret():
    rng = np.random.default_rng(6)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    values_t = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
    eps = np.float32(1.0 / (n + 1))
    states = _init_states(values_t, eps)
    for _ in range(40):  # chunks of 16 rounds
        states, alldone = fr_chunk_pallas(values_t, states, 16,
                                          interpret=True)
        if bool(alldone):
            break
    assert bool(alldone)
    p2o = np.asarray(states.p2o)
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = costs[bi][r, c].sum()
        got = costs[bi][np.arange(n), p2o[bi]].sum()
        assert abs(got - want) < 1e-6, (bi, got, want)


def test_kernel_solves_to_optimum_interpret_int():
    """Integer-auction mode end-to-end in interpret mode: scaled int32
    costs, eps=1 (== 1/(n+1) in original units, inside the n·eps < 1
    exactness bound) must reach the exact scipy optimum."""
    rng = np.random.default_rng(11)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    values_t = jnp.asarray(
        np.swapaxes(-costs, 1, 2).astype(np.int32) * (n + 1)
    )
    states = _init_states(values_t, np.int32(1))
    for _ in range(40):  # chunks of 16 rounds
        states, alldone = fr_chunk_pallas(values_t, states, 16,
                                          interpret=True)
        if bool(alldone):
            break
    assert bool(alldone)
    p2o = np.asarray(states.p2o)
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = costs[bi][r, c].sum()
        got = costs[bi][np.arange(n), p2o[bi]].sum()
        assert abs(got - want) < 1e-6, (bi, got, want)


def test_fused_deep_budget_interpret():
    """The one-dispatch fused solve (single deep budget since round 4,
    experiments/exp_single_deep.py) must finish instances a short
    budget leaves unfinished, exactly, with no host round-trip."""
    rng = np.random.default_rng(9)
    b, n = 8, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    values_t = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
    eps = np.float32(1.0 / (n + 1))
    s0 = _init_states(values_t, eps)

    # a main budget short enough that some instances stay undone
    short, _ = fr_chunk_pallas(values_t, s0, 48, interpret=True)
    assert not bool(jnp.all(short.done)), "budget too generous for test"

    states, _ = fr_chunk_pallas(values_t, s0, 1024, interpret=True)
    done = np.asarray(states.done)
    p2o = np.asarray(states.p2o)
    assert done.all(), "deep budget must finish every instance"
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = costs[bi][r, c].sum()
        got = costs[bi][np.arange(n), p2o[bi]].sum()
        assert abs(got - want) < 1e-6, (bi, got, want)


def test_resolve_fused_top2_kill_switch(monkeypatch):
    """SLAP_TPU_NO_FUSED_TOP2=1 must force the serial-tree path on
    auto while leaving explicit requests untouched (the runtime escape
    hatch if a toolchain change stops lowering the halving slices)."""
    from sparse_linear_assignment_tpu.ops.pallas_fr import (
        _resolve_fused_top2,
    )

    monkeypatch.delenv("SLAP_TPU_NO_FUSED_TOP2", raising=False)
    assert _resolve_fused_top2(-1, 256, 256) == 1
    assert _resolve_fused_top2(-1, 192, 192) == 0  # non-pow2 auto-off
    assert _resolve_fused_top2(-1, 256, 128) == 0  # non-square auto-off
    monkeypatch.setenv("SLAP_TPU_NO_FUSED_TOP2", "1")
    assert _resolve_fused_top2(-1, 256, 256) == 0
    # the kill switch gates only AUTO; explicit opt-in/out is preserved
    assert _resolve_fused_top2(1, 256, 256) == 1
    assert _resolve_fused_top2(0, 256, 256) == 0


FUZZ_CASES = [
    # (seed, mode, lo, hi) — value distributions the fixed-seed
    # equivalence tests above do not reach
    (101, "int", 1, 16_000),   # near the 2^31 packed-key bound at n=128
    (102, "int", 1, 16_000),   #   (8*(C*D + n+1)*2^ceil(log2 n) < 2^31,
    (103, "f32", 1, 10**6),    #    D = n+1 = 129 -> C < ~16.2k)
    (104, "f32", 1, 10**6),    # wide f32 range: price/profit magnitudes
    (105, "int", 5, 6),        # ALL costs equal: every profit tied,
    (106, "f32", 5, 6),        #   maximal stress on the index tie rule
    (107, "int", 1, 3),        # near-degenerate low-entropy lattice
    (108, "f32", 1, 100),      # baseline range, fresh seeds
]


@pytest.mark.parametrize("seed,mode,lo,hi", FUZZ_CASES)
def test_kernel_fuzz_equivalence_and_optimum(seed, mode, lo, hi):
    """Randomized sweep: the fused-tree kernel must stay bit-equivalent
    to the XLA rounds over 48 rounds (mode switches, stall preemption
    and done-freezing included) AND reach the exact scipy optimum when
    run to completion — across value distributions the fixed-seed tests
    above never reach (near-packing-bound lattices, wide f32 ranges,
    all-equal costs)."""
    rng = np.random.default_rng(seed)
    b, n = 3, 128
    costs = rng.integers(lo, hi, size=(b, n, n)).astype(np.float64)
    if mode == "int":
        values_t = jnp.asarray(
            np.swapaxes(-costs, 1, 2).astype(np.int32) * (n + 1)
        )
        eps = np.int32(1)
        assert 8 * (hi * (n + 1) + n + 1) * (2 ** 7) < 2**31  # gate bound
    else:
        values_t = jnp.asarray(np.swapaxes(-costs, 1, 2).astype(np.float32))
        eps = np.float32(1.0 / (n + 1))
    s0 = _init_states(values_t, eps)

    # bit-equivalence over a fixed 48-round window
    want = _xla_rounds(values_t, s0, eps, 48)
    got, _ = fr_chunk_pallas(values_t, s0, 48, interpret=True)
    for field in ("p2o", "o2p", "prices", "profits", "nits", "done",
                  "forward_mode", "since_inc", "stall_k"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(want, field)),
            err_msg=f"field {field} diverged (seed={seed} mode={mode})",
        )

    # completion + exactness: integer costs with eps = 1/(n+1) in
    # original units sit strictly inside the n*eps < 1 exactness bound
    states, alldone = got, False
    for _ in range(80):
        states, alldone = fr_chunk_pallas(values_t, states, 32,
                                          interpret=True)
        if bool(alldone):
            break
    assert bool(alldone), f"not done (seed={seed} mode={mode})"
    p2o = np.asarray(states.p2o)
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want_obj = costs[bi][r, c].sum()
        got_obj = costs[bi][np.arange(n), p2o[bi]].sum()
        # f32 at hi=1e6 loses exactness to rounding; bound by n*rounding
        tol = 1e-6 if (mode == "int" or hi <= 2**20) else n * hi * 2e-7
        assert abs(got_obj - want_obj) <= tol, (bi, got_obj, want_obj)
