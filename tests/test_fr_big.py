"""Streaming big-dense FR kernel (ops/pallas_fr_big.py) vs the XLA
forward-reverse rounds — state equivalence in interpret mode.

The kernel restructures ``fr_dense.fr_round`` (skip_certificate mode)
into a blocked streaming form: per-person top-2 merged across row
blocks, conflict resolution from broadcasts only.  Every reduction it
reorders is a max/min (order-independent in f32) and every arithmetic
op is elementwise-identical, so the state sequence must match the XLA
rounds exactly, not approximately.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sparse_linear_assignment_tpu.ops.fr_dense import fr_init, fr_round
from sparse_linear_assignment_tpu.ops.pallas_fr_big import fr_big_chunk
from sparse_linear_assignment_tpu.solution import UNASSIGNED


def _xla_rounds(vals_t, state, rounds):
    def body(s, _):
        return (
            fr_round(
                vals_t, s, jnp.float32(s.eps), jnp.float32(0.0),
                jnp.int32(10**9), skip_certificate=True,
            ),
            None,
        )

    state, _ = lax.scan(body, state, None, length=rounds)
    return state


def _assert_state_equal(a, b, what):
    for field in ("prices", "profits", "p2o", "o2p"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=f"{what}: {field}",
        )
    # once done, the XLA round keeps incrementing since_inc (a masked
    # no-op elsewhere) while the kernel's early exit stops — skip it then
    fields = ("forward_mode", "stall_k", "nits", "done")
    if not bool(np.asarray(a.done)):
        fields = fields + ("since_inc",)
    for field in fields:
        assert np.asarray(getattr(a, field)) == np.asarray(
            getattr(b, field)
        ), (what, field)


@pytest.mark.parametrize("n,bm", [(256, 128), (384, 64), (512, 128)])
def test_fr_big_matches_xla_rounds(n, bm):
    rng = np.random.default_rng(5)
    costs = rng.integers(1, 200, size=(n, n)).astype(np.float32)
    vals_t = jnp.asarray(-costs.T)  # [M objects, N persons], minimize
    eps = np.float32(1.0 / (n + 1))

    ref = fr_init(vals_t, eps)
    big = fr_init(vals_t, eps)
    total = 0
    for chunk in (7, 9, 48, 400):
        ref = _xla_rounds(vals_t, ref, chunk)
        big, _ = fr_big_chunk(vals_t, big, chunk, bm=bm, interpret=True)
        total += chunk
        _assert_state_equal(big, ref, f"after {total} rounds")
    while not bool(np.asarray(big.done)) and total < 6000:
        ref = _xla_rounds(vals_t, ref, 400)
        big, _ = fr_big_chunk(vals_t, big, 400, bm=bm, interpret=True)
        total += 400
        _assert_state_equal(big, ref, f"after {total} rounds")
    assert bool(np.asarray(big.done)), "instance should finish in budget"
    assert int(np.sum(np.asarray(big.p2o) == UNASSIGNED)) == 0


def test_big_single_routing(monkeypatch):
    """solve_batch routes small batches of big square f32 instances
    through the streaming kernel, one solve per instance (no-ladder,
    interpret mode on CPU)."""
    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_BIG_INTERPRET_ON_CPU", True)
    n = 1024
    rng = np.random.default_rng(3)
    costs = rng.integers(1, 1000, size=(2, n, n)).astype(np.float64)
    sol = batch_mod.solve_batch(costs, solver="fr", dtype=np.float32)
    assert int(sol.num_unassigned.sum()) == 0
    for bi in range(2):
        r, c = linear_sum_assignment(costs[bi])
        assert float(sol.objective[bi]) == costs[bi][r, c].sum()


@pytest.mark.parametrize("seed", [0, 3])
def test_fr_finish_native_scratch(seed):
    """The sequential forward-reverse engine (the big-single chain
    tail, engine.cpp:slap_fr_dense_finish) solves from an empty warm
    state — scipy-exact on integer costs with eps < 1/n."""
    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu.cpu_reference import (
        fr_dense_finish_cpu,
    )

    rng = np.random.default_rng(seed)
    n = 160
    costs = rng.integers(1, 1000, size=(n, n)).astype(np.float64)
    a = -costs  # minimize -> max profit
    eps = 1.0 / (n + 1)
    prices = np.zeros(n)
    profits = a.max(axis=1) - eps
    p2o = np.full(n, -1, np.int32)
    o2p = np.full(n, -1, np.int32)
    # sign=-1 + at=None: the native engine applies the sign in its
    # scans and builds the f32 transpose itself (the driver's form)
    rc, pops = fr_dense_finish_cpu(
        costs, None, eps, prices, profits, p2o, o2p, sign=-1.0
    )
    assert rc == 0 and pops > 0
    r, c = linear_sum_assignment(costs)
    assert costs[np.arange(n), p2o].sum() == costs[r, c].sum()
    # price-only eps-CS certificate at the target eps (exact f64 run)
    prof = a - prices[None, :]
    chosen = prof[np.arange(n), p2o]
    assert (chosen + 1e-9 >= prof.max(axis=1) - eps).all()


def test_fr_finish_native_warm_handoff():
    """Mid-solve handoff: run device FR rounds, convert the f32 state
    to the native engine's f64 warm form exactly as the driver does
    (assigned duals recomputed so pi + p = a), finish natively —
    scipy-exact, certificate within f32 eps rounding."""
    import jax

    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu.cpu_reference import (
        fr_dense_finish_cpu,
    )

    n = 128
    rng = np.random.default_rng(7)
    costs = rng.integers(1, 1000, size=(n, n)).astype(np.float64)
    a = -costs
    vals_t = jnp.asarray(a.T.astype(np.float32))
    eps32 = np.float32(1.0 / (n + 1))
    round1 = jax.jit(
        lambda s: fr_round(
            vals_t, s, eps32, jnp.float32(0.0), jnp.int32(10**9),
            skip_certificate=True,
        )
    )
    st = fr_init(vals_t, eps32)
    for _ in range(12):
        st = round1(st)
    p2o_dev = np.asarray(st.p2o)
    free = int((p2o_dev == UNASSIGNED).sum())
    assert 0 < free < n  # genuinely mid-solve

    eps = float(eps32)
    prices = np.asarray(st.prices).astype(np.float64)
    p2o = np.where(p2o_dev == UNASSIGNED, -1, p2o_dev).astype(np.int32)
    o2p = np.full(n, -1, np.int32)
    idx = np.arange(n, dtype=np.int32)
    assigned = p2o >= 0
    o2p[p2o[assigned]] = idx[assigned]
    profits = np.empty(n)
    profits[assigned] = a[idx[assigned], p2o[assigned]] - prices[p2o[assigned]]
    for i in idx[~assigned]:
        profits[i] = (a[i] - prices).max() - eps
    at = np.ascontiguousarray(a.T, dtype=np.float32)
    rc, pops = fr_dense_finish_cpu(a, at, eps, prices, profits, p2o, o2p)
    assert rc == 0
    r, c = linear_sum_assignment(costs)
    assert costs[np.arange(n), p2o].sum() == costs[r, c].sum()
    prof = a - prices[None, :]
    chosen = prof[np.arange(n), p2o]
    # entry state carries the device's f32 eps/price rounding (the f32
    # path's documented certificate) — the tail must not worsen it
    assert (chosen + 1e-3 >= prof.max(axis=1) - eps).all()


def test_big_single_maximize(monkeypatch):
    """maximize=True through the streaming big-single path (the sign
    handling happens in solve_batch's staging before the kernel)."""
    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_BIG_INTERPRET_ON_CPU", True)
    monkeypatch.setattr(batch_mod, "_BIG_MIN_ELEMS", 0)
    n = 256
    rng = np.random.default_rng(17)
    costs = rng.integers(1, 1000, size=(1, n, n)).astype(np.float64)
    sol = batch_mod.solve_batch(
        costs, solver="fr", dtype=np.float32, integer=False, maximize=True
    )
    assert int(sol.num_unassigned.sum()) == 0
    r, c = linear_sum_assignment(costs[0], maximize=True)
    assert float(sol.objective[0]) == costs[0][r, c].sum()


def test_fr_big_optimal_vs_scipy():
    from scipy.optimize import linear_sum_assignment

    n, bm = 256, 128
    rng = np.random.default_rng(11)
    costs = rng.integers(1, 1000, size=(n, n)).astype(np.float64)
    vals_t = jnp.asarray(-costs.T.astype(np.float32))
    state = fr_init(vals_t, np.float32(1.0 / (n + 1)))
    state, done = fr_big_chunk(vals_t, state, 2000, bm=bm, interpret=True)
    assert bool(np.asarray(done))
    p2o = np.asarray(state.p2o)
    got = costs[np.arange(n), p2o].sum()
    r, c = linear_sum_assignment(costs)
    assert got == costs[r, c].sum()  # integer costs, eps<1/n: exact


BIG_FUZZ_CASES = [
    # (seed, lo, hi, n, bm) — distributions the fixed-seed equivalence
    # test does not reach.  Kernel constraints: bm a power of two and
    # 2*bm | m (the fused halving trees + double-buffered DMA pairing).
    (201, 5, 6, 256, 128),      # ALL costs equal: maximal tie stress on
                                #   the fused lane-halving winner trees
    (202, 1, 10**6, 256, 64),   # wide f32 price/profit magnitudes
    (203, 1, 3, 384, 64),       # near-degenerate low entropy, 6 blocks
    (204, 1, 200, 512, 256),    # 2 big blocks, fresh seed
]


@pytest.mark.parametrize("seed,lo,hi,n,bm", BIG_FUZZ_CASES)
def test_fr_big_fuzz_equivalence(seed, lo, hi, n, bm):
    """Randomized sweep of the restructured streaming kernel (hoisted
    block predicates, carried cardinality, fused in-block top-2 and
    lane-axis trees): bit-equivalence to the XLA rounds across uneven
    chunk boundaries, then run to completion."""
    rng = np.random.default_rng(seed)
    costs = rng.integers(lo, hi, size=(n, n)).astype(np.float32)
    vals_t = jnp.asarray(-costs.T)
    eps = np.float32(1.0 / (n + 1))

    ref = fr_init(vals_t, eps)
    big = fr_init(vals_t, eps)
    total = 0
    for chunk in (5, 11, 64):
        ref = _xla_rounds(vals_t, ref, chunk)
        big, _ = fr_big_chunk(vals_t, big, chunk, bm=bm, interpret=True)
        total += chunk
        _assert_state_equal(big, ref, f"seed {seed} after {total} rounds")
    while not bool(np.asarray(big.done)) and total < 8000:
        ref = _xla_rounds(vals_t, ref, 400)
        big, _ = fr_big_chunk(vals_t, big, 400, bm=bm, interpret=True)
        total += 400
        _assert_state_equal(big, ref, f"seed {seed} after {total} rounds")
    assert bool(np.asarray(big.done)), f"seed {seed} unfinished at {total}"
    assert int(np.sum(np.asarray(big.p2o) == UNASSIGNED)) == 0
