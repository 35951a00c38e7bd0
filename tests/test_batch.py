"""Batched (vmapped) solve tests — the TPU-native capability the
sequential reference cannot express (SURVEY.md §2)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sparse_linear_assignment_tpu import UNASSIGNED
from sparse_linear_assignment_tpu.batch import BatchedLAP, solve_batch


def oracle_batch(costs, maximize=False):
    out = []
    for mat in costs:
        r, c = linear_sum_assignment(mat, maximize=maximize)
        out.append(mat[r, c].sum())
    return np.array(out)


@pytest.mark.parametrize("solver", ["forward", "khosla", "fr"])
@pytest.mark.parametrize("maximize", [False, True])
def test_batch_dense_vs_oracle(solver, maximize):
    rng = np.random.default_rng(0)
    b, n = 8, 16
    costs = rng.uniform(1.0, 10.0, size=(b, n, n))
    sol = solve_batch(costs, maximize=maximize, solver=solver,
                      dtype=np.float64)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs, maximize)
    gap = n * np.maximum(sol.eps, 0)
    if maximize:
        assert np.all(sol.objective <= want + 1e-9)
        assert np.all(sol.objective >= want - gap - 1e-9)
    else:
        assert np.all(sol.objective >= want - 1e-9)
        assert np.all(sol.objective <= want + gap + 1e-9)


@pytest.mark.parametrize("solver", ["forward", "khosla", "fr"])
def test_batch_integer_exact(solver):
    rng = np.random.default_rng(1)
    b, n = 6, 12
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    sol = solve_batch(costs, solver=solver, dtype=np.float64,
                      eps=1.0 / (n + 1))
    want = oracle_batch(costs)
    assert np.all(sol.num_unassigned == 0)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)


@pytest.mark.parametrize("solver", ["forward", "khosla", "fr"])
def test_batch_float32_path(solver):
    rng = np.random.default_rng(2)
    b, n = 4, 32
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    sol = solve_batch(costs, solver=solver, dtype=np.float32)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    # float32 + default eps: epsilon-optimal
    gap = n * np.maximum(sol.eps, 1.0 / n)
    assert np.all(sol.objective <= want + gap + 1e-3)


def test_batch_asymmetric():
    rng = np.random.default_rng(3)
    b, n, m = 5, 8, 20
    costs = rng.uniform(0.0, 10.0, size=(b, n, m))
    sol = solve_batch(costs, solver="forward", dtype=np.float64)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    gap = n * np.maximum(sol.eps, 0)
    assert np.all(sol.objective >= want - 1e-9)
    assert np.all(sol.objective <= want + gap + 1e-9)
    # inverse consistency
    for bi in range(b):
        p2o = sol.person_to_object[bi]
        for i, j in enumerate(p2o):
            if j != UNASSIGNED:
                assert sol.object_to_person[bi, j] == i


def test_batched_lap_reuse():
    lap = BatchedLAP(batch=3, num_rows=10, num_cols=10, solver="khosla",
                     dtype=np.float64)
    rng = np.random.default_rng(4)
    for _ in range(2):
        costs = rng.uniform(1, 5, size=(3, 10, 10))
        sol = lap.solve(costs)
        assert np.all(sol.num_unassigned == 0)
        want = oracle_batch(costs)
        assert np.all(sol.objective <= want + 10 * sol.eps + 1e-9)
    with pytest.raises(ValueError):
        lap.solve(np.zeros((2, 10, 10)))


def test_batch_input_validation():
    with pytest.raises(ValueError):
        solve_batch(np.zeros((4, 4)))
    with pytest.raises(ValueError):
        solve_batch(np.zeros((1, 5, 4)))


def test_batch_fr_asymmetric_falls_back():
    # fr on N != M must transparently use the forward engine
    rng = np.random.default_rng(7)
    b, n, m = 3, 8, 16
    costs = rng.uniform(0.0, 10.0, size=(b, n, m))
    sol = solve_batch(costs, solver="fr", dtype=np.float64)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    gap = n * np.maximum(sol.eps, 0)
    assert np.all(sol.objective >= want - 1e-9)
    assert np.all(sol.objective <= want + gap + 1e-9)


def test_batch_fr_integer_exact_large():
    # the fr engine runs at the target eps directly (no ladder); with
    # integer costs and eps < 1/n the result is the exact optimum
    rng = np.random.default_rng(8)
    b, n = 4, 64
    costs = rng.integers(1, 1000, size=(b, n, n)).astype(np.float64)
    sol = solve_batch(costs, solver="fr", dtype=np.float64)
    want = oracle_batch(costs)
    assert np.all(sol.num_unassigned == 0)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)
    # inverse consistency (fr maintains o2p exactly, unlike keep-valid)
    for bi in range(b):
        for i, j in enumerate(sol.person_to_object[bi]):
            assert sol.object_to_person[bi, j] == i


def test_batch_sparse_khosla_vs_oracle():
    """Batched k-sparse mode (the reference's own domain, vmapped):
    assignments must be eps-optimal vs the densified scipy oracle."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    rng = np.random.default_rng(12)
    b, n, m, k = 6, 24, 48, 5
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    values = rng.uniform(1.0, 10.0, size=(b, n, k))

    sol = solve_batch_sparse(columns, values, m, eps=0.5 / n)
    assert np.all(sol.num_unassigned == 0)
    for bi in range(b):
        dense = np.full((n, m), 1e9)
        for i in range(n):
            dense[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(dense)
        want = dense[r, c].sum()
        assert sol.objective[bi] >= want - 1e-9
        assert sol.objective[bi] <= want + n * sol.eps[bi] + 1e-6
        # chosen columns must be real arcs
        for i, j in enumerate(sol.person_to_object[bi]):
            assert j in columns[bi, i]
            assert sol.object_to_person[bi, j] == i


def test_batch_sparse_infeasible_and_padding():
    """Variable arc counts (−1 padding) and an infeasible instance:
    the drop rule must terminate it with exactly one person unassigned."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    # instance 0: feasible; instance 1: two persons share one object
    columns = np.array([
        [[0, 1], [1, -1]],
        [[0, -1], [0, -1]],
    ], dtype=np.int32)
    values = np.array([
        [[1.0, 2.0], [3.0, 0.0]],
        [[1.0, 0.0], [2.0, 0.0]],
    ])
    sol = solve_batch_sparse(columns, values, 2, eps=0.25)
    assert sol.num_unassigned[0] == 0
    assert sol.num_unassigned[1] == 1
    assert abs(sol.objective[0] - (1.0 + 3.0)) < 1e-9


def test_batched_lap_stage_and_device_costs():
    import jax

    lap = BatchedLAP(batch=2, num_rows=16, num_cols=16, solver="fr",
                     dtype=np.float32)
    rng = np.random.default_rng(9)
    costs = rng.integers(1, 50, size=(2, 16, 16)).astype(np.float64)
    dev = lap.stage(costs)
    assert isinstance(dev, jax.Array)
    sol = lap.solve(costs, costs_device=dev)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)


def test_solve_batch_device_resident_mode():
    """costs=None + costs_device: the solve never touches host costs —
    objective is evaluated on device and stragglers finish on device
    (the zero-ingress production path)."""
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

    from sparse_linear_assignment_tpu.batch import solve_batch

    rng = np.random.default_rng(21)
    costs = rng.integers(1, 100, size=(3, 32, 32)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    sol = solve_batch(None, solver="fr", dtype=np.float32,
                      eps=1.0 / 33, costs_device=dev)
    assert int(sol.num_unassigned.sum()) == 0
    for b in range(3):
        r, c = linear_sum_assignment(costs[b])
        want = float(costs[b][r, c].sum())
        assert abs(float(sol.objective[b]) - want) < 1e-6, (b,)

    # maximize in device mode
    solmax = solve_batch(None, solver="fr", maximize=True,
                         dtype=np.float32, eps=1.0 / 33, costs_device=dev)
    for b in range(3):
        r, c = linear_sum_assignment(-costs[b])
        want = float(costs[b][r, c].sum())
        assert abs(float(solmax.objective[b]) - want) < 1e-6, (b,)


def test_solve_batch_device_mode_validation():
    from sparse_linear_assignment_tpu.batch import solve_batch

    with pytest.raises(ValueError, match="costs"):
        solve_batch(None)
    import jax.numpy as jnp

    dev = jnp.zeros((2, 8, 8), np.float32)
    with pytest.raises(ValueError, match="solver='fr'"):
        solve_batch(None, solver="forward", costs_device=dev)


def test_batch_integer_auction_mode_exact():
    """Auto-detected integer-auction mode (scaled-int32 lattice, packed
    selection keys): exact optimum, lattice eps reported."""
    rng = np.random.default_rng(31)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    sol = solve_batch(costs, solver="fr")
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)
    # the lattice eps: scale = n + 1 when no eps was requested
    np.testing.assert_allclose(sol.eps, 1.0 / (n + 1))
    for bi in range(b):
        for i, j in enumerate(sol.person_to_object[bi]):
            assert sol.object_to_person[bi, j] == i


def test_batch_integer_auction_maximize_and_opt_out():
    rng = np.random.default_rng(32)
    b, n = 2, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    want = oracle_batch(costs, maximize=True)
    sol = solve_batch(costs, solver="fr", maximize=True)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)
    # integer=False forces the float path; same exact optimum
    solf = solve_batch(costs, solver="fr", maximize=True, integer=False)
    np.testing.assert_allclose(solf.objective, want, atol=1e-9)
    assert not np.allclose(solf.eps, sol.eps)  # float path: eps = 1/n


def test_batch_integer_auction_eps_lattice():
    """A caller eps that is not a unit fraction rounds to the next
    finer lattice (D = ceil(1/eps)); sol.eps reports 1/D."""
    rng = np.random.default_rng(33)
    b, n = 2, 128
    costs = rng.integers(1, 50, size=(b, n, n)).astype(np.float64)
    sol = solve_batch(costs, solver="fr", eps=0.003)
    assert np.allclose(sol.eps, 1.0 / 334)
    want = oracle_batch(costs)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)


def test_batch_integer_device_mode():
    """Device-resident + integer=True (max_cost mandatory): the exact
    device-evaluated objective comes back in original units."""
    import jax.numpy as jnp

    rng = np.random.default_rng(34)
    b, n = 2, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    with pytest.raises(ValueError, match="max_cost"):
        solve_batch(None, solver="fr", costs_device=dev, integer=True)
    sol = solve_batch(None, solver="fr", costs_device=dev,
                      integer=True, max_cost=100)
    assert np.all(sol.num_unassigned == 0)
    want = oracle_batch(costs)
    np.testing.assert_allclose(sol.objective, want, atol=1e-9)


def test_integer_scale_gating():
    """The mode only engages where the packed keys are exact and the
    fused-kernel layout applies."""
    from sparse_linear_assignment_tpu.batch import _integer_scale

    ints = np.ones((2, 128, 128))
    # engaged: square, 128-aligned, integral
    assert _integer_scale(ints, None, 128, 128, None, None) == 129
    # non-square / misaligned / oversized: float path
    assert _integer_scale(ints, None, 128, 256, None, None) is None
    assert _integer_scale(ints, None, 100, 100, None, None) is None
    assert _integer_scale(ints, None, 2048, 2048, None, None) is None
    # fractional costs: float path
    fr = np.full((2, 128, 128), 1.5)
    assert _integer_scale(fr, None, 128, 128, None, None) is None
    # key-range overflow (c * scale * 2^sh too big): float path
    big = np.full((2, 128, 128), 1e6)
    assert _integer_scale(big, None, 128, 128, None, None) is None
    # device-resident (costs=None) engages only on explicit opt-in
    assert _integer_scale(None, None, 128, 128, None, None) is None
    assert _integer_scale(None, None, 128, 128, True, 100) == 129
    with pytest.raises(ValueError, match="max_cost"):
        _integer_scale(None, None, 128, 128, True, None)


def test_index_width_conversion():
    """u16/u32 index-width option (`solution.rs:4-17`): sentinel
    remapped to the target dtype's max, range-validated, on both the
    single-instance and batched solution objects."""
    from sparse_linear_assignment_tpu import (
        UNASSIGNED,
        AuctionSolution,
        convert_indices,
        unassigned_value,
    )

    assert unassigned_value(np.uint16) == 0xFFFF
    assert unassigned_value(np.uint32) == 2**32 - 1
    assert unassigned_value() == UNASSIGNED

    arr = np.array([0, 5, 65534, UNASSIGNED], np.int32)
    u16 = convert_indices(arr, np.uint16)
    assert u16.dtype == np.uint16
    np.testing.assert_array_equal(u16, [0, 5, 65534, 0xFFFF])
    with pytest.raises(ValueError, match="does not fit"):
        convert_indices(np.array([65535], np.int32), np.uint16)

    sol = AuctionSolution(
        person_to_object=np.array([1, UNASSIGNED], np.int32),
        object_to_person=np.array([UNASSIGNED, 0], np.int32),
        num_unassigned=1,
        eps=0.5,
    )
    s16 = sol.astype_index(np.uint16)
    np.testing.assert_array_equal(s16.person_to_object, [1, 0xFFFF])
    np.testing.assert_array_equal(s16.object_to_person, [0xFFFF, 0])
    assert s16.num_unassigned == 1 and s16.eps == 0.5

    # batched: solve then narrow; round-trips exactly
    rng = np.random.default_rng(44)
    costs = rng.integers(1, 50, size=(2, 16, 16)).astype(np.float64)
    bs = solve_batch(costs, solver="fr", dtype=np.float64)
    b16 = bs.astype_index(np.uint16)
    assert b16.person_to_object.dtype == np.uint16
    np.testing.assert_array_equal(
        b16.person_to_object.astype(np.int32), bs.person_to_object
    )
    np.testing.assert_array_equal(b16.objective, bs.objective)


def test_p2o_u16_pack_roundtrip():
    """Wire-format edge cases: high indices and the UNASSIGNED
    sentinel must round-trip the u16 packing exactly."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.batch import (
        _pack_p2o_u16,
        _unpack_p2o_u16,
    )
    from sparse_linear_assignment_tpu.solution import UNASSIGNED

    p2o = np.array(
        [[0, 1, 65533, UNASSIGNED], [255, 256, 65534, 2]], np.int32
    )
    words = np.asarray(_pack_p2o_u16(jnp.asarray(p2o)))
    assert words.shape == (2, 2)
    out = _unpack_p2o_u16(words, 4)
    np.testing.assert_array_equal(out, p2o)


def test_solve_batch_stream_pipelined():
    """solve_batch_stream: the pipelined sustained-throughput mode.
    Results must equal per-batch device-resident solve_batch exactly
    (same fused program, interpret mode on CPU), in input order."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.batch import (
        solve_batch,
        solve_batch_stream,
    )

    rng = np.random.default_rng(55)
    b, n = 4, 128
    host = [
        rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
        for _ in range(3)
    ]
    devs = [jnp.asarray(c.astype(np.float32)) for c in host]

    # float mode, eps strictly inside the integer-exactness bound
    sols = solve_batch_stream(devs, eps=1.0 / (n + 1), integer=False,
                              window=2, interpret=True)
    assert len(sols) == 3
    for c, sol in zip(host, sols):
        assert int(sol.num_unassigned.sum()) == 0
        np.testing.assert_allclose(sol.objective, oracle_batch(c),
                                   atol=1e-6)

    # integer-auction mode; compare bit-exact with the per-call path
    sols_i = solve_batch_stream(devs, integer=True, max_cost=100,
                                window=1, interpret=True)
    for c, dev, sol in zip(host, devs, sols_i):
        np.testing.assert_allclose(sol.objective, oracle_batch(c),
                                   atol=1e-9)
        np.testing.assert_allclose(sol.eps, 1.0 / (n + 1))
        for i, j in enumerate(sol.person_to_object[0]):
            assert sol.object_to_person[0, j] == i

    # maximize through the stream
    sols_m = solve_batch_stream(devs[:1], maximize=True, integer=True,
                                max_cost=100, interpret=True)
    np.testing.assert_allclose(
        sols_m[0].objective, oracle_batch(host[0], maximize=True),
        atol=1e-9)


def test_solve_batch_stream_validation_and_fallback():
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.batch import solve_batch_stream

    assert solve_batch_stream([]) == []
    with pytest.raises(ValueError, match="square"):
        solve_batch_stream([jnp.zeros((2, 8, 16), np.float32)])
    with pytest.raises(ValueError, match="share one shape"):
        solve_batch_stream([
            jnp.zeros((2, 128, 128), np.float32),
            jnp.zeros((3, 128, 128), np.float32),
        ])

    # non-fused regime (n % 128 != 0) falls back to sequential
    # device-resident solve_batch calls
    rng = np.random.default_rng(56)
    c = rng.integers(1, 50, size=(2, 24, 24)).astype(np.float64)
    dev = jnp.asarray(c.astype(np.float32))
    sols = solve_batch_stream([dev], eps=1.0 / 25)
    assert len(sols) == 1
    np.testing.assert_allclose(sols[0].objective, oracle_batch(c),
                               atol=1e-6)


def test_forward_pallas_vmem_cap():
    """The grid-over-batch forward round kernel holds a whole [M, N]
    instance in scoped VMEM; beyond 1024*1024 elements it exceeds the
    16 MB compiler default (measured OOM at 1536² on v5e) and the
    driver must fall back to XLA rounds instead of failing compile."""
    from sparse_linear_assignment_tpu.batch import _pallas_usable

    assert _pallas_usable("forward", 1024, 1024, np.float32)
    assert not _pallas_usable("forward", 1536, 1536, np.float32)
    assert not _pallas_usable("forward", 2048, 2048, np.float32)


def test_solve_batch_auto_routes_to_fr(monkeypatch):
    """The default solver='auto' must pick the fr engine on square
    instances (the measured-fastest correct engine at every size —
    at e.g. 1536² the forward route would OOM the VMEM kernel or crawl
    through XLA rounds) and forward on asymmetric ones."""
    from sparse_linear_assignment_tpu import batch as batch_mod

    seen = []
    real = batch_mod._solve_batch_dense

    def spy(values_t, eps, target_eps, toleration, thresholds, solver,
            *args, **kw):
        seen.append(solver)
        return real(values_t, eps, target_eps, toleration, thresholds,
                    solver, *args, **kw)

    monkeypatch.setattr(batch_mod, "_solve_batch_dense", spy)
    rng = np.random.default_rng(3)
    sq = rng.integers(1, 50, size=(2, 16, 16)).astype(np.float64)
    sol = batch_mod.solve_batch(sq, dtype=np.float64)
    assert seen[-1] == "fr"
    np.testing.assert_allclose(sol.objective, oracle_batch(sq), atol=1e-9)
    asym = rng.integers(1, 50, size=(2, 8, 16)).astype(np.float64)
    sol = batch_mod.solve_batch(asym, dtype=np.float64)
    assert seen[-1] == "forward"
    assert np.all(sol.num_unassigned == 0)


def test_forward_pallas_kernel_path_interpret(monkeypatch):
    """The batched forward-auction Pallas path (_batch_chunk_pallas +
    ops/pallas_dense.py) only runs on accelerator backends in
    production; force it in interpret mode on CPU so the suite covers
    the kernel the driver's TPU actually executes for forward batches.
    Integer costs with eps < 1/n must be scipy-exact."""
    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(
        batch_mod, "_FORWARD_PALLAS_INTERPRET_ON_CPU", True
    )
    rng = np.random.default_rng(21)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    sol = batch_mod.solve_batch(
        costs, solver="forward", dtype=np.float32, eps=1.0 / (n + 1)
    )
    assert int(sol.num_unassigned.sum()) == 0
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = float(costs[bi][r, c].sum())
        assert abs(float(sol.objective[bi]) - want) < 1e-6, (
            bi, sol.objective[bi], want,
        )


def test_fused_dense_round_single_matches_batch_wrapper():
    """fused_dense_round (single-instance kernel) and
    fused_dense_round_batch (grid-over-batch kernel at B=1) are separate
    kernels behind the same round contract — their outputs must be
    identical on the same state (interpret mode)."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu.ops.pallas_dense import (
        fused_dense_round,
        fused_dense_round_batch,
    )
    from sparse_linear_assignment_tpu.solution import UNASSIGNED

    rng = np.random.default_rng(17)
    m = n = 128
    vals_t = jnp.asarray(
        -rng.integers(1, 50, size=(m, n)).astype(np.float32)
    )
    prices = jnp.zeros(m, jnp.float32)
    p2o = jnp.full(n, jnp.int32(UNASSIGNED))
    o2p = jnp.full(m, jnp.int32(UNASSIGNED))
    eps = np.float32(1.0 / (n + 1))

    single = fused_dense_round(
        vals_t, prices, p2o, o2p, eps, False, interpret=True
    )
    batched = fused_dense_round_batch(
        vals_t[None], prices[None], p2o[None], o2p[None],
        jnp.full((1,), eps), jnp.zeros((1,), bool), interpret=True,
    )
    for got, want in zip(single, batched):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want)[0]
        )
    # a first Jacobi round must assign at least one person and raise
    # at least one price
    assert int(np.sum(np.asarray(single[1]) != UNASSIGNED)) > 0
    assert float(np.max(np.asarray(single[0]))) > 0.0


def test_fr_fused_fast_path_interpret_host_mode(monkeypatch):
    """The fused FR fast path (one multi-round kernel dispatch +
    two-level continuation + packed u16 readback + native straggler
    tail) is the driver's main batched bench path and only runs on
    accelerator backends in production; force it in interpret mode so
    the suite executes the whole glue chain.  Integer costs with
    eps < 1/n must be scipy-exact."""
    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_FR_FUSED_INTERPRET_ON_CPU", True)
    rng = np.random.default_rng(41)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    sol = batch_mod.solve_batch(
        costs, solver="fr", dtype=np.float32, eps=1.0 / (n + 1)
    )
    assert int(sol.num_unassigned.sum()) == 0
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = float(costs[bi][r, c].sum())
        assert abs(float(sol.objective[bi]) - want) < 1e-6, (
            bi, sol.objective[bi], want,
        )


def test_fr_fused_fast_path_interpret_device_mode(monkeypatch):
    """Device-resident fused fast path in interpret mode: integer-
    auction lattice, objective evaluated on device and decoded from the
    packed double-double readback — the exact program the driver bench
    times.  Must be scipy-exact."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_FR_FUSED_INTERPRET_ON_CPU", True)
    rng = np.random.default_rng(43)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))
    sol = batch_mod.solve_batch(
        None, solver="fr", dtype=np.float32,
        costs_device=dev, integer=True, max_cost=100,
    )
    assert int(sol.num_unassigned.sum()) == 0
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = float(costs[bi][r, c].sum())
        assert abs(float(sol.objective[bi]) - want) < 1e-6, (
            bi, sol.objective[bi], want,
        )


def test_fr_fused_batch_bucketing(monkeypatch):
    """Batch-size bucketing on the fused path: padding b up to the
    power-of-two bucket (done-marked zero instances) must return
    results identical to the exact-b program — host mode, the
    device-resident packed-objective mode, and the stream mode.  This
    caps the one-Mosaic-program-per-distinct-B compile zoo (a fresh B
    is a 10–20 minute cold compile on the production backend)."""
    import jax.numpy as jnp

    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_FR_FUSED_INTERPRET_ON_CPU", True)
    rng = np.random.default_rng(47)
    b, n = 3, 128
    costs = rng.integers(1, 100, size=(b, n, n)).astype(np.float64)
    dev = jnp.asarray(costs.astype(np.float32))

    out = {}
    for floor in (0, 8):
        monkeypatch.setattr(batch_mod, "_FR_B_BUCKET_FLOOR", floor)
        host_sol = batch_mod.solve_batch(
            costs, solver="fr", dtype=np.float32, eps=1.0 / (n + 1)
        )
        dev_sol = batch_mod.solve_batch(
            None, solver="fr", dtype=np.float32,
            costs_device=dev, integer=True, max_cost=100,
        )
        stream_sol = batch_mod.solve_batch_stream(
            [dev], integer=True, max_cost=100, interpret=True
        )[0]
        out[floor] = (host_sol, dev_sol, stream_sol)

    for exact, padded in zip(out[0], out[8]):
        assert exact.person_to_object.shape == (b, n)
        assert padded.person_to_object.shape == (b, n)
        np.testing.assert_array_equal(
            padded.person_to_object, exact.person_to_object
        )
        np.testing.assert_allclose(padded.objective, exact.objective,
                                   atol=1e-9)
        assert int(padded.num_unassigned.sum()) == 0
        assert padded.eps.shape == (b,) and padded.nits.shape == (b,)
    for bi in range(b):
        r, c = linear_sum_assignment(costs[bi])
        want = float(costs[bi][r, c].sum())
        assert abs(float(out[8][1].objective[bi]) - want) < 1e-6


def test_linear_sum_assignment_scipy_compat():
    """The drop-in convenience wrapper matches scipy's return contract
    (sorted row_ind, exact objective on integer costs) on square, wide,
    tall, and degenerate shapes, both directions."""
    from sparse_linear_assignment_tpu import (
        linear_sum_assignment as lsa_tpu,
    )

    rng = np.random.default_rng(11)
    for shape in [(7, 7), (4, 9), (9, 4), (1, 5), (5, 1), (16, 16)]:
        for maximize in (False, True):
            c = rng.integers(1, 60, size=shape).astype(np.float64)
            r, cc = lsa_tpu(c, maximize=maximize)
            sr, sc = linear_sum_assignment(c, maximize=maximize)
            # same cardinality, sorted rows, valid pairs, equal objective
            assert len(r) == len(sr) == min(shape)
            assert np.all(np.sort(r) == r)
            assert len(np.unique(r)) == len(r)
            assert len(np.unique(cc)) == len(cc)
            assert abs(c[r, cc].sum() - c[sr, sc].sum()) < 1e-9, (
                shape, maximize, c[r, cc].sum(), c[sr, sc].sum(),
            )
    # empty edge case mirrors scipy
    r, cc = lsa_tpu(np.empty((0, 3)))
    assert r.size == 0 and cc.size == 0
    # float costs: eps-optimal within min(n,m)*eps
    c = rng.uniform(0.0, 1.0, size=(12, 12))
    r, cc = lsa_tpu(c, eps=1e-4, dtype=np.float64)
    sr, sc = linear_sum_assignment(c)
    assert c[r, cc].sum() <= c[sr, sc].sum() + 12 * 1e-4 + 1e-9
    # non-finite entries are rejected with guidance
    bad = c.copy()
    bad[0, 0] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        lsa_tpu(bad)


def test_linear_sum_assignment_promotes_past_f32_mantissa():
    """Integer costs beyond 2**24 would be quantized by the default f32
    staging before the auction runs; the wrapper must auto-promote to
    f64 so the documented integer-exactness contract holds."""
    from sparse_linear_assignment_tpu import (
        linear_sum_assignment as lsa_tpu,
    )

    base = 2 ** 24
    # adjacent integers around the mantissa edge: f32 cannot represent
    # base+1, so an f32 solve could tie-break to a non-optimal matching
    c = np.array(
        [
            [base + 1.0, base + 3.0, base + 50.0],
            [base + 2.0, base + 60.0, base + 4.0],
            [base + 70.0, base + 5.0, base + 6.0],
        ]
    )
    r, cc = lsa_tpu(c)
    sr, sc = linear_sum_assignment(c)
    assert abs(c[r, cc].sum() - c[sr, sc].sum()) < 1e-9


def test_batch_sparse_dense_engine_vs_oracle_and_padded():
    """The gather-free densified batch-sparse engine (the TPU fast
    path, VERDICT r4 item 1) must be eps-optimal vs the scipy oracle
    and agree with the padded-gather engine on objectives, unassigned
    counts, and round counts of every instance."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    rng = np.random.default_rng(77)
    b, n, m, k = 5, 32, 128, 6
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    # integer values + eps < 1/n: objectives exact on the lattice
    values = rng.integers(1, 50, size=(b, n, k)).astype(np.float64)

    dense = solve_batch_sparse(
        columns, values, m, eps=0.5 / n, engine="dense"
    )
    padded = solve_batch_sparse(
        columns, values, m, eps=0.5 / n, engine="padded"
    )
    assert np.all(dense.num_unassigned == 0)
    np.testing.assert_array_equal(
        dense.num_unassigned, padded.num_unassigned
    )
    np.testing.assert_allclose(dense.objective, padded.objective, atol=1e-9)
    for bi in range(b):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full)
        want = full[r, c].sum()
        assert dense.objective[bi] == want  # integer lattice, eps < 1/n
        for i, j in enumerate(dense.person_to_object[bi]):
            assert j in columns[bi, i]
            assert dense.object_to_person[bi, j] == i

    # maximize through the dense engine
    dmax = solve_batch_sparse(
        columns, values, m, maximize=True, eps=0.5 / n, engine="dense"
    )
    for bi in (0, b - 1):
        full = np.full((n, m), -1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full, maximize=True)
        assert dmax.objective[bi] == full[r, c].sum()


def test_batch_sparse_dense_engine_infeasible_and_padding():
    """Variable arc counts and the drop rule through the densified
    engine: identical contract to the padded engine."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    columns = np.array([
        [[0, 1], [1, -1]],
        [[0, -1], [0, -1]],
    ], dtype=np.int32)
    values = np.array([
        [[1.0, 2.0], [3.0, 0.0]],
        [[1.0, 0.0], [2.0, 0.0]],
    ])
    sol = solve_batch_sparse(columns, values, 2, eps=0.25, engine="dense")
    assert sol.num_unassigned[0] == 0
    assert sol.num_unassigned[1] == 1
    assert abs(sol.objective[0] - (1.0 + 3.0)) < 1e-9


def test_batch_sparse_dense_engine_odd_n_i32_wire():
    """Odd N routes the packed readback to the plain-int32 wire format
    (the u16 pair pack needs even N); dropped sentinel included."""
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    columns = np.array([
        [[0, 1], [1, 2], [2, -1]],
        [[0, -1], [0, -1], [1, 2]],
    ], dtype=np.int32)
    values = np.array([
        [[1.0, 2.0], [3.0, 1.0], [2.0, 0.0]],
        [[1.0, 0.0], [2.0, 0.0], [1.0, 5.0]],
    ])
    sol = solve_batch_sparse(columns, values, 3, eps=0.2, engine="dense")
    assert sol.num_unassigned[0] == 0
    assert sol.num_unassigned[1] == 1  # two persons share object 0
    assert abs(sol.objective[0] - (1.0 + 3.0 + 2.0)) < 1e-9


def test_batch_sparse_kernel_interpret_matches_xla():
    """The fused Mosaic batch-sparse Khosla kernel (interpret mode on
    CPU) must be BIT-identical to the XLA chunk path: p2o, nits,
    objective — including the drop rule and B-bucket padding slots."""
    import sparse_linear_assignment_tpu.batch as batch_mod
    from sparse_linear_assignment_tpu.batch import solve_batch_sparse

    rng = np.random.default_rng(31)
    b, n, m, k = 5, 16, 96, 4  # b=5 exercises the bucket padding
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    values = rng.integers(1, 40, size=(b, n, k)).astype(np.float64)
    # make instance 2 infeasible: all persons share one object only
    columns[2] = 0
    columns[2, :, 1:] = -1

    batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
    try:
        ks = solve_batch_sparse(columns, values, m, engine="dense")
    finally:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    xs = solve_batch_sparse(columns, values, m, engine="dense")
    np.testing.assert_array_equal(ks.person_to_object, xs.person_to_object)
    np.testing.assert_array_equal(ks.nits, xs.nits)
    np.testing.assert_array_equal(ks.num_unassigned, xs.num_unassigned)
    np.testing.assert_allclose(ks.objective, xs.objective)
    assert ks.num_unassigned[2] == n - 1  # drop rule fired
    for bi in (0, 1, 3, 4):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full)
        assert ks.objective[bi] == full[r, c].sum()


def test_batch_sparse_stream_matches_per_call():
    """The pipelined sparse stream must return bit-identical solutions
    to per-call staged solves, in input order."""
    import sparse_linear_assignment_tpu.batch as batch_mod
    from sparse_linear_assignment_tpu.batch import (
        solve_batch_sparse,
        solve_batch_sparse_stream,
        stage_batch_sparse,
    )

    rng = np.random.default_rng(9)
    n, m, k = 16, 64, 4
    batches = []
    for b in (3, 5):
        columns = np.stack([
            np.stack([
                rng.choice(m, size=k, replace=False) for _ in range(n)
            ]) for _ in range(b)
        ]).astype(np.int32)
        values = rng.integers(1, 30, size=(b, n, k)).astype(np.float64)
        batches.append((columns, values))

    batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
    try:
        staged = [
            stage_batch_sparse(c, v, m, eps=0.5 / n) for c, v in batches
        ]
        stream = solve_batch_sparse_stream(staged, window=2)
        per_call = [
            solve_batch_sparse(c, v, m, eps=0.5 / n, engine="dense")
            for c, v in batches
        ]
    finally:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    for s, p in zip(stream, per_call):
        np.testing.assert_array_equal(s.person_to_object, p.person_to_object)
        np.testing.assert_allclose(s.objective, p.objective)
        np.testing.assert_array_equal(s.nits, p.nits)


def test_batch_sparse_device_staging_matches_host():
    """Device-resident staging (device scatter, identity column map,
    objective on the packed readback) must match the host-staged dense
    engine bit-for-bit on p2o and to f32 double-double precision on
    the objective."""
    import jax.numpy as jnp

    import sparse_linear_assignment_tpu.batch as batch_mod
    from sparse_linear_assignment_tpu.batch import (
        _sparse_finish,
        _sparse_dispatch,
        solve_batch_sparse,
        stage_batch_sparse_device,
    )

    rng = np.random.default_rng(44)
    b, n, m, k = 3, 16, 128, 4
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    values = rng.integers(1, 60, size=(b, n, k)).astype(np.float64)

    batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
    try:
        st = stage_batch_sparse_device(
            jnp.asarray(columns), jnp.asarray(values, jnp.float32), m,
            eps=0.5 / n,
        )
        dsol = _sparse_finish(st, _sparse_dispatch(st, 16), 10_000_000)
        hsol = solve_batch_sparse(
            columns, values, m, eps=0.5 / n, engine="dense"
        )
    finally:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    np.testing.assert_array_equal(dsol.person_to_object,
                                  hsol.person_to_object)
    np.testing.assert_array_equal(dsol.num_unassigned,
                                  hsol.num_unassigned)
    np.testing.assert_allclose(dsol.objective, hsol.objective, atol=1e-6)
    for bi in range(b):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full)
        assert dsol.objective[bi] == full[r, c].sum()


def test_batch_sparse_device_staging_maximize():
    """Device-resident staging in maximize mode (negate=False scatter,
    objective still in original units on the readback)."""
    import jax.numpy as jnp

    import sparse_linear_assignment_tpu.batch as batch_mod
    from sparse_linear_assignment_tpu.batch import (
        _sparse_dispatch,
        _sparse_finish,
        stage_batch_sparse_device,
    )

    rng = np.random.default_rng(52)
    b, n, m, k = 2, 8, 128, 3
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    values = rng.integers(1, 40, size=(b, n, k)).astype(np.float64)

    batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
    try:
        st = stage_batch_sparse_device(
            jnp.asarray(columns), jnp.asarray(values, jnp.float32), m,
            maximize=True, eps=0.5 / n,
        )
        sol = _sparse_finish(st, _sparse_dispatch(st, 16), 10_000_000)
    finally:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    assert int(sol.num_unassigned.sum()) == 0
    for bi in range(b):
        full = np.full((n, m), -1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full, maximize=True)
        assert sol.objective[bi] == full[r, c].sum()


def test_batch_sparse_device_staging_compacted():
    """Column-compacted device staging (large-m fast path): bit-equal
    matchings to the uncompacted device staging and the host dense
    engine, with the compact plane strictly narrower."""
    import jax.numpy as jnp

    import sparse_linear_assignment_tpu.batch as batch_mod
    from sparse_linear_assignment_tpu.batch import (
        _sparse_dispatch,
        _sparse_finish,
        solve_batch_sparse,
        stage_batch_sparse_device,
    )

    rng = np.random.default_rng(71)
    b, n, m, k = 3, 16, 512, 4  # n*k = 64 << m: compaction shrinks 4x
    columns = np.stack([
        np.stack([
            rng.choice(m, size=k, replace=False) for _ in range(n)
        ]) for _ in range(b)
    ]).astype(np.int32)
    values = rng.integers(1, 60, size=(b, n, k)).astype(np.float64)

    batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = True
    try:
        stc = stage_batch_sparse_device(
            columns, values, m, eps=0.5 / n, compact=True
        )  # explicit knob only: auto-compaction measured 12x slower
        assert stc.used_cols is not None
        assert stc.values_t.shape[2] < m
        csol = _sparse_finish(stc, _sparse_dispatch(stc, 16), 10_000_000)
        stu = stage_batch_sparse_device(
            jnp.asarray(columns), jnp.asarray(values, jnp.float32), m,
            eps=0.5 / n,
        )  # device arrays: stays uncompacted
        assert stu.used_cols is None
        usol = _sparse_finish(stu, _sparse_dispatch(stu, 16), 10_000_000)
        href = solve_batch_sparse(
            columns, values, m, eps=0.5 / n, engine="dense"
        )
    finally:
        batch_mod._SPARSE_KERNEL_INTERPRET_ON_CPU = False
    np.testing.assert_array_equal(csol.person_to_object,
                                  href.person_to_object)
    np.testing.assert_array_equal(csol.person_to_object,
                                  usol.person_to_object)
    np.testing.assert_allclose(csol.objective, href.objective, atol=1e-6)
    for bi in range(b):
        full = np.full((n, m), 1e9)
        for i in range(n):
            full[i, columns[bi, i]] = values[bi, i]
        r, c = linear_sum_assignment(full)
        assert csol.objective[bi] == full[r, c].sum()
