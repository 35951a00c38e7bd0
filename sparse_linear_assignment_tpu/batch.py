"""Batched (vmapped) LAP solving — thousands of independent instances per
TPU core.

This is a first-class TPU-native capability the sequential reference
cannot express (SURVEY.md §2 "Parallelism strategies"): `jax.vmap` lifts
the whole `lax.while_loop` auction over a batch dimension, so one compiled
executable solves the entire batch; instances that terminate early take
masked no-op rounds until the slowest instance finishes.

The batch API uses clean min/max cost semantics (costs in, assignments and
objectives out) rather than the reference's stateful CSR-builder surface;
the per-instance semantics (bid rules, ε defaults, termination) are
identical to the single-instance solvers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .ops.auction import (
    ForwardState,
    KhoslaState,
    forward_round,
    khosla_round,
)
from .ops.dense import DenseProblem
from .ops.fr_dense import STALL_K0, FRState, fr_init, fr_round
from .ops.pallas_fr import fr_chunk_pallas
from .ops.pallas_fr_big import fr_big_chunk
from .solution import UNASSIGNED, o2p_from_p2o
from .utils.trace import trace_host

_INT_MAX = np.int32(UNASSIGNED)  # np scalar: no backend init at import

#: test hook — route the big-single streaming kernel through interpret
#: mode on the CPU backend (tests/test_fr_big.py exercises the kernel
#: itself; this exercises the driver routing end-to-end)
_BIG_INTERPRET_ON_CPU = False
#: test hook — run the batched forward-round kernel
#: (ops/pallas_dense.py) in interpret mode on the CPU backend, where it
#: is otherwise skipped in favor of the XLA rounds
_FORWARD_PALLAS_INTERPRET_ON_CPU = False
#: test hook — run the fused FR fast path (ops/pallas_fr.py multi-round
#: kernel + two-level continuation + packed readback, the driver's main
#: batched bench path) in interpret mode on the CPU backend
_FR_FUSED_INTERPRET_ON_CPU = False
#: bench hook — force big singles onto the XLA-rounds path for
#: apples-to-apples kernel-vs-XLA comparisons
_BIG_DISABLE = False

#: Pad the fused-path batch dimension up to a power-of-two bucket (with
#: this floor) before dispatch.  Each DISTINCT batch size otherwise
#: compiles its own Mosaic multi-round program — a 10–20 minute cold
#: compile on this backend (measured: a fresh B=8 at 256² ran past a
#: 19-minute timeout while the cached B=4096 program solved in seconds)
#: — so bucketing caps the compiled-program zoo at log2(B) entries.
#: Padding slots are zero instances marked done at init: they exit
#: their grid step immediately (the same early exit that makes deep
#: straggler budgets cheap), costing HBM, not rounds.  Set to 0 to
#: disable (exact-B programs, e.g. for kernel A/B probes).
_FR_B_BUCKET_FLOOR = 64

#: elements above which a square f32 single routes to the streaming
#: kernel (the VMEM-resident kernel's measured crossover; tests shrink
#: it to drive the big path at test sizes)
_BIG_MIN_ELEMS = 1024 * 1024

#: observability: number of instances the last fused-path solve handed
#: to the serial native straggler tail (bench target: 0 — the two-level
#: on-device continuation should empty it, VERDICT r2 item 5)
LAST_TAIL_COUNT = 0


@dataclasses.dataclass
class BatchSolution:
    """Result of a batched solve.

    ``person_to_object[b, i]`` / ``object_to_person[b, j]`` use the same
    ``UNASSIGNED`` sentinel as the single-instance API; ``objective`` is
    in original cost units (float64 accumulation).
    """

    person_to_object: np.ndarray  # int32 [B, N]
    object_to_person: np.ndarray  # int32 [B, M]
    num_unassigned: np.ndarray  # int32 [B]
    objective: np.ndarray  # float64 [B]
    eps: np.ndarray  # [B] achieved eps (forward) or scalar-broadcast
    nits: np.ndarray  # int32 [B]

    def astype_index(self, index_dtype) -> "BatchSolution":
        """A copy with both assignment arrays in another index width
        (u16/u32 — the reference's index genericity, `solution.rs:4-17`;
        halves host memory of `[B, N]` results at u16), sentinel
        remapped to the target dtype's max.  The batched readback
        already travels u16-packed on the wire (:func:`_pack_p2o_u16`);
        this makes the narrow width available at rest too."""
        from .solution import convert_indices

        return BatchSolution(
            person_to_object=convert_indices(
                self.person_to_object, index_dtype
            ),
            object_to_person=convert_indices(
                self.object_to_person, index_dtype
            ),
            num_unassigned=self.num_unassigned,
            objective=self.objective,
            eps=self.eps,
            nits=self.nits,
        )


@functools.partial(
    jax.jit, static_argnames=("solver", "max_iterations", "chunk", "n", "m")
)
def _batch_chunk(
    values_t,  # [B, M, N] profit values (already sign-adjusted), dtype f
    states,  # batched KhoslaState / ForwardState
    eps,  # scalar
    target_eps,  # scalar
    toleration,  # scalar
    thresholds,  # [B] khosla price thresholds (forward: unused)
    solver: str,
    max_iterations: int,
    chunk: int,
    n: int,
    m: int,
):
    """Run ``chunk`` rounds of every instance (vmapped scan) and report
    whether all instances are finished.  Host-chunked structure: dynamic
    `lax.while_loop` bodies send this TPU backend's compiler into
    pathological blowups, fixed-length scans compile in seconds."""

    if solver == "khosla":

        def one(vals_t, state, threshold):
            problem = DenseProblem(vals_t)

            def body(s, _):
                return khosla_round(problem, s, eps, threshold), None

            state, _ = lax.scan(body, state, None, length=chunk)
            return state

        states = jax.vmap(one)(values_t, states, thresholds)
        alldone = jnp.all(
            jnp.sum(
                (states.p2o == UNASSIGNED) & ~states.dropped,
                axis=1, dtype=jnp.int32,
            ) == 0
        ) | jnp.all(states.nits >= max_iterations)
        return states, alldone
    else:

        def one(vals_t, state):
            problem = DenseProblem(vals_t)

            def body(s, _):
                return (
                    forward_round(
                        problem, s, target_eps, toleration,
                        jnp.asarray(n != m, bool),
                        jnp.asarray(max_iterations, jnp.int32),
                        keep_valid=True,
                    ),
                    None,
                )

            state, _ = lax.scan(body, state, None, length=chunk)
            return state

        states = jax.vmap(one)(values_t, states)
        return states, jnp.all(states.done)


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "chunk", "sfoe")
)
def _batch_chunk_fr(
    values_t,  # [B, M, N]
    states: FRState,
    target_eps,
    toleration,
    max_iterations: int,
    chunk: int,
    sfoe: bool,
):
    """Run ``chunk`` forward-reverse rounds of every instance (vmapped
    scan).  Same host-chunked structure as ``_batch_chunk``.  ``sfoe``:
    the batch started at the target eps, so the per-round certificate
    passes are skipped (full assignment == certificate)."""

    def one(vals_t, state):
        def body(s, _):
            return (
                fr_round(
                    vals_t, s, target_eps, toleration,
                    jnp.asarray(max_iterations, jnp.int32),
                    skip_certificate=sfoe,
                ),
                None,
            )

        state, _ = lax.scan(body, state, None, length=chunk)
        return state

    states = jax.vmap(one)(values_t, states)
    return states, jnp.all(states.done)


@jax.jit
def _fr_batch_init(values_t, start_eps):
    """Jitted batched-state construction (op-by-op inits cost seconds of
    remote-AOT dispatch on this backend; one compiled program is ~ms)."""
    b, m, n = values_t.shape
    dtype = values_t.dtype
    return FRState(
        prices=jnp.zeros((b, m), dtype),
        profits=jnp.max(values_t, axis=1),
        p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
        o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
        eps=start_eps.astype(dtype),
        forward_mode=jnp.ones((b,), bool),
        since_inc=jnp.zeros((b,), jnp.int32),
        stall_k=jnp.full((b,), STALL_K0, jnp.int32),
        nits=jnp.zeros((b,), jnp.int32),
        nreductions=jnp.zeros((b,), jnp.int32),
        optimal_found=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
    )


@functools.partial(jax.jit, static_argnames=("negate",))
def _stage_values_t(costs_dev, negate: bool):
    """Device-side staging: sign-adjust and transpose to the [B, M, N]
    round layout (host-side transposes of 100+ MB cost seconds)."""
    x = -costs_dev if negate else costs_dev
    return jnp.swapaxes(x, 1, 2)


@functools.partial(jax.jit, static_argnames=("negate", "scale"))
def _stage_values_t_int(costs_dev, negate: bool, scale: int):
    """Integer-auction staging: sign-adjust, transpose, and lift onto
    the scaled-int32 lattice (``cost * scale``, ε = 1).  The multiply
    runs in int32 — an f32 product would lose bits past 2²⁴ (the range
    guard in :func:`_integer_scale` keeps the lattice far inside
    int32)."""
    x = jnp.round(costs_dev).astype(jnp.int32) * jnp.int32(scale)
    x = -x if negate else x
    return jnp.swapaxes(x, 1, 2)


def _integer_scale(costs, eps, n, m, integer, max_cost):
    """Decide whether the batched FR solve can run in the exact
    integer-auction mode, and with which lattice scale.

    Returns the scale D (solve runs on ``cost*D`` with ε = 1 — i.e.
    ε = 1/D in original units) or None to keep the float path.  The
    mode needs: square instances in the fused-kernel regime,
    integer-valued costs, and headroom for the packed selection keys
    ``(profit << ceil(log2 n)) | index`` plus price drift (margin 8×)
    inside int31.  ``integer=True`` trusts the caller that costs are
    integral (mandatory for device-resident inputs, where a host check
    would cost a tunnel readback); ``integer=None`` auto-detects on
    host costs; ``integer=False`` disables."""
    if integer is False or n != m or n % 128 or n * m > 1024 * 1024:
        return None
    if integer is None and costs is None:
        return None  # device-resident: only on explicit opt-in
    if costs is None and max_cost is None:
        raise ValueError(
            "integer=True with device-resident costs requires max_cost="
            "... (a host-side max would cost a full tunnel readback)"
        )
    if eps is None:
        scale = n + 1  # ε = 1/(n+1): strictly inside n·ε < 1 => exact
    else:
        # smallest lattice at least as fine as the requested ε (the
        # reported solution.eps is 1/scale <= eps)
        scale = max(1, int(np.ceil(1.0 / float(eps) - 1e-9)))
    # key-range feasibility BEFORE the integrality scan: the
    # np.mod pass over 1024² host floats costs ~50-100 ms on this
    # single-core host and was being paid even when the packed keys
    # could never fit (e.g. every 1024² instance at eps ~ 1/n —
    # measured as the dominant term of the dense-single wall)
    if max_cost is not None:
        c = float(max_cost)
    else:
        c = float(max(costs.max(), -costs.min()))  # no |.| temp copy
    sh = (n - 1).bit_length()
    if 8 * (c * scale + (n + 1)) * (1 << sh) >= 2.0**31:
        return None  # packed keys could overflow int32: stay float
    if integer is None:
        if not (
            np.issubdtype(costs.dtype, np.integer)
            or (
                costs.size <= (1 << 24)
                and bool(np.all(np.mod(costs, 1) == 0))
            )
        ):
            return None
    return scale


@jax.jit
def _fr_pack_single(state: FRState):
    """Single-instance analogue of :func:`_fr_pack_results`:
    ``[n + 2]`` = p2o | nits | done in one readback."""
    return jnp.concatenate(
        [
            state.p2o,
            state.nits[None],
            state.done.astype(jnp.int32)[None],
        ]
    )


# (The dovetailed native chain-tail machinery — _fr_pack_single_tail /
# _fr_big_native_tail / _fr_state_from_host — was deleted in round 4:
# measured never-winning after the streaming kernel's hoisted-flags
# restructure, see the use_big loop note.  The sequential engine's
# warm-start entry survives as cpu_reference.fr_dense_finish_cpu.)


def _pack_p2o_u16(p2o):
    """Two u16 assignment indices per int32 word (`[B, N] -> [B, N/2]`,
    N even and < 2**16): the result readback is bandwidth-priced
    through the tunnel (~10-14 MB/s), so index bytes are halved on the
    wire — the reference's u16 index-width option
    (`solution.rs:16-17`) applied where it measurably pays.  The
    UNASSIGNED sentinel maps to 0xFFFF."""
    u16 = jnp.where(p2o == _INT_MAX, jnp.int32(0xFFFF), p2o)
    lo = u16[:, 0::2]
    hi = u16[:, 1::2]
    return lo | (hi << 16)


def _unpack_p2o_u16(words: np.ndarray, n: int) -> np.ndarray:
    """Host inverse of :func:`_pack_p2o_u16` (little-endian u16 view)."""
    u16 = np.ascontiguousarray(words.astype(np.uint32)).view(np.uint16)
    p2o = u16[:, :n].astype(np.int32)
    return np.where(p2o == 0xFFFF, np.int32(UNASSIGNED), p2o)


@jax.jit
def _fr_pack_results(states: FRState):
    """Pack every host-needed result field into ONE int32 array
    ``[B, n/2 + 2]`` (u16-packed p2o | nits | done).  Each device→host
    readback through this environment's tunnel costs ~240 ms of pure
    latency regardless of size, so results must cross in one transfer;
    o2p is not read back at all — it is reconstructed from p2o
    host-side."""
    return jnp.concatenate(
        [
            _pack_p2o_u16(states.p2o),
            states.nits[:, None],
            states.done.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )


@jax.jit
def _fr_pack_results_i32(states: FRState):
    """Plain-int32 variant of :func:`_fr_pack_results` (``[B, n + 2]``
    = p2o | nits | done) for shapes the u16 wire format cannot carry:
    odd N (the two-per-word pack drops the last index) or N >= 2**16
    (indices overflow u16).  Still ONE readback; just twice the index
    bytes."""
    return jnp.concatenate(
        [
            states.p2o,
            states.nits[:, None],
            states.done.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("negate",))
def _device_objective(values_t, p2o, negate):
    """Objective in original cost units, evaluated ON DEVICE from the
    sign-adjusted ``[B, M, N]`` values (person i's chosen value sits at
    ``[b, p2o[b, i], i]``); unassigned persons contribute 0."""
    assigned = p2o != _INT_MAX
    safe = jnp.where(assigned, p2o, 0)
    picked = jnp.take_along_axis(
        values_t, safe[:, :, None].swapaxes(1, 2), axis=1
    )[:, 0, :]
    obj = jnp.sum(
        jnp.where(assigned, picked, jnp.zeros((), values_t.dtype)),
        axis=1, dtype=jnp.float64,
    )
    return -obj if negate else obj  # minimize ran on negated values


@functools.partial(jax.jit, static_argnames=("negate", "u16"))
def _fr_pack_results_with_objective(states: FRState, values_t, negate,
                                    u16: bool = True):
    """Device-resident variant of :func:`_fr_pack_results`: appends the
    device-evaluated objective (used when the caller never materializes
    host costs) as a double-double (hi, lo) pair of bitcast-f32 lanes —
    f64 bitcasts are not lowerable by the TPU backend's x64 rewrite, and
    the two-word split round-trips ~49 mantissa bits, well beyond the
    f32-valued summands' information content.  ``u16=False`` selects the
    plain-int32 index layout for shapes the u16 wire format cannot
    carry (odd N, or N >= 2**16)."""
    packed = _fr_pack_results(states) if u16 else _fr_pack_results_i32(
        states
    )
    obj = _device_objective(values_t, states.p2o, negate)
    hi = obj.astype(jnp.float32)
    lo = (obj - hi.astype(jnp.float64)).astype(jnp.float32)
    bits = jnp.stack(
        [
            lax.bitcast_convert_type(hi, jnp.int32),
            lax.bitcast_convert_type(lo, jnp.int32),
        ],
        axis=1,
    )  # [B, 2]
    return jnp.concatenate([packed, bits], axis=1)


def _fr_fused_schedule(b: int, n: int, max_iterations: int) -> int:
    """Round budget of the fused one-dispatch solve: 11n/10 main-phase
    rounds (p50 ~136, p99 ~397 at 256²) plus 10× headroom for the
    heavy-tailed stragglers (max observed ~2400), capped at
    ``max_iterations``.  ONE deep budget for the whole batch: done
    instances exit their grid step immediately, so the deep budget
    costs only each straggler's real rounds.  (Through round 3 this was
    a three-stage schedule — main budget + two argsort/gather
    undone-first continuation buckets; the round-4 hardware A/B,
    experiments/exp_single_deep.py, measured the single deep call
    bit-identical and slightly faster, with two fewer compiled
    programs and no reorder glue.)"""
    del b
    budget = int(min(max_iterations, max(96, n + n // 4)))
    # = main budget + the old 2x and 8x continuation depths, each
    # clamped by max_iterations — closed form of that sum
    return int(min(max_iterations, 11 * budget))


@functools.partial(
    jax.jit,
    static_argnames=("rounds", "pad_to", "real_b", "negate",
                     "int_scale", "interpret", "stage"),
)
def _fr_fused_solve(x, start_eps_val, rounds: int, pad_to: int,
                    real_b: int, negate: bool, int_scale: int,
                    interpret: bool, stage: bool):
    """ONE-dispatch fused-path solve: [staging +] bucket-pad + state
    init + the deep multi-round kernel + packed results with the
    device objective, all in a single jit program.

    Why: each program submit through this environment's tunnel costs
    ~10 ms of SERIAL host wall (exp_single_fused.py: 20 chained tiny
    dispatches amortize to 2.3 ms, but the production-sized programs'
    submits measured ~10-15 ms each and the host is single-core, so
    they neither overlap each other nor the device).  The former
    stage→concat→init→kernel→pack chain was 4-6 submits; fusing it
    measured 2.2-2.6× on dense singles (512²-1024²) and reclaims the
    stream ledger's ~40 ms/batch of non-overlapped issue cost
    (VERDICT r4 items 2+3).

    ``stage``: ``x`` is the raw device cost matrix ``[B, N, M]`` to be
    sign-adjusted/transposed in-program (``int_scale`` > 0 selects the
    integer lattice); otherwise ``x`` is an already-staged
    ``values_t [B, M, N]``.  Returns (padded values_t, states, packed).
    """
    if stage:
        vt = (
            _stage_values_t_int(x, negate, int_scale)
            if int_scale
            else _stage_values_t(x, negate)
        )
    else:
        vt = x
    b0, m, n = vt.shape
    if pad_to > b0:
        vt = jnp.concatenate(
            [vt, jnp.zeros((pad_to - b0, m, n), vt.dtype)]
        )
    start_eps = jnp.full((pad_to,), start_eps_val, vt.dtype)
    st = _fr_batch_init(vt, start_eps)
    if real_b < pad_to:
        st = st._replace(
            done=jnp.arange(pad_to, dtype=jnp.int32) >= real_b
        )
    st, _ = fr_chunk_pallas(vt, st, rounds, interpret=interpret)
    packed = _fr_pack_results_with_objective(st, vt, negate)
    return vt, st, packed


def _fr_continue_bucket(values_t, states: FRState, bucket: int,
                        budget: int, interpret: bool):
    """One on-device straggler continuation stage: reorder undone-first
    (stable argsort on the done flag — no host readback), continue the
    first ``bucket`` rows for ``budget`` rounds in a small kernel, and
    scatter the results back."""
    if bucket >= values_t.shape[0]:
        states, _ = fr_chunk_pallas(values_t, states, budget, interpret)
        return states
    order = jnp.argsort(states.done.astype(jnp.int32), stable=True)
    idx = order[:bucket]
    vt_small = values_t[idx]
    st_small = jax.tree_util.tree_map(lambda x: x[idx], states)
    st_small, _ = fr_chunk_pallas(vt_small, st_small, budget, interpret)
    return jax.tree_util.tree_map(
        lambda full, small: full.at[idx].set(small), states, st_small
    )


@jax.jit
def _fr_compact(values_t, states: FRState, perm):
    """Gather the unfinished instances into a smaller bucket.  One
    compiled program per (in_b, out_b) pair — shape-varying gathers
    issued op-by-op cost a fresh remote-AOT compile *every call* on
    this backend (several seconds each), jitted they compile once."""
    vt = values_t[perm]
    return vt, jax.tree_util.tree_map(lambda x: x[perm], states)


def _cpu_tail_forward(work_row, target_eps, max_iterations):
    """Finish one dense instance sequentially on the native C++ engine
    (reference ε-scaling forward semantics).  ``work_row [N, M]`` is the
    sign-adjusted max-profit value matrix.  Returns (p2o, nits)."""
    import ctypes

    from .cpu_reference import get_lib

    lib = get_lib()
    n, m = work_row.shape
    starts = np.arange(n + 1, dtype=np.int64) * m
    cols = np.tile(np.arange(m, dtype=np.int32), n)
    vals = np.ascontiguousarray(work_row.reshape(-1), dtype=np.float64)
    p2o = np.empty(n, dtype=np.int32)
    o2p = np.empty(m, dtype=np.int32)
    prices = np.empty(m, dtype=np.float64)
    nits = ctypes.c_int64(0)
    nreductions = ctypes.c_int64(0)
    optimal = ctypes.c_int32(0)
    final_eps = ctypes.c_double(0.0)
    rc = lib.slap_forward_solve(
        n, m, starts, cols, vals, float(target_eps), -1.0,
        int(max_iterations), p2o, o2p, prices,
        ctypes.byref(nits), ctypes.byref(nreductions),
        ctypes.byref(optimal), ctypes.byref(final_eps),
    )
    assert rc == 0
    p2o = np.where(p2o < 0, UNASSIGNED, p2o).astype(np.int32)
    o2p = np.where(o2p < 0, UNASSIGNED, o2p).astype(np.int32)
    return p2o, o2p, int(nits.value)


def _solve_batch_fr(
    values_t, work_host, target_eps, toleration, start_eps,
    max_iterations: int, n: int, m: int,
    chunk: int = 32, min_bucket: int = 32,
    tail_count: int | None = None, tail_rounds: int = 96,
    negate: bool = True, tail_eps: float | None = None,
):
    """Forward-reverse batch driver with straggler compaction and a
    native-CPU tail.

    Lockstep vmapped rounds run until the *slowest* instance finishes;
    the measured round distribution is heavy-tailed (median ~0.6×, max
    ~13× the mean at 512×256×256).  Two mitigations:

    - after each chunk the batch is compacted to the unfinished
      instances in power-of-2 buckets (finished results saved host-side
      from full-array readbacks; filler slots hold finished rows whose
      rounds are no-ops);
    - once ≤ ``tail_count`` stragglers remain after ``tail_rounds``
      rounds, they are finished on the native C++ engine (``work_host``
      rows; ~5 ms per 256×256 instance per host core, threaded — the
      GIL is released during the C call) — the batch analogue of the
      hybrid solver's TPU-bulk + CPU-chain-tail split (hybrid.py).
      ``tail_count`` defaults to 16 stragglers per host core.
      Skipped when ``work_host`` is None (device-only input).

    ``work_host`` is ``(costs, maximize)``: rows are sign-adjusted
    lazily in the tail, so the fast path never materializes a second
    full-size host matrix.

    In the integer-auction mode (``values_t`` int32 on the scaled
    lattice, see :func:`_integer_scale`) ``target_eps`` is the integer
    lattice ε (1) and ``tail_eps`` carries the original-units ε for the
    native CPU tail, which runs on the caller's unscaled f64 costs.
    """
    import os

    b, m_, n_ = values_t.shape
    dtype = values_t.dtype
    np_dtype = np.dtype(dtype)
    target_eps = np_dtype.type(target_eps)
    toleration = np_dtype.type(toleration)
    if tail_eps is None:
        tail_eps = float(target_eps)
    # decide sfoe on the HOST copy before uploading — np.asarray of a
    # device array is a ~240 ms tunnel readback
    start_eps_h = np.asarray(start_eps, dtype=np_dtype)
    sfoe = bool(np.all(start_eps_h <= target_eps))
    # host-side only here: the fused one-dispatch path builds its eps
    # plane in-program; an eager device_put would cost a submit
    ncores = os.cpu_count() or 1
    if tail_count is None:
        tail_count = min(128, 16 * ncores)
    # fused multi-round Pallas kernel (ops/pallas_fr.py): tile-aligned
    # f32 instances in the no-ladder mode; XLA rounds otherwise.  The
    # VMEM-resident kernel runs to 2048² with the raised vmem limit
    # (the 16 MB scoped cap was a compiler default, not hardware —
    # docs/PERFORMANCE.md), but the streaming kernel's idle-block
    # skipping wins beyond ~1024² (measured: tie at 1024², streaming
    # 2× at 2048²), so that is the crossover.
    fr_interp = (
        _FR_FUSED_INTERPRET_ON_CPU and jax.default_backend() == "cpu"
    )
    use_pallas = (
        sfoe
        and np_dtype in (np.float32, np.int32)
        and n % 128 == 0
        and m % 8 == 0
        and n * m <= 1024 * 1024
        and (jax.default_backend() not in ("cpu",) or fr_interp)
    )

    # batch-size bucketing for the fused path (see _FR_B_BUCKET_FLOOR):
    # pad B up to a power of two with done-marked zero instances so any
    # caller batch size reuses a bounded set of compiled programs.
    # The padding itself happens INSIDE the one-dispatch fused program
    # (_fr_fused_solve) — host-side only the bookkeeping grows.
    real_b = b
    if use_pallas and _FR_B_BUCKET_FLOOR:
        pad_to = max(
            _FR_B_BUCKET_FLOOR, 1 << max(0, int(b - 1).bit_length())
        )
        if pad_to > b:
            if start_eps_h.ndim:
                start_eps_h = np.concatenate(
                    [
                        start_eps_h,
                        np.full(
                            pad_to - b, start_eps_h.flat[0],
                            start_eps_h.dtype,
                        ),
                    ]
                )
            b = pad_to

    out_p2o = np.empty((b, n), np.int32)
    out_o2p = np.empty((b, m), np.int32)
    out_eps = np.empty(b, np.float64)
    out_nits = np.empty(b, np.int32)
    out_obj = None  # device-evaluated objective (host-cost-free mode)
    orig = np.arange(b)

    # large square instances beyond the VMEM-resident kernel's limit:
    # the streaming kernel (ops/pallas_fr_big.py) reads only changed
    # HBM blocks per round instead of ~15 XLA traversals (the XLA path
    # loses to the native CPU engine there).  Small batches of big
    # instances loop it per instance — at these sizes one instance's
    # rounds dwarf the per-solve dispatch cost, and lockstep XLA rounds
    # would run every instance until the slowest finishes.
    big_interp = _BIG_INTERPRET_ON_CPU and jax.default_backend() == "cpu"
    use_big = (
        not _BIG_DISABLE
        and np_dtype == np.float32
        and b <= 64
        and n == m
        and n % 128 == 0
        and n * m > _BIG_MIN_ELEMS
        and (jax.default_backend() not in ("cpu",) or big_interp)
    )
    if use_big:
        # always no-ladder (start ε == target): ε-scaled FR phases
        # livelock — at start ε = C/2 the first phase never completes
        # (measured: card stuck at n−2 after 20k rounds; reverse bids
        # at large ε keep re-opening the matching).  The no-ladder run
        # certifies at the target by construction, whatever start_eps
        # the caller picked (docs/PERFORMANCE.md "ε-scaling hurts FR").
        if not sfoe:
            import warnings

            warnings.warn(
                "start_eps ladder ignored on the big-single streaming "
                "path: forward-reverse phases livelock at scaled eps "
                "(measured); running no-ladder at the target eps, which "
                "certifies by construction",
                stacklevel=3,
            )
        # block height: the DMA double buffer is pair-unrolled, so the
        # block count n/bm must be even; beyond 2048 lanes the block
        # temporaries want the smaller height (hardware bm sweep after
        # the hoisted-flags restructure, experiments/exp_bm_ab.py:
        # 2048² 98.6 µs/round at bm=128 vs 152.5 at 64; 4096² 57.3 at
        # bm=64 vs 63.3 at 128; 8192² 72.9 at 64 vs 85.4 at 128)
        bm = 128 if (n % 256 == 0 and n <= 2048) else 64
        # constant per-dispatch budget: 'rounds' is a static jit arg, so
        # a varying remainder (e.g. min(max_iterations - rounds, ...))
        # would force a fresh multi-minute kernel compile exactly on the
        # pathological instance; the host cutoff below may overshoot
        # max_iterations by at most one budget, which the kernel spends
        # as cheap early-exited rounds once done
        budget = int(min(max_iterations, max(512, 2 * n)))
        # Device-only loop.  A dovetailed native chain-tail race lived
        # here through round 3 (hand the endgame war to the sequential
        # engine with a bounded pop budget); after the streaming
        # kernel's hoisted-flags restructure it never won on any
        # feasible size (exp_big_tail3: device-only stable at 2.06 s on
        # the 8192² seed vs 1.9–4.1 s for the handoff under host load;
        # 16384² tail loses outright), so the machinery was deleted in
        # round 4 (VERDICT r3 item 6).  The sequential engine remains
        # available as the plain `_cpu_tail_forward` fallback below and
        # as the standalone `cpu_reference.fr_dense_finish_cpu` oracle.
        for bi in range(b):
            st = fr_init(values_t[bi], target_eps)
            packed = None
            while True:
                st, _ = fr_big_chunk(
                    values_t[bi], st, budget, bm=bm, interpret=big_interp
                )
                packed = np.asarray(_fr_pack_single(st))
                trace_host(
                    "fr big single {}: rounds={} done={}",
                    bi, int(packed[n]), bool(packed[n + 1]),
                )
                if packed[n + 1] or int(packed[n]) >= max_iterations:
                    break
            out_eps[bi] = tail_eps
            out_p2o[bi] = packed[:n]
            out_nits[bi] = int(packed[n])
            done = bool(packed[n + 1])
            if not done and work_host is not None:
                costs_host, maximize = work_host
                row = np.asarray(costs_host[bi], dtype=np.float64)
                p2o_i, o2p_i, _ = _cpu_tail_forward(
                    row if maximize else -row, tail_eps, max_iterations
                )
                out_p2o[bi] = p2o_i
                out_o2p[bi] = o2p_i
            else:
                out_o2p[bi] = o2p_from_p2o(out_p2o[bi], m)
        num_unassigned = (
            (out_p2o == UNASSIGNED).sum(axis=1).astype(np.int32)
        )
        return out_p2o, out_o2p, num_unassigned, out_eps, out_nits, out_obj

    if not use_pallas:
        states = _fr_batch_init(values_t, jnp.asarray(start_eps_h))

    if use_pallas:  # use_pallas implies sfoe
        # fast path: ONE fixed-budget multi-round kernel dispatch, ONE
        # packed readback, native-CPU tail for the stragglers.  The
        # ~240 ms-per-readback tunnel latency makes host-in-the-loop
        # scheduling (per-chunk done checks, compaction saves) cost
        # more than the solve itself; finished instances skip their
        # grid step inside the kernel, so overshooting rounds is cheap.
        # With no host costs (work_host None — device-resident mode)
        # the stragglers keep running fused rounds instead of a native
        # tail, and the objective rides the packed readback (evaluated
        # on device).
        # the worst observed straggler at 256² needs ~2400 rounds; the
        # deep budget covers it and empties the serial native tail
        # (VERDICT r2 item 5) — done instances exit their grid step, so
        # the depth costs only the stragglers' real rounds
        # ONE deep-budget kernel dispatch (since round 4 — the former
        # argsort/gather continuation schedule measured bit-identical
        # and slightly slower, experiments/exp_single_deep.py).  Since
        # round 5 the whole chain (bucket-pad + init + kernel + packed
        # results with device objective) is ONE jit program: each
        # submit through the tunnel costs ~10 ms of serial host wall
        # (exp_single_fused.py — fusing the chain measured 2.2-2.6x on
        # dense singles and reclaims the stream ledger's ~40 ms/batch
        # of non-overlapped issue cost).
        rounds = _fr_fused_schedule(b, n, max_iterations)
        if start_eps_h.ndim == 0 or np.all(
            start_eps_h == start_eps_h.flat[0]
        ):
            values_t, states, packed_dev = _fr_fused_solve(
                values_t, float(start_eps_h.flat[0]), rounds, b, real_b,
                negate, 0, fr_interp, False,
            )
        else:  # pragma: no cover - fr start eps is always uniform
            if b > values_t.shape[0]:
                values_t = jnp.concatenate(
                    [values_t,
                     jnp.zeros((b - values_t.shape[0], m_, n_), dtype)]
                )
            states = _fr_batch_init(values_t, jnp.asarray(start_eps_h))
            if b != real_b:
                states = states._replace(
                    done=jnp.asarray(np.arange(b) >= real_b)
                )
            states, _ = fr_chunk_pallas(
                values_t, states, rounds, interpret=fr_interp,
            )
            packed_dev = _fr_pack_results_with_objective(
                states, values_t, negate
            )
        while True:
            packed = np.asarray(packed_dev)
            half = n // 2
            done_h = packed[:, half + 1] != 0
            undone = np.nonzero(~done_h)[0]
            trace_host(
                "fr fused: rounds={} undone={}/{}", rounds, len(undone), b
            )
            tail_cut = max(tail_count, 128) if work_host is not None else 0
            if len(undone) <= tail_cut or rounds >= max_iterations:
                break
            # hard stragglers with no host costs to fall back on: keep
            # the undone-first bucket running on device
            if work_host is None and len(undone) <= 128:
                states = _fr_continue_bucket(
                    values_t, states, 128, 512, fr_interp
                )
                rounds += 512
                packed_dev = _fr_pack_results_with_objective(
                    states, values_t, negate
                )
                continue
            # rare: a hard batch — keep running fused rounds
            states, _ = fr_chunk_pallas(
                values_t, states, 128, interpret=fr_interp
            )
            rounds += 128
            packed_dev = _fr_pack_results_with_objective(
                states, values_t, negate
            )
        global LAST_TAIL_COUNT
        LAST_TAIL_COUNT = len(undone)
        out_p2o[:] = _unpack_p2o_u16(packed[:, :half], n)
        out_nits[:] = packed[:, half]
        out_eps[:] = tail_eps
        if work_host is None:
            words = np.ascontiguousarray(
                packed[:, half + 2:half + 4]
            ).view(np.float32)
            out_obj = words[:, 0].astype(np.float64) + words[:, 1]
        # o2p from p2o host-side (the matching is a bijection on the
        # assigned pairs) — cheaper than reading it back
        out_o2p[:] = o2p_from_p2o(out_p2o, m)
        if work_host is not None and len(undone) and rounds < max_iterations:
            from concurrent.futures import ThreadPoolExecutor

            trace_host(
                "fr fused: native tail finishing {} stragglers",
                len(undone),
            )
            costs_host, maximize = work_host

            def finish(i):
                row = np.asarray(costs_host[i], dtype=np.float64)
                p2o_i, o2p_i, _ = _cpu_tail_forward(
                    row if maximize else -row, tail_eps, max_iterations
                )
                return i, p2o_i, o2p_i

            workers = max(1, min(ncores, len(undone)))
            with ThreadPoolExecutor(max_workers=workers) as ex:
                for i, p2o_i, o2p_i in ex.map(finish, undone):
                    out_p2o[i] = p2o_i
                    out_o2p[i] = o2p_i
                    out_nits[i] = rounds
        out_p2o = out_p2o[:real_b]
        out_o2p = out_o2p[:real_b]
        num_unassigned = (out_p2o == UNASSIGNED).sum(axis=1).astype(np.int32)
        return (
            out_p2o, out_o2p, num_unassigned, out_eps[:real_b],
            out_nits[:real_b],
            out_obj[:real_b] if out_obj is not None else None,
        )

    def save_rows(rows):
        """Read back the full (bucket-sized, fixed-shape) state and
        store the given slot rows host-side."""
        out_p2o[orig[rows]] = np.asarray(states.p2o)[rows]
        out_o2p[orig[rows]] = np.asarray(states.o2p)[rows]
        out_eps[orig[rows]] = np.asarray(states.eps)[rows]
        out_nits[orig[rows]] = np.asarray(states.nits)[rows]

    cur_b = b
    rounds = 0
    undone = None
    done_mask = None
    while True:
        # chunk schedule for the XLA rounds (the fused-kernel path
        # returned above): rounds cost ~2.7 ms each at full batch, so
        # keep finer chunks, widening once the batch has drained
        level_chunk = chunk if cur_b >= 128 else 4 * chunk
        states, _ = _batch_chunk_fr(
            values_t, states, target_eps, toleration,
            max_iterations, level_chunk, sfoe,
        )
        rounds += level_chunk
        # single host sync per chunk: the done vector readback
        done_mask = np.asarray(states.done)
        undone = np.nonzero(~done_mask)[0]
        n_undone = len(undone)
        if n_undone == 0 or rounds >= max_iterations:
            undone = None
            break
        if (
            work_host is not None
            and rounds >= tail_rounds
            and n_undone <= tail_count
        ):
            break  # finish the stragglers on the CPU
        target_b = max(min_bucket, 1 << (n_undone - 1).bit_length())
        if target_b <= cur_b // 2:
            fin = np.nonzero(done_mask)[0]
            save_rows(fin)
            pad = target_b - n_undone
            perm = np.concatenate([undone, fin[:pad]]) if pad else undone
            orig = orig[perm]
            values_t, states = _fr_compact(
                values_t, states, jnp.asarray(perm)
            )
            cur_b = target_b

    if undone is not None and len(undone) and work_host is not None:
        # native sequential tail: each straggler is a small independent
        # instance; ctypes releases the GIL, so thread across host cores
        from concurrent.futures import ThreadPoolExecutor

        costs_host, maximize = work_host
        save_rows(np.nonzero(done_mask)[0])
        rows_orig = orig[undone]

        def finish(i_orig):
            row = np.asarray(costs_host[i_orig], dtype=np.float64)
            p2o_i, o2p_i, _ = _cpu_tail_forward(
                row if maximize else -row, tail_eps, max_iterations
            )
            return i_orig, p2o_i, o2p_i

        workers = min(ncores, len(rows_orig))
        with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
            for i_orig, p2o_i, o2p_i in ex.map(finish, rows_orig):
                out_p2o[i_orig] = p2o_i
                out_o2p[i_orig] = o2p_i
                out_eps[i_orig] = tail_eps
                out_nits[i_orig] = rounds
    else:
        save_rows(np.arange(cur_b))

    num_unassigned = (out_p2o == UNASSIGNED).sum(axis=1).astype(np.int32)
    return out_p2o, out_o2p, num_unassigned, out_eps, out_nits, out_obj


class _FlatForwardState(NamedTuple):
    """Scan state of the Pallas forward chunk — the kernel's flat padded
    layouts plus the per-instance ε-scaling scalars.  A dedicated type
    (not ForwardState) so no field ever holds stale placeholder data."""

    prices2: jnp.ndarray   # [B*M, 1]
    p2o_pad2: jnp.ndarray  # [B*8, N] (row 0 of each group live)
    o2p2: jnp.ndarray      # [B*M, 1]
    eps: jnp.ndarray       # [B]
    nits: jnp.ndarray      # [B]
    nreductions: jnp.ndarray
    optimal_found: jnp.ndarray
    done: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "chunk", "sfoe", "interpret"),
)
def _batch_chunk_pallas(
    values_t,  # [B, M, N]
    states: ForwardState,
    target_eps,
    toleration,
    max_iterations: int,
    chunk: int,
    sfoe: bool,
    interpret: bool = False,
):
    """Forward-auction chunk built on the fused Pallas round kernel
    (ops/pallas_dense.py): the whole round is one VMEM-resident kernel,
    with only the per-instance ε-scaling bookkeeping in XLA.  The scan
    carries ``_FlatForwardState`` (pad/unpad once per chunk, not per
    round); the returned ForwardState's ``o2p`` is stale by design —
    keep-valid phases only ever write it, and the caller reconstructs
    it from the final ``p2o``."""
    from .ops.pallas_dense import fused_dense_round_batch_flat

    dtype = values_t.dtype
    b, m, n = values_t.shape
    vals2 = values_t.reshape(b * m, n)

    init = _FlatForwardState(
        prices2=states.prices.reshape(b * m, 1),
        p2o_pad2=jnp.zeros((b, 8, n), jnp.int32)
        .at[:, 0, :].set(states.p2o).reshape(b * 8, n),
        o2p2=states.o2p.reshape(b * m, 1),
        eps=states.eps,
        nits=states.nits,
        nreductions=states.nreductions,
        optimal_found=states.optimal_found,
        done=states.done,
    )

    def body(s: _FlatForwardState, _):
        prices2, p2o_pad2, o2p2, chosen_pad, maxp_pad = (
            fused_dense_round_batch_flat(
                vals2, s.prices2, s.p2o_pad2, s.o2p2, s.eps, s.done,
                b, m, n, interpret=interpret,
            )
        )
        p2o = p2o_pad2.reshape(b, 8, n)[:, 0, :]
        chosen = chosen_pad.reshape(b, 8, n)[:, 0, :]
        maxp = maxp_pad.reshape(b, 8, n)[:, 0, :]
        nits = s.nits + (~s.done).astype(jnp.int32)
        num_unassigned = jnp.sum(p2o == UNASSIGNED, axis=1, dtype=jnp.int32)
        fully = (num_unassigned == 0) & ~s.done
        is_optimal = jnp.all(
            chosen + toleration >= maxp - target_eps, axis=1
        )
        if sfoe:
            is_optimal = jnp.ones_like(is_optimal)
        stop = is_optimal | (s.eps < target_eps)
        reduce = fully & ~stop
        eps = jnp.where(reduce, s.eps * jnp.asarray(0.15, dtype), s.eps)
        # keep-valid pairs at the reduced eps (see forward_round)
        release = reduce[:, None] & ~(
            (p2o != _INT_MAX)
            & (chosen + toleration >= maxp - eps[:, None])
        )
        p2o_pad2 = (
            p2o_pad2.reshape(b, 8, n)
            .at[:, 0, :].set(jnp.where(release, _INT_MAX, p2o))
            .reshape(b * 8, n)
        )
        done = s.done | (fully & stop) | (nits >= max_iterations)
        return _FlatForwardState(
            prices2=prices2,
            p2o_pad2=p2o_pad2,
            o2p2=o2p2,
            eps=eps,
            nits=nits,
            nreductions=s.nreductions + reduce.astype(jnp.int32),
            optimal_found=s.optimal_found | (fully & is_optimal),
            done=done,
        ), None

    s, _ = lax.scan(body, init, None, length=chunk)
    states = ForwardState(
        prices=s.prices2.reshape(b, m),
        p2o=s.p2o_pad2.reshape(b, 8, n)[:, 0, :],
        o2p=s.o2p2.reshape(b, m),
        eps=s.eps,
        nits=s.nits,
        nreductions=s.nreductions,
        optimal_found=s.optimal_found,
        done=s.done,
    )
    return states, jnp.all(states.done)


def _pallas_usable(solver: str, n: int, m: int, dtype) -> bool:
    # n*m cap: the grid-over-batch round kernel keeps one whole [M, N]
    # instance plus temporaries in scoped VMEM (~28 MB at 1536² vs the
    # 16 MB compiler default) — beyond 1024² fall back to XLA rounds
    # instead of failing compilation.
    return (
        solver == "forward"
        and n % 128 == 0
        and m % 8 == 0
        and n * m <= 1024 * 1024
        and np.dtype(dtype) == np.float32
    )


def _solve_batch_dense(
    values_t, eps, target_eps, toleration, thresholds,
    solver: str, max_iterations: int, n: int, m: int, chunk: int = 64,
    work_host=None, negate: bool = True, tail_eps: float | None = None,
):
    b = values_t.shape[0]
    dtype = values_t.dtype
    np_dtype = np.dtype(dtype)
    eps = np_dtype.type(eps)
    if solver == "fr":
        return _solve_batch_fr(
            values_t, work_host, target_eps, toleration, thresholds,
            max_iterations, n, m, negate=negate, tail_eps=tail_eps,
        )
    target_eps = np_dtype.type(target_eps)
    toleration = np_dtype.type(toleration)
    thresholds = jnp.asarray(np.asarray(thresholds), dtype)

    if solver == "khosla":
        states = KhoslaState(
            prices=jnp.zeros((b, m), dtype),
            p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
            o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
            dropped=jnp.zeros((b, n), bool),
            nits=jnp.zeros((b,), jnp.int32),
        )
    elif solver == "forward":
        states = ForwardState(
            prices=jnp.zeros((b, m), dtype),
            p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
            o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
            eps=thresholds,  # start eps = C/2 per instance
            nits=jnp.zeros((b,), jnp.int32),
            nreductions=jnp.zeros((b,), jnp.int32),
            optimal_found=jnp.zeros((b,), bool),
            done=jnp.zeros((b,), bool),
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown solver {solver!r}")

    on_cpu = jax.default_backend() == "cpu"
    fwd_interp = _FORWARD_PALLAS_INTERPRET_ON_CPU and on_cpu
    use_pallas = _pallas_usable(solver, n, m, dtype) and (
        not on_cpu or fwd_interp
    )
    rounds = 0
    while True:
        if use_pallas:
            states, alldone = _batch_chunk_pallas(
                values_t, states, target_eps, toleration,
                max_iterations, chunk, n != m, interpret=fwd_interp,
            )
        else:
            states, alldone = _batch_chunk(
                values_t, states, eps, target_eps, toleration, thresholds,
                solver, max_iterations, chunk, n, m,
            )
        rounds += chunk
        if bool(alldone) or rounds >= max_iterations:
            break

    num_unassigned = jnp.sum(
        states.p2o == UNASSIGNED, axis=1, dtype=jnp.int32
    )
    if solver == "khosla":
        final_eps = jnp.broadcast_to(
            jnp.asarray(eps, dtype), states.nits.shape
        )
    else:
        final_eps = states.eps
    return states.p2o, states.o2p, num_unassigned, final_eps, states.nits, None


def solve_batch(
    costs,
    maximize: bool = False,
    solver: str = "auto",
    eps: Optional[float] = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
    start_eps_divisor: float = 128.0,
    costs_device=None,
    integer: Optional[bool] = None,
    max_cost: Optional[float] = None,
) -> BatchSolution:
    """Solve a batch of dense LAP instances ``costs[B, N, M]`` (N <= M).

    Parameters mirror the single-instance ``solve`` (`solver.rs:15-20`):
    ``eps`` defaults to ``1/M`` for the Khosla engine (`ksparse.rs:164-168`)
    and ``1/N`` target for the forward and fr engines
    (`symmetric.rs:231-235`).
    ``solver``: ``"auto"`` (default — the measured-fastest correct
    engine: ``"fr"`` on square instances, ``"forward"`` otherwise, the
    batch analogue of ``solve(engine="auto")``), ``"forward"`` (Jacobi
    forward auction with ε-scaling, reference semantics), ``"fr"``
    (combined forward-reverse auction, ``ops/fr_dense.py`` — same ε-CS
    certificate, far fewer rounds on symmetric instances; falls back to
    forward when N != M), or ``"khosla"``.
    ``dtype`` defaults to float32 — the TPU fast path; use float64 when the
    cost range demands it (eps below ~1 ulp of the largest cost stalls in
    float32).
    ``costs_device``: optionally a device-resident ``[B, N, M]`` array
    with the same contents as ``costs`` — skips the host→device
    transfer (stage batches ahead of time to overlap transfer with
    compute; mirrors the reference bench's setup/measure split,
    `benchmark.rs:111-125`).

    **Device-resident mode**: pass ``costs=None`` with only
    ``costs_device`` (``solver="fr"`` square instances) and the solve
    never touches host memory — the objective is evaluated on device
    and rides the single packed readback, and stragglers finish with
    on-device continuation instead of the native tail.  This is the
    full production path for device-generated workloads (no PCIe/tunnel
    ingress at all).

    **Integer-auction mode** (``integer``): integer-valued costs on
    square fused-kernel-sized instances run the whole auction on a
    scaled-int32 lattice (``cost * D``, ε = 1 with ``D = 1/ε``) where
    the kernel's packed value+index selection keys are *exact* — the
    measured fast path (~15 % fewer round cycles, and bit-exact results
    by construction rather than up to f32 rounding).  ``integer=None``
    auto-detects on host costs (integer dtype, or integral values on
    moderate sizes); ``integer=True`` opts device-resident inputs in
    and then requires ``max_cost`` (the key-range guard needs the max
    absolute cost, and a device max would cost a tunnel readback);
    ``integer=False`` forces the float path.  When the caller's ε is
    not a unit fraction the lattice uses the next finer one
    (``D = ceil(1/eps)``, reported in ``BatchSolution.eps``).
    """
    if solver == "auto":
        # square → the combined forward-reverse engine (measured faster
        # at every size, incl. the streaming big-single path beyond the
        # VMEM-kernel regime); asymmetric → forward (reverse bidding
        # needs every object matchable).  fr itself falls back to
        # forward on N != M below, so "auto" simply resolves to "fr".
        solver = "fr"
    if costs is None:
        if costs_device is None:
            raise ValueError("pass costs, costs_device, or both")
        if solver != "fr":
            raise ValueError(
                "device-resident mode (costs=None) requires solver='fr'"
            )
        b, n, m = costs_device.shape
    else:
        costs = np.asarray(costs)
        if costs.ndim != 3:
            raise ValueError("costs must be [batch, num_rows, num_cols]")
        b, n, m = costs.shape
    if n > m:
        raise ValueError("num_rows must be <= num_cols")
    if costs is None and n != m:
        raise ValueError("device-resident mode requires square instances")
    if solver == "fr" and n != m:
        # reverse bidding requires every object to be matchable; the
        # forward-only engine covers asymmetric instances (the same
        # restriction the reference puts on ε-scaling,
        # `symmetric.rs:256-267`)
        solver = "forward"

    # internal convention: always maximize profit.  Host costs stay in
    # [B, N, M] layout; the transpose to the [B, M, N] round layout and
    # the sign flip run on-device (host transposes of 100+ MB cost
    # seconds, and staging device-resident costs skips the transfer —
    # the analogue of the reference bench's iter_batched setup exclusion,
    # `benchmark.rs:111-125`).
    int_scale = (
        _integer_scale(costs, eps, n, m, integer, max_cost)
        if solver == "fr"
        else None
    )
    if costs_device is not None:
        if costs is not None and costs_device.shape != costs.shape:
            raise ValueError("costs_device must match costs' shape")
        costs_dev = jnp.asarray(costs_device, dtype)
    else:
        costs_dev = jnp.asarray(costs.astype(dtype))
    if int_scale is not None:
        trace_host("solve_batch: integer-auction mode, scale={}", int_scale)
        values_t = _stage_values_t_int(costs_dev, not maximize, int_scale)
    else:
        values_t = _stage_values_t(costs_dev, not maximize)  # [B, M(K), N]

    if solver == "khosla":
        work = costs if maximize else -costs
        eps_val = float(eps) if eps is not None else 1.0 / m
        w_span = work.reshape(b, -1).max(axis=1) - work.reshape(b, -1).min(
            axis=1
        )
        thresholds = (m / 2.0) * (w_span + eps_val)  # ksparse.rs:181
        target_eps = toleration = 0.0
    elif solver == "fr":
        # the combined forward-reverse auction needs no ε-scaling: it
        # terminates in ~n/2 rounds starting directly at the target ε
        # (measured: 74–135 rounds at 256×256 vs 700–900 for the scaled
        # forward auction), because free objects cut their own price
        # instead of waiting out price wars.  Certificate passes are
        # skipped (full assignment == certificate at the target ε), so
        # the toleration is unused.
        if int_scale is not None:
            eps_val = 1.0  # lattice ε; original units: 1 / int_scale
        else:
            eps_val = float(eps) if eps is not None else 1.0 / n
        thresholds = np.full(b, eps_val)
        target_eps = eps_val
        toleration = 0.0
    else:
        work = costs if maximize else -costs
        eps_val = float(eps) if eps is not None else 1.0 / n
        c = np.abs(work.reshape(b, -1)).max(axis=1)
        # start eps: the reference uses C/2 (symmetric.rs:268-273); a
        # smaller start converges in markedly fewer Jacobi rounds on
        # dense instances (keep-valid-pairs makes later phases cheap)
        thresholds = np.where(n == m, c / start_eps_divisor, eps_val)
        target_eps = eps_val
        toleration = float(
            2.0 ** (max(0, int(np.log2(float(c.max()) + 1e-7))) - 53)
        )

    p2o, o2p, num_unassigned, final_eps, nits, obj_dev = _solve_batch_dense(
        values_t,
        float(eps_val),
        float(target_eps),
        float(toleration),
        np.asarray(thresholds, dtype=np.float64),
        solver,
        int(max_iterations),
        n,
        m,
        work_host=(costs, maximize) if costs is not None else None,
        negate=not maximize,
        tail_eps=(1.0 / int_scale) if int_scale is not None else None,
    )

    p2o_np = np.asarray(p2o)
    assigned = p2o_np != UNASSIGNED
    # reconstruct object_to_person from the final matching (keep-valid
    # phases leave o2p stale by design, see forward_round)
    o2p = o2p_from_p2o(p2o_np, m)
    if costs is None:
        if obj_dev is None:  # non-fused device-resident path
            obj_dev = np.asarray(_device_objective(
                values_t, jnp.asarray(p2o_np), not maximize
            ))
        objective = np.asarray(obj_dev, dtype=np.float64)
        if int_scale is not None:
            # device objective summed lattice values: back to original
            # units (exact — every summand is an original int × scale)
            objective = objective / int_scale
    else:
        safe = np.where(assigned, p2o_np, 0)
        costs64 = costs if costs.dtype == np.float64 else costs.astype(
            np.float64
        )
        picked = np.take_along_axis(
            costs64, safe[:, :, None], axis=2
        )[:, :, 0]
        objective = np.where(assigned, picked, 0.0).sum(axis=1)

    final_eps = np.asarray(final_eps, dtype=np.float64)
    if int_scale is not None:
        # lattice ε = 1 corresponds to 1/scale in original cost units
        final_eps = np.full(b, 1.0 / int_scale)
    return BatchSolution(
        person_to_object=p2o_np,
        object_to_person=np.asarray(o2p),
        num_unassigned=np.asarray(num_unassigned),
        objective=objective,
        eps=final_eps,
        nits=np.asarray(nits),
    )


def solve_batch_stream(
    device_batches,
    maximize: bool = False,
    eps: Optional[float] = None,
    dtype=np.float32,
    max_iterations: int = 100_000,
    integer: Optional[bool] = None,
    max_cost: Optional[float] = None,
    window: int = 2,
    interpret: bool = False,
):
    """Pipelined device-resident batched solves — the sustained-
    throughput mode (north star protocol; the reference's analogue is
    criterion's sustained-iteration loop, `benchmark.rs:81-157`).

    ``device_batches`` is a sequence of device-resident ``[B, N, N]``
    cost arrays (all the same shape).  Each batch runs the fused
    forward-reverse program (one deep-budget kernel call); up to ``window``
    batches are in flight at once, so the packed-result readback of
    batch *i* (~115 ms for 2 MB at B=4096 through this environment's
    tunnel — pure host-side wait) overlaps the device compute of batch
    *i+1* via JAX's async dispatch.  Measured decomposition at
    4096×256² int mode: 0.43 s kernel rounds + 0.07 s grid entry +
    0.11 s readback — the serial per-call protocol pays the readback,
    this mode hides it.

    Semantics per batch are identical to
    ``solve_batch(None, costs_device=batch, solver="fr", ...)``;
    returns ``list[BatchSolution]`` in input order.  Instances must be
    square (the forward-reverse engine's requirement); non-fused
    regimes (odd tile sizes, beyond-VMEM instances, CPU backend
    without ``interpret``) fall back to sequential ``solve_batch``
    calls.  ``window`` bounds device memory: at most ``window``
    staged ``[B, N, N]`` value arrays are live (1 GB each at
    4096×256² int32).
    """
    device_batches = list(device_batches)
    if not device_batches:
        return []
    b, n, m = device_batches[0].shape
    for d in device_batches[1:]:
        if d.shape != (b, n, m):
            raise ValueError("all batches must share one shape")
    if n != m:
        raise ValueError("streamed mode requires square instances")
    np_dtype = np.dtype(dtype)
    int_scale = _integer_scale(None, eps, n, m, integer, max_cost)
    fused_ok = (
        (int_scale is not None or np_dtype == np.float32)
        and n % 128 == 0
        and m % 8 == 0
        and n * m <= 1024 * 1024
        and (jax.default_backend() not in ("cpu",) or interpret)
    )
    if not fused_ok:
        return [
            solve_batch(
                None, maximize=maximize, solver="fr", eps=eps,
                dtype=dtype, max_iterations=max_iterations,
                costs_device=d, integer=integer, max_cost=max_cost,
            )
            for d in device_batches
        ]

    if int_scale is not None:
        eps_val = 1.0
        tail_eps = 1.0 / int_scale
        trace_host(
            "solve_batch_stream: integer-auction mode, scale={}",
            int_scale,
        )
    else:
        eps_val = float(eps) if eps is not None else 1.0 / n
        tail_eps = eps_val
    negate = not maximize
    # same batch-size bucketing as _solve_batch_fr: one Mosaic program
    # per power-of-two bucket, padding slots done-marked at init
    pad_b = b
    if _FR_B_BUCKET_FLOOR:
        pad_b = max(
            _FR_B_BUCKET_FLOOR, 1 << max(0, int(b - 1).bit_length())
        )
    base_rounds = _fr_fused_schedule(pad_b, n, max_iterations)

    def dispatch(dev):
        # ONE submit per batch: staging + bucket-pad + init + deep
        # kernel + packed results fused into a single program
        # (_fr_fused_solve) — the former 4-6 submit chain cost ~10 ms
        # of serial host wall each, the stream ledger's last
        # non-overlapped term (VERDICT r4 item 2)
        return _fr_fused_solve(
            jnp.asarray(dev, dtype), eps_val, base_rounds, pad_b, b,
            negate, int_scale or 0, interpret, True,
        )

    def finish(vt, st, packed_dev):
        rounds = base_rounds
        half = n // 2
        while True:
            packed = np.asarray(packed_dev)  # the ONE blocking readback
            done_h = packed[:, half + 1] != 0
            undone = int((~done_h).sum())  # padded rows are born done
            trace_host(
                "fr stream: rounds={} undone={}/{}", rounds, undone, b
            )
            if undone == 0 or rounds >= max_iterations:
                break
            # rare hard stragglers: keep them on device (same policy as
            # the device-resident branch of _solve_batch_fr)
            if undone <= 128:
                st = _fr_continue_bucket(vt, st, 128, 512, interpret)
                rounds += 512
            else:
                st, _ = fr_chunk_pallas(vt, st, 128, interpret)
                rounds += 128
            packed_dev = _fr_pack_results_with_objective(st, vt, negate)
        packed = packed[:b]  # drop the bucket-padding rows
        p2o = _unpack_p2o_u16(packed[:, :half], n)
        words = np.ascontiguousarray(
            packed[:, half + 2:half + 4]
        ).view(np.float32)
        objective = words[:, 0].astype(np.float64) + words[:, 1]
        if int_scale is not None:
            objective = objective / int_scale
        return BatchSolution(
            person_to_object=p2o,
            object_to_person=o2p_from_p2o(p2o, m),
            num_unassigned=(p2o == UNASSIGNED).sum(axis=1).astype(
                np.int32
            ),
            objective=objective,
            eps=np.full(b, tail_eps),
            nits=packed[:, half].astype(np.int32),
        )

    from collections import deque

    results = []
    pending: deque = deque()
    for dev in device_batches:
        pending.append(dispatch(dev))
        # drain at window so at most `window` staged batches are ever
        # live (the documented device-memory bound); window >= 2 keeps
        # the oldest batch's readback overlapped with device compute
        while len(pending) >= max(1, window):
            results.append(finish(*pending.popleft()))
    while pending:
        results.append(finish(*pending.popleft()))
    return results


class BatchedLAP:
    """Reusable compiled batched solver for a fixed (B, N, M) shape —
    the batch analogue of the reference's capacity-reuse pattern
    (README.md:27-29): compile once, then stream batches through."""

    def __init__(
        self,
        batch: int,
        num_rows: int,
        num_cols: int,
        solver: str = "forward",
        dtype=np.float32,
        maximize: bool = False,
        eps: Optional[float] = None,
        max_iterations: int = 100_000,
    ):
        self.batch = batch
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.solver = solver
        self.dtype = np.dtype(dtype)
        self.maximize = maximize
        self.eps = eps
        self.max_iterations = max_iterations

    def stage(self, costs):
        """Ship ``costs`` to the device ahead of time (overlap transfer
        with other work); pass the result as ``costs_device``."""
        import jax.numpy as jnp

        return jnp.asarray(np.asarray(costs).astype(self.dtype))

    def solve(self, costs, costs_device=None) -> BatchSolution:
        costs = np.asarray(costs)
        expect = (self.batch, self.num_rows, self.num_cols)
        if costs.shape != expect:
            raise ValueError(f"expected costs of shape {expect}, got {costs.shape}")
        return solve_batch(
            costs,
            maximize=self.maximize,
            solver=self.solver,
            eps=self.eps,
            dtype=self.dtype,
            max_iterations=self.max_iterations,
            costs_device=costs_device,
        )


def linear_sum_assignment(cost_matrix, maximize: bool = False,
                          eps: Optional[float] = None,
                          dtype=np.float32):
    """Drop-in ``scipy.optimize.linear_sum_assignment`` convenience
    wrapper over the auto-routed dense engines (adoption shim — the
    reference crate has no such entry point; its closest analogue is
    the one-call ``solve`` contract, `solver.rs:15-20`).

    Returns ``(row_ind, col_ind)`` with ``row_ind`` sorted, exactly
    like scipy: ``cost_matrix[row_ind, col_ind].sum()`` is the matching
    objective.  Rectangular matrices are supported in both
    orientations (a tall matrix is solved transposed, as scipy does).

    Exactness contract: with integer-valued costs the default
    ``eps`` (``1/(min(n,m)+1)``, strictly inside the ``n·eps < 1``
    bound) makes the result exactly optimal; with arbitrary float
    costs it is ε-optimal (objective within ``min(n,m)·eps`` of the
    optimum — pass a smaller ``eps`` and/or ``dtype=np.float64`` to
    tighten).  Entries must be finite (the auction engines treat every
    arc as biddable; encode missing arcs via the sparse solvers
    instead).
    """
    c = np.asarray(cost_matrix)
    if c.ndim != 2:
        raise ValueError("expected a 2-D cost matrix")
    if not np.isfinite(c).all():
        raise ValueError(
            "matrix contains non-finite entries; use KhoslaSolver / "
            "solve_batch_sparse for instances with missing arcs"
        )
    n, m = c.shape
    if n == 0 or m == 0:
        return (np.empty(0, dtype=np.intp),) * 2
    transposed = n > m
    work = np.ascontiguousarray(c.T) if transposed else c
    if eps is None:
        eps = 1.0 / (work.shape[0] + 1)
    # entries past the f32 mantissa would be quantized BEFORE the
    # auction runs, silently breaking the integer-exactness contract
    # (and loosening the float ε bound): promote to f64 automatically
    if np.dtype(dtype) == np.float32 and float(np.abs(c).max()) >= 2.0**24:
        dtype = np.float64
    sol = solve_batch(work[None], maximize=maximize, eps=eps,
                      dtype=dtype)
    if int(sol.num_unassigned[0]) != 0:  # pragma: no cover - finite
        raise ValueError("cost matrix is infeasible")
    p2o = sol.person_to_object[0].astype(np.intp)
    rows = np.arange(work.shape[0], dtype=np.intp)
    if transposed:
        order = np.argsort(p2o)
        return p2o[order], rows[order]
    return rows, p2o


# ----------------------------------------------------------------------
# Batched SPARSE mode (the reference's k-sparse domain, vmapped)
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("max_rounds", "chunk"))
def _batch_chunk_sparse(
    row_cols,     # [B, K, N]
    row_vals,     # [B, K, N]
    row_mask,     # [B, K, N]
    col_persons,  # [B, Kc, M]
    col_mask,     # [B, Kc, M]
    states: KhoslaState,
    eps,          # scalar
    thresholds,   # [B]
    max_rounds: int,
    chunk: int,
):
    """``chunk`` vmapped Khosla rounds over a batch of padded sparse
    instances (same fixed-length-scan structure as ``_batch_chunk``)."""
    from .ops.padded import PaddedProblem

    def one(rc, rv, rm, cp, cm, state, threshold):
        problem = PaddedProblem(rc, rv, rm, cp, cm)

        def body(s, _):
            return khosla_round(problem, s, eps, threshold), None

        state, _ = lax.scan(body, state, None, length=chunk)
        return state

    states = jax.vmap(one)(
        row_cols, row_vals, row_mask, col_persons, col_mask,
        states, thresholds,
    )
    active = jnp.sum(
        (states.p2o == UNASSIGNED) & ~states.dropped,
        axis=1, dtype=jnp.int32,
    )
    alldone = jnp.all(active == 0) | jnp.all(states.nits >= max_rounds)
    return states, alldone


#: test hook — run the batched-sparse Khosla kernel
#: (ops/pallas_ksparse.py) in interpret mode on the CPU backend
_SPARSE_KERNEL_INTERPRET_ON_CPU = False


def _sparse_densify(columns, arc_mask, work, num_cols: int, dtype,
                    person_major: bool = False):
    """Compact each instance's referenced columns into a local dense
    object space and scatter the arc values into a ``[B, M', N]``
    object-major plane (−inf at non-arcs).

    Rationale (the batched-sparse fast path, VERDICT r4 item 1): the
    padded dual layout's rounds gather ``prices[row_cols]`` and
    ``bid[col_persons]`` — per-element gathers run ~8 ns serialized on
    this backend (docs/PERFORMANCE.md pitfalls), which is catastrophic
    vmapped over thousands of instances.  Densifying turns every
    gather into the dense round's broadcasts and reductions (the same
    ``khosla_round`` dense path the batched dense mode runs), at the
    cost of scanning −inf padding: with k-sparse instances on
    ``m = 4–8n`` objects the referenced-column compaction keeps the
    inflation bounded by ``M'/nk ≲ m(1−e^{−nk/m})/nk``.

    Column compaction is sorted by original id, so the dense round's
    smallest-local-index tie rule equals smallest-original-column —
    deterministic, like every engine here.

    ``person_major``: emit the ``[B, N, M']`` plane the fused Mosaic
    kernel wants (persons on sublanes, objects lane-tile-aligned to
    128); default emits the object-major ``[B, M', N]`` plane of the
    XLA chunk path (sublane-aligned to 8).

    Returns ``(values plane, used_cols [B, M'] int64, used_count [B])``.
    """
    b, n, k = columns.shape
    flat_cols = np.where(arc_mask, columns, 0).astype(np.int64)
    keys = (
        np.arange(b, dtype=np.int64)[:, None, None] * num_cols + flat_cols
    )[arc_mask]
    uniq = np.unique(keys)  # sorted (b-major, then column id)
    owner = uniq // num_cols
    counts = np.bincount(owner, minlength=b)
    m_used = int(counts.max()) if counts.size else 1
    if person_major:
        # POWER-OF-TWO lane width, not just a 128 multiple: the fused
        # lane-halving top-2 only halves while the width divides by
        # 256, so e.g. 1408 lanes (11 tiles) degrade every per-round
        # tree to full-width masked scans — measured 12× slower than
        # the power-of-two plane (the compaction A/B, round 5).  The
        # ≤2× padding is -inf columns nobody ever bids.
        mp = max(128, 1 << (m_used - 1).bit_length())
    else:
        mp = max(8, -(-m_used // 8) * 8)
    starts = np.concatenate([[0], np.cumsum(counts)])
    local_of_uniq = np.arange(uniq.size, dtype=np.int64) - starts[owner]
    used_cols = np.zeros((b, mp), dtype=np.int64)
    used_cols[owner, local_of_uniq] = uniq % num_cols

    arc_local = local_of_uniq[np.searchsorted(uniq, keys)]
    persons = np.broadcast_to(
        np.arange(n, dtype=np.int64)[None, :, None], columns.shape
    )[arc_mask]
    if person_major:
        vt = np.full((b, n, mp), -np.inf, dtype=dtype)
        vt[keys // num_cols, persons, arc_local] = (
            work[arc_mask].astype(dtype)
        )
    else:
        vt = np.full((b, mp, n), -np.inf, dtype=dtype)
        vt[keys // num_cols, arc_local, persons] = (
            work[arc_mask].astype(dtype)
        )
    return vt, used_cols, counts


#: batch-sparse auto-engine: densified bytes above this route to the
#: padded-gather path instead (the dense plane plus its staging copy
#: must fit HBM comfortably next to the state planes)
_SPARSE_DENSE_MAX_BYTES = 6 << 30


#: kernel-route round budget: p99 round count on the target instance
#: class is < 10 (exp_batch_sparse.py), the early exit makes unused
#: budget free, and a single static budget keeps one compiled program
_SPARSE_KERNEL_BUDGET = 64


@jax.jit
def _sparse_batch_init(values_t):
    """Jitted batched Khosla state init (op-by-op inits cost a dispatch
    each through the tunnel; one program is ~ms)."""
    b, mp, n = values_t.shape
    dtype = values_t.dtype
    return KhoslaState(
        prices=jnp.zeros((b, mp), dtype),
        p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
        o2p=jnp.full((b, mp), _INT_MAX, jnp.int32),
        dropped=jnp.zeros((b, n), bool),
        nits=jnp.zeros((b,), jnp.int32),
    )


@jax.jit
def _sparse_batch_init_nm(values_nm):
    """Person-major ([B, N, M']) variant for the kernel route."""
    b, n, mp = values_nm.shape
    dtype = values_nm.dtype
    return KhoslaState(
        prices=jnp.zeros((b, mp), dtype),
        p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
        o2p=jnp.full((b, mp), _INT_MAX, jnp.int32),
        dropped=jnp.zeros((b, n), bool),
        nits=jnp.zeros((b,), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("chunk", "u16"))
def _sparse_chunk_pack(values_t, states: KhoslaState, eps, thresholds,
                       chunk: int, u16: bool):
    """``chunk`` vmapped dense Khosla rounds + ONE packed result plane.

    The first hardware sweep of the batch-sparse mode measured the
    solve 95% overhead: ~20 ms of device rounds inside a 0.44 s call
    (exp_batch_sparse.py round-5 records) — the separate alldone sync,
    the plain [B, N] int32 readback, and the chunk dispatch each paid
    tunnel latency.  This fuses rounds + result packing into one
    program whose single ``[B, N/2 + 1]`` int32 output (u16 p2o pairs |
    nits) is the only readback; the done check rides the same plane
    (an instance is done iff no 0xFFFF sentinel remains).  Dropped
    persons travel as a second sentinel (0xFFFE / INT_MAX−1) instead
    of a separate bitmask plane.  Returns (states, packed): states stay
    on device for the (rare) continuation call.
    """
    b, mp, n = values_t.shape

    def one(vals_t, state, threshold):
        problem = DenseProblem(vals_t)

        def body(s, _):
            return khosla_round(problem, s, eps, threshold), None

        state, _ = lax.scan(body, state, None, length=chunk)
        return state

    states = jax.vmap(one)(values_t, states, thresholds)
    return states, _sparse_encode(states, u16)


def _sparse_encode(states: KhoslaState, u16: bool):
    """Wire encoding shared by the XLA and kernel chunk programs:
    u16 pairs (0xFFFF = active, 0xFFFE = dropped) or plain int32
    (INT_MAX = active, INT_MAX−1 = dropped), nits appended."""
    unassigned = states.p2o == _INT_MAX
    if u16:
        enc = jnp.where(
            unassigned,
            jnp.where(states.dropped, jnp.int32(0xFFFE), jnp.int32(0xFFFF)),
            states.p2o,
        )
        p2o_pack = enc[:, 0::2] | (enc[:, 1::2] << 16)
    else:
        p2o_pack = jnp.where(
            unassigned & states.dropped, _INT_MAX - 1, states.p2o
        )
    return jnp.concatenate([p2o_pack, states.nits[:, None]], axis=1)


@functools.partial(
    jax.jit, static_argnames=("rounds", "u16", "interpret")
)
def _sparse_kernel_pack(values_nm, states, eps, thresholds,
                        rounds: int, u16: bool, interpret: bool):
    """Fused-kernel variant of :func:`_sparse_chunk_pack`: the Mosaic
    multi-round Khosla kernel (per-instance early exit — a 3-round
    instance costs 3 rounds, not the budget) + the packed result plane,
    one program, one readback."""
    from .ops.pallas_ksparse import ksp_chunk_pallas

    states = ksp_chunk_pallas(
        values_nm, states, eps, thresholds, rounds, interpret=interpret
    )
    return states, _sparse_encode(states, u16)


def _sparse_unpack(packed: np.ndarray, n: int, u16: bool):
    """Host inverse of the :func:`_sparse_chunk_pack` wire format.
    Returns (p2o_local [B, N] int32 with UNASSIGNED sentinels,
    active [B, N] bool, dropped [B, N] bool, nits [B])."""
    nits = packed[:, -1].astype(np.int32)
    if u16:
        u16v = np.ascontiguousarray(
            packed[:, :-1].astype(np.uint32)
        ).view(np.uint16)[:, :n].astype(np.int32)
        active = u16v == 0xFFFF
        dropped = u16v == 0xFFFE
        p2o = np.where(active | dropped, np.int32(UNASSIGNED), u16v)
    else:
        raw = packed[:, :-1].astype(np.int32)
        active = raw == UNASSIGNED
        dropped = raw == UNASSIGNED - 1
        p2o = np.where(dropped, np.int32(UNASSIGNED), raw)
    return p2o, active, dropped, nits


class _SparseStaged(NamedTuple):
    """Device-staged densified batch-sparse problem (criterion-style
    setup artifact: stage once, solve many — `benchmark.rs:111-125`).

    Two flavors: host-staged (columns/values64 on host, objective
    evaluated host-side in f64) and device-resident (``device_mode`` —
    built by :func:`stage_batch_sparse_device` entirely on device, no
    tunnel ingress beyond the compact [B, N, K] arc arrays; the
    objective rides the packed readback as a double-double pair, the
    column map is the identity so the kernel's local ids ARE original
    object ids)."""

    values_t: jnp.ndarray  # [B, M', N] (XLA) or [B, N, M'] (kernel)
    used_cols: Optional[np.ndarray]  # [B, M'] local -> original id
    thresholds: object  # [B] (np or device array)
    columns: Optional[np.ndarray]  # [B, N, K] host arcs
    arc_mask: Optional[np.ndarray]
    values64: Optional[np.ndarray]
    m: int
    eps_val: float
    person_major: bool  # True = fused-kernel route
    device_mode: bool = False
    columns_device: Optional[jnp.ndarray] = None  # [B, N, K] i32
    values_device: Optional[jnp.ndarray] = None  # [B, N, K] dtype


@functools.partial(jax.jit, static_argnames=("m", "negate"))
def _sparse_stage_scatter(columns_device, values_device, m: int,
                          negate: bool):
    """Device-side densification WITHOUT column compaction (mp = m —
    the target instance classes have m = 4-8n already lane-aligned, so
    compaction would save ~35% plane bytes at the cost of host unique/
    remap over the tunnel; the host-staged path keeps it, this path
    trades it for zero ingress).  K where-passes build the person-major
    ``[B, N, M]`` plane (-inf at non-arcs); per-instance thresholds
    (`ksparse.rs:181`) come from the same pass."""
    b, n, k = columns_device.shape
    dtype = values_device.dtype
    work = -values_device if negate else values_device
    mask = columns_device >= 0
    neg_inf = dtype.type(-np.inf)
    vt = jnp.full((b, n, m), neg_inf, dtype)
    lane = lax.broadcasted_iota(jnp.int32, (b, n, m), 2)
    for j in range(k):
        cj = columns_device[:, :, j:j + 1]
        wj = work[:, :, j:j + 1]
        vt = jnp.where((lane == cj) & mask[:, :, j:j + 1], wj, vt)
    w_lo = jnp.min(jnp.where(mask, work, jnp.inf), axis=(1, 2))
    w_hi = jnp.max(jnp.where(mask, work, -jnp.inf), axis=(1, 2))
    return vt, w_lo, w_hi


def _sparse_remap_host(columns, num_cols: int):
    """Host column compaction for the device staging path: per-instance
    remap of original column ids into a shared-width local space
    (sorted by original id, preserving the smallest-column tie rule).
    Returns ``(cols_local [B, N, K] int32 with −1 pads kept,
    used_cols [B, M'] int64, mp)`` with M' lane-tile-aligned."""
    columns = np.asarray(columns)
    b, n, k = columns.shape
    arc_mask = columns >= 0
    flat_cols = np.where(arc_mask, columns, 0).astype(np.int64)
    keys = (
        np.arange(b, dtype=np.int64)[:, None, None] * num_cols + flat_cols
    )
    keys_flat = keys[arc_mask]
    uniq = np.unique(keys_flat)
    owner = uniq // num_cols
    counts = np.bincount(owner, minlength=b)
    m_used = int(counts.max()) if counts.size else 1
    mp = max(128, 1 << (m_used - 1).bit_length())  # pow2 lane width
    starts = np.concatenate([[0], np.cumsum(counts)])
    local_of_uniq = np.arange(uniq.size, dtype=np.int64) - starts[owner]
    used_cols = np.zeros((b, mp), dtype=np.int64)
    used_cols[owner, local_of_uniq] = uniq % num_cols
    cols_local = np.full((b, n, k), -1, np.int32)
    cols_local[arc_mask] = local_of_uniq[
        np.searchsorted(uniq, keys_flat)
    ].astype(np.int32)
    return cols_local, used_cols, mp


def stage_batch_sparse_device(
    columns_device,
    values_device,
    num_cols: int,
    maximize: bool = False,
    eps: Optional[float] = None,
    compact: Optional[bool] = None,
) -> _SparseStaged:
    """Device-resident staging for :func:`solve_batch_sparse_stream` /
    staged solves: ``columns_device [B, N, K]`` int32 (−1 pads) and
    ``values_device [B, N, K]`` float32 (host or device arrays).  No
    host densify, no GB-scale ingress — the dense plane is scattered
    on device and the objective is evaluated on device (double-double
    pair on the packed readback).  Requires the fused-kernel-eligible
    shape (N % 8 == 0, num_cols % 128 == 0).

    ``compact``: per-instance column compaction before the device
    scatter (host-side remap; needs host column arrays).  MEASURED
    NEGATIVE — default OFF: shrinking 2048 → M'=1408 at (256, k=8)
    ran the kernel **12× slower** (1,191 vs 14,406 inst/s per call,
    round-5 A/B) because 1408 lanes = 11 tiles: the fused lane-halving
    top-2 needs widths that halve in 128-tile multiples (powers of two
    × 128), and M' between powers of two degrades every tree to
    full-width masked scans; padding M' to the next efficient width
    lands back on ``num_cols`` itself.  Kept as an explicit knob for
    the record/tests only.  Threshold semantics always use the
    ORIGINAL ``num_cols`` (`ksparse.rs:181`)."""
    b, n, k = columns_device.shape
    m = int(num_cols)
    if n % 8 or m % 128:
        raise ValueError(
            f"device staging needs N%8==0 and num_cols%128==0, got "
            f"{n}x{m} (use the host path otherwise)"
        )
    if n > m:
        raise ValueError("num_rows must be <= num_cols")
    eps_val = float(eps) if eps is not None else 1.0 / m
    is_host = isinstance(columns_device, np.ndarray)
    used_cols = None
    mp = m
    if compact:  # measured-negative knob; see the docstring
        if not is_host:
            raise ValueError(
                "compact=True needs host column arrays (the remap is "
                "host-side; reading device columns back would cost a "
                "tunnel round-trip)"
            )
        cols_local, used_cols, mp = _sparse_remap_host(columns_device, m)
        columns_device = cols_local
    vt, w_lo, w_hi = _sparse_stage_scatter(
        jnp.asarray(columns_device, jnp.int32),
        jnp.asarray(values_device, jnp.float32),
        mp, not maximize,
    )
    # drop rule factor from the ORIGINAL object count (ksparse.rs:181)
    thresholds = (m / 2.0) * (w_hi - w_lo + jnp.float32(eps_val))
    return _SparseStaged(
        values_t=vt,
        used_cols=used_cols,
        thresholds=thresholds,
        columns=None,
        arc_mask=None,
        values64=None,
        m=m,
        eps_val=eps_val,
        person_major=True,
        device_mode=True,
        columns_device=columns_device,
        values_device=values_device,
    )


@functools.partial(
    jax.jit, static_argnames=("rounds", "u16", "interpret")
)
def _sparse_kernel_pack_obj(values_nm, columns_device, values_device,
                            states, eps, thresholds, rounds: int,
                            u16: bool, interpret: bool):
    """Device-resident variant of :func:`_sparse_kernel_pack`: appends
    the device-evaluated objective in ORIGINAL cost units (p2o is in
    original column space — identity map) as a double-double (hi, lo)
    f32 pair, same wire trick as ``_fr_pack_results_with_objective``."""
    from .ops.pallas_ksparse import ksp_chunk_pallas

    states = ksp_chunk_pallas(
        values_nm, states, eps, thresholds, rounds, interpret=interpret
    )
    packed = _sparse_encode(states, u16)
    b = columns_device.shape[0]
    p2o_b = states.p2o[:b]
    match = (columns_device == p2o_b[:, :, None]) & (columns_device >= 0)
    obj = jnp.sum(
        jnp.where(match, values_device, jnp.zeros((), values_device.dtype)),
        axis=(1, 2), dtype=jnp.float64,
    )
    hi = obj.astype(jnp.float32)
    lo = (obj - hi.astype(jnp.float64)).astype(jnp.float32)
    bits = jnp.stack(
        [
            lax.bitcast_convert_type(hi, jnp.int32),
            lax.bitcast_convert_type(lo, jnp.int32),
        ],
        axis=1,
    )
    pad_b = packed.shape[0]
    if pad_b > b:
        bits = jnp.concatenate(
            [bits, jnp.zeros((pad_b - b, 2), jnp.int32)]
        )
    return states, jnp.concatenate([packed, bits], axis=1)


def _sparse_kernel_eligible(n: int, dtype) -> bool:
    """The Mosaic route needs N%8==0, f32, and an accelerator backend
    (or the interpret test hook); M' alignment is the densifier's job."""
    on_cpu = jax.default_backend() == "cpu"
    return (
        n % 8 == 0
        and np.dtype(dtype) == np.float32
        and (not on_cpu or _SPARSE_KERNEL_INTERPRET_ON_CPU)
    )


def _sparse_stage_dense(
    columns, values64, arc_mask, work, m, eps_val, thresholds, dtype,
) -> _SparseStaged:
    person_major = _sparse_kernel_eligible(columns.shape[1], dtype)
    vt, used_cols, _used_count = _sparse_densify(
        columns, arc_mask, work, m, dtype, person_major=person_major
    )
    return _SparseStaged(
        values_t=jnp.asarray(vt),
        used_cols=used_cols,
        thresholds=thresholds.astype(np.dtype(dtype)),
        columns=columns,
        arc_mask=arc_mask,
        values64=values64,
        m=m,
        eps_val=eps_val,
        person_major=person_major,
    )


def _sparse_dispatch(st: _SparseStaged, chunk: int):
    """Dispatch the first (usually only) fused chunk of a staged solve
    WITHOUT blocking — returns a context for :func:`_sparse_finish`.
    Split so the stream mode can overlap batch i's readback with batch
    i+1's device compute (the solve_batch_stream pattern)."""
    if st.person_major:
        b, n, mp = st.values_t.shape
    else:
        b, mp, n = st.values_t.shape
    np_dtype = np.dtype(st.values_t.dtype)
    u16 = n % 2 == 0 and mp < 0xFFFE
    eps_s = np_dtype.type(st.eps_val)
    thr_j = jnp.asarray(st.thresholds)
    interpret = (
        _SPARSE_KERNEL_INTERPRET_ON_CPU and jax.default_backend() == "cpu"
    )
    values_dev = st.values_t
    if st.person_major:
        # batch-size bucketing, same rationale as _FR_B_BUCKET_FLOOR:
        # each DISTINCT B compiles its own Mosaic program; padding
        # slots are born all-dropped (inactive -> done at entry, they
        # exit their grid step immediately)
        pad_b = b
        if _FR_B_BUCKET_FLOOR:
            pad_b = max(
                _FR_B_BUCKET_FLOOR, 1 << max(0, int(b - 1).bit_length())
            )
        if pad_b > b:
            values_dev = jnp.concatenate(
                [values_dev, jnp.zeros((pad_b - b, n, mp), values_dev.dtype)]
            )
            thr_j = jnp.concatenate(
                [thr_j, jnp.zeros((pad_b - b,), thr_j.dtype)]
            )
        states = _sparse_batch_init_nm(values_dev)
        if pad_b > b:
            states = states._replace(
                dropped=states.dropped | jnp.asarray(
                    np.arange(pad_b)[:, None] >= b
                )
            )
        cur = _SPARSE_KERNEL_BUDGET
        if st.device_mode:
            states, packed = _sparse_kernel_pack_obj(
                values_dev, st.columns_device, st.values_device,
                states, eps_s, thr_j, cur, u16, interpret,
            )
        else:
            states, packed = _sparse_kernel_pack(
                values_dev, states, eps_s, thr_j, cur, u16, interpret
            )
    else:
        states = _sparse_batch_init(values_dev)
        cur = chunk
        states, packed = _sparse_chunk_pack(
            values_dev, states, eps_s, thr_j, cur, u16
        )
    return dict(
        values_dev=values_dev, states=states, packed=packed, rounds=cur,
        u16=u16, eps_s=eps_s, thr_j=thr_j, interpret=interpret,
        b=b, n=n, chunk=cur,
    )


def _sparse_finish(
    st: _SparseStaged, ctx: dict, max_rounds: int
) -> BatchSolution:
    """Block on the packed readback, run (rare) continuation chunks,
    and map local column ids back to the original object space."""
    b, n, u16 = ctx["b"], ctx["n"], ctx["u16"]
    states, packed, rounds, cur = (
        ctx["states"], ctx["packed"], ctx["rounds"], ctx["chunk"]
    )
    while True:
        packed_h = np.asarray(packed)[:b]
        if st.device_mode:
            obj_words = packed_h[:, -2:]
            packed_h = packed_h[:, :-2]
        p2o_loc, active, _dropped, nits = _sparse_unpack(
            packed_h, n, u16
        )
        if not active.any() or rounds >= max_rounds:
            break
        cur = (
            _SPARSE_KERNEL_BUDGET if st.person_major
            else min(1024, cur * 2)
        )
        if st.person_major:
            if st.device_mode:
                states, packed = _sparse_kernel_pack_obj(
                    ctx["values_dev"], st.columns_device,
                    st.values_device, states, ctx["eps_s"],
                    ctx["thr_j"], cur, u16, ctx["interpret"],
                )
            else:
                states, packed = _sparse_kernel_pack(
                    ctx["values_dev"], states, ctx["eps_s"],
                    ctx["thr_j"], cur, u16, ctx["interpret"],
                )
        else:
            states, packed = _sparse_chunk_pack(
                ctx["values_dev"], states, ctx["eps_s"], ctx["thr_j"],
                cur, u16,
            )
        rounds += cur

    assigned = p2o_loc != UNASSIGNED
    if st.device_mode:
        # objective rode the readback; column map is the identity
        # unless the staging compacted (used_cols present)
        if st.used_cols is not None:
            p2o = np.where(
                assigned,
                np.take_along_axis(
                    st.used_cols,
                    np.where(assigned, p2o_loc, 0).astype(np.int64),
                    axis=1,
                ),
                np.int64(UNASSIGNED),
            ).astype(np.int32)
        else:
            p2o = p2o_loc
        words = np.ascontiguousarray(obj_words).view(np.float32)
        objective = words[:, 0].astype(np.float64) + words[:, 1]
    else:
        p2o = np.where(
            assigned,
            np.take_along_axis(
                st.used_cols,
                np.where(assigned, p2o_loc, 0).astype(np.int64),
                axis=1,
            ),
            np.int64(UNASSIGNED),
        ).astype(np.int32)
        match = st.arc_mask & (st.columns == p2o[:, :, None])
        objective = np.where(match, st.values64, 0.0).sum(axis=(1, 2))
    o2p = o2p_from_p2o(p2o, st.m)
    return BatchSolution(
        person_to_object=p2o,
        object_to_person=o2p,
        num_unassigned=(~assigned).sum(axis=1).astype(np.int32),
        objective=objective,
        eps=np.full(b, st.eps_val),
        nits=nits,
    )


def _sparse_solve_staged(
    st: _SparseStaged, max_rounds: int, chunk: int
) -> BatchSolution:
    """Run the fused chunk+pack rounds on a staged problem — one
    dispatch, one packed readback in the common case (m >> n instances
    converge well inside the kernel budget / first chunk).  Kernel
    route (person-major staging): the Mosaic multi-round program with
    per-instance early exit and a deep budget."""
    return _sparse_finish(st, _sparse_dispatch(st, chunk), max_rounds)


def _solve_batch_sparse_dense(
    columns, values64, arc_mask, work, m, eps_val, thresholds,
    dtype, max_rounds, chunk,
) -> BatchSolution:
    """Gather-free batched sparse solve: densify (column-compacted) and
    run the vmapped dense Khosla rounds (stage + solve in one call)."""
    st = _sparse_stage_dense(
        columns, values64, arc_mask, work, m, eps_val, thresholds, dtype
    )
    return _sparse_solve_staged(st, max_rounds, chunk)


def stage_batch_sparse(
    columns,
    values,
    num_cols: int,
    maximize: bool = False,
    eps: Optional[float] = None,
    dtype=np.float32,
) -> _SparseStaged:
    """Stage a batch of k-sparse instances on device for repeated /
    streamed solving (the criterion setup/measure split,
    `benchmark.rs:111-125`): densify + ship once, then
    :func:`solve_batch_sparse_stream` (or repeated staged solves) pay
    no per-solve staging.  Arguments as :func:`solve_batch_sparse`."""
    columns = np.asarray(columns)
    values64 = np.asarray(values, dtype=np.float64)
    if columns.ndim != 3 or columns.shape != values64.shape:
        raise ValueError("columns/values must both be [B, N, K]")
    b, n, k = columns.shape
    m = int(num_cols)
    if n > m:
        raise ValueError("num_rows must be <= num_cols")
    arc_mask = columns >= 0
    if not arc_mask.any(axis=2).all():
        raise ValueError("every person needs at least one arc")
    work = values64 if maximize else -values64
    eps_val = float(eps) if eps is not None else 1.0 / m
    w_lo = np.where(arc_mask, work, np.inf).reshape(b, -1).min(axis=1)
    w_hi = np.where(arc_mask, work, -np.inf).reshape(b, -1).max(axis=1)
    thresholds = (m / 2.0) * (w_hi - w_lo + eps_val)  # ksparse.rs:181
    return _sparse_stage_dense(
        columns, values64, arc_mask, work, m, eps_val, thresholds, dtype
    )


def solve_batch_sparse_stream(
    staged,
    max_rounds: int = 10_000_000,
    chunk: int = 16,
    window: int = 2,
):
    """Pipelined batched-sparse solves over pre-staged problems (see
    :func:`stage_batch_sparse`) — the sustained-throughput mode: up to
    ``window`` batches in flight, so batch i's packed readback and host
    postprocessing overlap batch i+1's device rounds (the
    ``solve_batch_stream`` pattern applied to the reference's own
    k-regular domain).  Returns ``list[BatchSolution]`` in order."""
    from collections import deque

    staged = list(staged)
    results = []
    pending: deque = deque()
    for st in staged:
        pending.append((st, _sparse_dispatch(st, chunk)))
        while len(pending) >= max(1, window):
            s, ctx = pending.popleft()
            results.append(_sparse_finish(s, ctx, max_rounds))
    while pending:
        s, ctx = pending.popleft()
        results.append(_sparse_finish(s, ctx, max_rounds))
    return results


def solve_batch_sparse(
    columns,
    values,
    num_cols: int,
    maximize: bool = False,
    eps: Optional[float] = None,
    dtype=np.float32,
    max_rounds: int = 10_000_000,
    chunk: int = 64,
    engine: str = "auto",
) -> BatchSolution:
    """Solve a batch of k-sparse LAP instances with the Khosla auction
    (finite termination on infeasible instances via the drop rule,
    `ksparse.rs:181,218-220`) — the reference's own problem domain
    (`ksparse.rs:9-19`), batched, which the sequential crate cannot
    express.

    ``columns[B, N, K]`` (int; −1 marks unused arc slots) and
    ``values[B, N, K]`` give each person's arcs; all instances share
    ``num_cols`` objects.  ``eps`` defaults to ``1 / num_cols``
    (`ksparse.rs:164-168`).  Infeasible persons end up UNASSIGNED.

    ``engine``: ``"dense"`` compacts each instance's referenced columns
    and runs the gather-free dense rounds (:func:`_sparse_densify` —
    the TPU fast path); ``"padded"`` keeps the padded dual-layout
    gather rounds (cheap on CPU, serialized-gather-bound on TPU);
    ``"auto"`` picks dense on accelerators when the densified plane
    fits (`_SPARSE_DENSE_MAX_BYTES`), padded otherwise.
    """
    from .ops.padded import build_padded_problem

    columns = np.asarray(columns)
    values64 = np.asarray(values, dtype=np.float64)
    if columns.ndim != 3 or columns.shape != values64.shape:
        raise ValueError("columns/values must both be [B, N, K]")
    b, n, k = columns.shape
    m = int(num_cols)
    if n > m:
        raise ValueError("num_rows must be <= num_cols")
    arc_mask = columns >= 0
    if not arc_mask.any(axis=2).all():
        raise ValueError("every person needs at least one arc")

    work = values64 if maximize else -values64
    eps_val = float(eps) if eps is not None else 1.0 / m
    w_lo = np.where(arc_mask, work, np.inf).reshape(b, -1).min(axis=1)
    w_hi = np.where(arc_mask, work, -np.inf).reshape(b, -1).max(axis=1)
    thresholds = (m / 2.0) * (w_hi - w_lo + eps_val)  # ksparse.rs:181

    if engine not in ("auto", "dense", "padded"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "auto":
        # worst-case densified size without building it: per-instance
        # distinct columns <= min(m, n*k)
        est = b * min(m, n * k) * n * np.dtype(dtype).itemsize
        engine = (
            "dense"
            if jax.default_backend() != "cpu"
            and est <= _SPARSE_DENSE_MAX_BYTES
            else "padded"
        )
    if engine == "dense":
        return _solve_batch_sparse_dense(
            columns, values64, arc_mask, work, m, eps_val, thresholds,
            dtype, max_rounds, chunk,
        )

    # per-instance dual padded layouts, stacked with batch-max padding
    probs = []
    for bi in range(b):
        mask_i = arc_mask[bi]
        counts = mask_i.sum(axis=1).astype(np.int64)
        cols_i = columns[bi][mask_i].astype(np.int64)
        vals_i = work[bi][mask_i]
        probs.append(build_padded_problem(
            n, m, counts, cols_i, vals_i, dtype=dtype, to_device=False,
        ))
    kmax = max(p.row_cols.shape[0] for p in probs)
    kcmax = max(p.col_persons.shape[0] for p in probs)

    def stack(name, kdim, fill=0):
        out = np.full(
            (b, kdim) + getattr(probs[0], name).shape[1:],
            fill, dtype=getattr(probs[0], name).dtype,
        )
        for bi, p in enumerate(probs):
            a = getattr(p, name)
            out[bi, : a.shape[0]] = a
        return jnp.asarray(out)

    row_cols = stack("row_cols", kmax)
    row_vals = stack("row_vals", kmax)
    row_mask = stack("row_mask", kmax, fill=False)
    col_persons = stack("col_persons", kcmax)
    col_mask = stack("col_mask", kcmax, fill=False)

    np_dtype = np.dtype(dtype)
    states = KhoslaState(
        prices=jnp.zeros((b, m), dtype),
        p2o=jnp.full((b, n), _INT_MAX, jnp.int32),
        o2p=jnp.full((b, m), _INT_MAX, jnp.int32),
        dropped=jnp.zeros((b, n), bool),
        nits=jnp.zeros((b,), jnp.int32),
    )
    eps_s = np_dtype.type(eps_val)
    thr_j = jnp.asarray(thresholds.astype(np_dtype))
    rounds = 0
    cur_chunk = min(chunk, 8)
    while True:
        states, alldone = _batch_chunk_sparse(
            row_cols, row_vals, row_mask, col_persons, col_mask,
            states, eps_s, thr_j, max_rounds, cur_chunk,
        )
        rounds += cur_chunk
        if bool(alldone) or rounds >= max_rounds:
            break
        cur_chunk = min(chunk, cur_chunk * 2)

    p2o_np = np.asarray(states.p2o)
    assigned = p2o_np != UNASSIGNED
    o2p = o2p_from_p2o(p2o_np, m)
    # objective from the original values: match each person's chosen
    # column against its arc slots (unassigned persons contribute 0)
    match = arc_mask & (columns == p2o_np[:, :, None])
    objective = np.where(match, values64, 0.0).sum(axis=(1, 2))
    return BatchSolution(
        person_to_object=p2o_np,
        object_to_person=o2p,
        num_unassigned=(~assigned).sum(axis=1).astype(np.int32),
        objective=objective,
        eps=np.full(b, eps_val),
        nits=np.asarray(states.nits),
    )
