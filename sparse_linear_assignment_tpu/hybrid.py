"""Heterogeneous TPU + native-CPU auction solve.

Auction solves have two regimes with opposite hardware affinities:

- **Bulk rounds**: thousands of unassigned persons bid simultaneously —
  embarrassingly parallel, ideal for the TPU's vector units (one Jacobi
  round assigns the vast majority of persons).
- **Chain tails**: the endgame is a displacement chain — person A takes
  B's object, B takes C's, ... — strictly sequential steps of a few
  hundred nanoseconds each.  No accelerator wins here; the native C++
  engine steps chains at tens of millions of pops per second while a
  dispatch round-trip to any accelerator costs more than a whole chain.

This driver runs each ε-scaling phase's bulk on the TPU (slot-list
rounds, `ops/compact.py`) and hands the warm state (prices + partial
assignment) to the native engine (`native/engine.cpp:slap_khosla_finish`)
to finish the phase's chains.  Both engines implement the exact same
choice/update/drop rules (`ksparse.rs:199-227,218-220`), so the final
matching carries the same ε-optimality certificate as the pure solvers.

Honest scaling note (measured, docs/PERFORMANCE.md): at n≈1e5 the
sequential pops of the ε-scaled auction are cheap enough that the native
engine alone (`tail_threshold` above n) is fastest (~0.37 s); the TPU
bulk phase pays off as instance size/contention grows and for batched
workloads.  `tail_threshold` tunes the handoff point.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cpu_reference import khosla_finish_cpu
from .ops.compact import LState, khosla_full_chunk
from .ops.padded import PaddedProblem
from .solution import UNASSIGNED
from .utils.trace import trace_host

_INT_MAX = np.int32(UNASSIGNED)


import functools


@functools.partial(jax.jit, static_argnames=("n",))
def _fresh_bulk_state(prices, n: int):
    """Fresh-phase state from warm prices only — the assignment reset
    arrays are built on device, so the per-phase upload is just the
    price vector."""
    m = prices.shape[0]
    return LState(
        prices=prices,
        p2o=jnp.full(n, jnp.int32(UNASSIGNED)),
        o2p=jnp.full(m, jnp.int32(UNASSIGNED)),
        dropped=jnp.zeros(n, bool),
        slots=jnp.arange(n, dtype=jnp.int32),
        nits=jnp.zeros((), jnp.int32),
    )


@jax.jit
def _pack_lstate(state: LState):
    """Pack the host-needed solve state into ONE int32 array
    (p2o | o2p | dropped | price bits) — per-array readbacks each pay
    the tunnel's latency, so the phase handoff crosses in one
    transfer."""
    n = state.p2o.shape[0]
    m = state.o2p.shape[0]
    w = max(n, m)

    def pad_row(x):
        return jnp.zeros((1, w), jnp.int32).at[0, : x.shape[0]].set(x)

    rows = [
        pad_row(state.p2o),
        pad_row(state.o2p),
        pad_row(state.dropped.astype(jnp.int32)),
    ]
    bits = lax.bitcast_convert_type(state.prices, jnp.int32)
    if bits.ndim == 1:  # float32
        rows.append(pad_row(bits))
    else:  # float64 -> two int32 words
        rows.append(pad_row(bits[:, 0]))
        rows.append(pad_row(bits[:, 1]))
    return jnp.concatenate(rows)


def _unpack_lstate(packed: np.ndarray, n: int, m: int, dtype):
    """Host-side inverse of :func:`_pack_lstate` (native-engine
    conventions: -1 sentinels, uint8 dropped, f64 prices)."""
    p2o = np.where(packed[0, :n] == _INT_MAX, -1, packed[0, :n]).astype(
        np.int32
    )
    o2p = np.where(packed[1, :m] == _INT_MAX, -1, packed[1, :m]).astype(
        np.int32
    )
    dropped = packed[2, :n].astype(np.uint8)
    if np.dtype(dtype) == np.float32:
        prices64 = (
            np.ascontiguousarray(packed[3, :m])
            .view(np.float32)
            .astype(np.float64)
        )
    else:
        bits = np.empty((m, 2), dtype=np.int32)
        bits[:, 0] = packed[3, :m]
        bits[:, 1] = packed[4, :m]
        prices64 = np.ascontiguousarray(bits).view(np.float64)[:, 0].copy()
    return p2o, o2p, dropped, np.ascontiguousarray(prices64)


def khosla_solve_hybrid(
    num_rows: int,
    num_cols: int,
    csr_starts: np.ndarray,
    csr_cols: np.ndarray,
    csr_vals: np.ndarray,
    problem: PaddedProblem,
    eps_target: float,
    w_min: float,
    w_max: float,
    scale: bool = True,
    reduction_factor: float = 0.03,
    tail_threshold: int = 65536,
    chunk: int = 4,
    start_prices=None,
    tpu_phases: Optional[int] = 1,
    threshold_pad: float = 0.0,
):
    """Solve with TPU bulk rounds + native chain tails.

    ``start_prices`` warm-starts the price vector (SURVEY.md §5.4).
    ``reduction_factor`` defaults to an aggressive 0.03 (5 ε-phases at
    the headline span instead of 7 at the reference-style 0.125):
    measured at n=1e5, the ~1 M extra native pops of the steeper ladder
    cost far less than two more phases of host↔device round-trips
    (docs/PERFORMANCE.md round-3 notes).  Every phase must COMPLETE
    (TPU bulk + native tail) before the next ε reduction — leaving
    intermediate phases unfinished to save host syncs was measured to
    explode the final phase's pops 2.6 M → 357 M, because unconverged
    prices forfeit the ladder's warm-start property.

    ``tpu_phases`` caps how many leading ε-phases run their bulk on the
    device (None = all).  Each device phase costs one price upload plus
    one packed readback — latency-priced through a tunnel — while a
    late (small-ε) phase's native bulk is cheap thanks to the warm
    prices, so the device earns its round-trips only on the early
    high-ε phases where the bulk is the whole instance.  Measured sweep
    at the n=1e5 headline (good tunnel weather, best-of-3): all phases
    1.14 s, tpu_phases=1 **0.62 s**, =2 0.73 s, =3 0.86 s, native-only
    0.46 s — hence the default of 1 (the fastest TPU-exercising
    configuration; docs/PERFORMANCE.md records the attribution).
    Returns ``(prices_f64, p2o, o2p, dropped, tpu_rounds, cpu_pops)``
    with the package's ``UNASSIGNED`` sentinel in the assignment arrays.

    ``tpu_phases = 0`` (with ``problem=None`` allowed) runs the pure
    native ε-scaling ladder — the fastest measured engine for sparse
    singles (BASELINE.md attribution table) and the auto-router's
    large-symmetric path.
    """
    n, m = num_rows, num_cols
    span = w_max - w_min
    dtype = problem.dtype if problem is not None else np.float32

    # ε ladder (symmetric instances only — see ops/compact.py rationale)
    if scale and n == m:
        eps = max(span / 4.0, eps_target)
    else:
        eps = eps_target
    ladder = []
    while eps > eps_target:
        ladder.append(eps)
        eps *= reduction_factor
    ladder.append(eps_target)

    # host-side state in the native engine's convention (-1 = unassigned)
    prices64 = (
        np.zeros(m, dtype=np.float64) if start_prices is None
        else np.array(start_prices, dtype=np.float64)
    )
    p2o = np.full(n, -1, dtype=np.int32)
    o2p = np.full(m, -1, dtype=np.int32)
    dropped = np.zeros(n, dtype=np.uint8)

    tpu_rounds = 0
    cpu_pops = 0
    np_dtype = np.dtype(dtype)

    for phase_i, phase_eps in enumerate(ladder):
        # Shift the cold-start drop bound by each phase's start price
        # level — carried prices from a larger-ε phase can legitimately
        # exceed the next phase's threshold on feasible instances and
        # would spuriously drop matchable persons (see the ladder note
        # in ops/compact.py:khosla_solve_scaled; prices are host-side
        # here so the pad is free).
        pad = threshold_pad if phase_i == 0 else max(
            0.0, float(prices64.max())
        )
        threshold = (m / 2.0) * (span + phase_eps) + pad
        if phase_i > 0:
            # new phase: keep prices, reset assignments (symmetric.rs:290-324)
            p2o.fill(-1)
            o2p.fill(-1)
            dropped.fill(0)

        unassigned = int((p2o < 0).sum())
        use_tpu = tpu_phases is None or phase_i < tpu_phases
        if use_tpu and unassigned > tail_threshold:
            # ---- TPU bulk rounds (full-scan: the bulk phase only runs
            # while the active set is a large fraction of N, exactly the
            # regime where gather-free full rounds win — ops/compact.py).
            # Every phase starts from a reset assignment, so only the
            # warm prices cross to the device; a FIXED handful of rounds
            # runs with no active-count polling (each poll is a
            # latency-priced host sync) — one full-scan round assigns
            # roughly half the remainder, so `chunk` rounds leave a
            # small tail that the native engine absorbs.
            state = _fresh_bulk_state(
                jnp.asarray(prices64.astype(np_dtype)), n
            )
            eps_s = np_dtype.type(phase_eps)
            thr_s = np_dtype.type(threshold)
            state, _ = khosla_full_chunk(
                problem, state, eps_s, thr_s, chunk
            )
            tpu_rounds += chunk
            packed = np.asarray(_pack_lstate(state))  # one readback
            p2o, o2p, dropped, prices64 = _unpack_lstate(
                packed, n, m, np_dtype
            )
            trace_host(
                "hybrid phase {}: eps={} bulk rounds={} unassigned={}",
                phase_i, phase_eps, chunk, int((p2o < 0).sum()),
            )

        # ---- native chain tail (exact sequential finish of the phase) ----
        phase_pops = khosla_finish_cpu(
            n, m, csr_starts, csr_cols, csr_vals,
            phase_eps, threshold, p2o, o2p, prices64, dropped,
        )
        cpu_pops += phase_pops
        trace_host(
            "hybrid phase {}: eps={} native pops={} unassigned={}",
            phase_i, phase_eps, phase_pops, int((p2o < 0).sum()),
        )

    p2o_out = np.where(p2o < 0, _INT_MAX, p2o).astype(np.int32)
    o2p_out = np.where(o2p < 0, _INT_MAX, o2p).astype(np.int32)
    return prices64, p2o_out, o2p_out, dropped, tpu_rounds, cpu_pops
