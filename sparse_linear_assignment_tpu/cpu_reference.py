"""ctypes bindings to the native C++ sequential auction engine.

The shared library is compiled on demand with g++ (cached next to the
source); see ``native/engine.cpp`` for the engine itself.  The wrapper
replicates the reference solver lifecycle (sign flip, eps defaults,
sentinel conversion) so results are directly comparable with both the
Rust crate's semantics and the TPU solvers.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from .solution import INDEX_DTYPE, UNASSIGNED, AuctionSolution

_NATIVE_DIR = Path(__file__).parent / "native"
_SRC = _NATIVE_DIR / "engine.cpp"
_SO = _NATIVE_DIR / "libslapengine.so"
_STAMP = _NATIVE_DIR / "libslapengine.hash"

_lib = None
_lib_lock = threading.Lock()


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _build(src_hash: str) -> None:
    # compile to a private temp path, then atomically rename into place:
    # a concurrent loader (another thread past the lock is impossible,
    # but another *process* — e.g. a benchmark's prewarm thread racing a
    # CPU-reference run in a subprocess — is not) must never dlopen a
    # half-written .so
    tmp = _SO.with_name(f".libslapengine.{os.getpid()}.tmp.so")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp-simd", "-shared",
        "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if tmp.exists():  # failed build: don't leave droppings
            tmp.unlink()
    _STAMP.write_text(src_hash)


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native engine.

    The build is keyed on a content hash of engine.cpp (mtimes do not
    survive git clones), and the binary is never committed — it is built
    with ``-march=native`` for the current host, so a foreign-arch copy
    could SIGILL at call time.  A load failure triggers one rebuild.
    Thread-safe: concurrent first calls (e.g. a prewarm thread racing
    the main thread's first native solve) serialize on a lock instead
    of spawning duplicate g++ builds over the same output path.
    """
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        lib = _load_and_bind()
        _lib = lib
    return _lib


def _load_and_bind() -> ctypes.CDLL:
    src_hash = _src_hash()
    stamp = _STAMP.read_text().strip() if _STAMP.exists() else ""
    if not _SO.exists() or stamp != src_hash:
        _build(src_hash)
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _build(src_hash)
        lib = ctypes.CDLL(str(_SO))

    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.slap_khosla_solve.restype = ctypes.c_int
    lib.slap_khosla_solve.argtypes = [
        i64, i64, p_i64, p_i32, p_f64, ctypes.c_double,
        p_i32, p_i32, p_f64, ctypes.POINTER(i64),
    ]
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.slap_khosla_finish.restype = ctypes.c_int
    lib.slap_khosla_finish.argtypes = [
        i64, i64, p_i64, p_i32, p_f64, ctypes.c_double, ctypes.c_double,
        p_i32, p_i32, p_f64, p_u8, ctypes.POINTER(i64),
    ]
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.slap_fr_dense_finish.restype = ctypes.c_int
    lib.slap_fr_dense_finish.argtypes = [
        i64, i64, p_f64, ctypes.c_double, p_f32, ctypes.c_double,
        p_f64, p_f64, p_i32, p_i32, i64, ctypes.POINTER(i64),
    ]
    lib.slap_negate_transpose_f32.restype = None
    lib.slap_negate_transpose_f32.argtypes = [
        p_f64, i64, i64, ctypes.c_double, p_f32,
    ]
    lib.slap_forward_solve.restype = ctypes.c_int
    lib.slap_forward_solve.argtypes = [
        i64, i64, p_i64, p_i32, p_f64,
        ctypes.c_double, ctypes.c_double, i64,
        p_i32, p_i32, p_f64,
        ctypes.POINTER(i64), ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def _prep(solver, maximize: bool):
    """Apply the reference init_solve sign handling and return CSR views."""
    solver.validate_input()
    solution = AuctionSolution.new()
    solver.init_solve(solution, maximize)
    counts = solver.j_counts.astype(np.int64)
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    cols = np.ascontiguousarray(solver.column_indices, dtype=np.int32)
    vals = np.ascontiguousarray(solver.values, dtype=np.float64)
    return solution, starts, cols, vals


def _finish(solver, solution, p2o, o2p, prices):
    p2o = np.where(p2o < 0, UNASSIGNED, p2o).astype(INDEX_DTYPE)
    o2p = np.where(o2p < 0, UNASSIGNED, o2p).astype(INDEX_DTYPE)
    solution.person_to_object = p2o
    solution.object_to_person = o2p
    solution.num_unassigned = int((p2o == UNASSIGNED).sum())
    solver.prices = prices
    return solution


def khosla_solve_cpu(
    solver, maximize: bool = False, eps: Optional[float] = None
):
    """Sequential Khosla solve of ``solver``'s current instance on CPU.
    Returns ``(solution, nits)``; pops counted like the reference."""
    lib = get_lib()
    solution, starts, cols, vals = _prep(solver, maximize)
    n, m = solver.num_rows, solver.num_cols
    eps_val = float(eps) if eps is not None else 1.0 / float(m)
    solution.eps = eps_val

    p2o = np.empty(n, dtype=np.int32)
    o2p = np.empty(m, dtype=np.int32)
    prices = np.empty(m, dtype=np.float64)
    nits = ctypes.c_int64(0)
    rc = lib.slap_khosla_solve(
        n, m, starts, cols, vals, eps_val, p2o, o2p, prices,
        ctypes.byref(nits),
    )
    assert rc == 0
    return _finish(solver, solution, p2o, o2p, prices), int(nits.value)


def khosla_finish_cpu(
    n_rows: int,
    n_cols: int,
    starts: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    eps: float,
    threshold: float,
    p2o: np.ndarray,
    o2p: np.ndarray,
    prices: np.ndarray,
    dropped: np.ndarray,
) -> int:
    """Finish an auction phase sequentially from a warm state (in place).

    ``p2o``/``o2p`` use -1 for unassigned; arrays are modified in place.
    Used as the chain-tail engine of the hybrid TPU+CPU solve: TPU runs
    the massively parallel bulk rounds, this finishes the sequential
    displacement chains at native speed.  Returns the number of pops.
    """
    lib = get_lib()
    nits = ctypes.c_int64(0)
    rc = lib.slap_khosla_finish(
        n_rows, n_cols,
        np.ascontiguousarray(starts, dtype=np.int64),
        np.ascontiguousarray(cols, dtype=np.int32),
        np.ascontiguousarray(vals, dtype=np.float64),
        float(eps), float(threshold),
        p2o, o2p, prices, dropped, ctypes.byref(nits),
    )
    assert rc == 0
    return int(nits.value)


def fr_dense_finish_cpu(
    a: np.ndarray,
    at: Optional[np.ndarray],
    eps: float,
    prices: np.ndarray,
    profits: np.ndarray,
    p2o: np.ndarray,
    o2p: np.ndarray,
    max_pops: int = 200_000_000,
    sign: float = 1.0,
) -> tuple[int, int]:
    """Finish one dense instance's forward-reverse auction sequentially
    from a warm state (in place) — the chain-tail engine of the
    streaming-kernel big singles (``batch.solve_batch`` ``use_big``
    path).  Same rules as the device engine (``ops/fr_dense.py``); see
    ``native/engine.cpp:slap_fr_dense_finish``.

    ``a [N, M]`` f64 raw values with ``sign`` (±1) applied inside the
    scans (max-profit convention; sign=-1 for minimize — avoids
    materializing a negated copy of a multi-hundred-MB matrix), ``at
    [M, N]`` the already-sign-applied f32 transpose for column scans
    (pass None to have it built by the native blocked transpose),
    ``prices``/``profits`` f64 and ``p2o``/``o2p`` int32 (-1 =
    unassigned) modified in place.  Returns ``(rc, pops)``: rc 0 =
    complete matching, 1 = ``max_pops`` hit (caller falls back to a
    from-scratch solve).
    """
    lib = get_lib()
    n, m = a.shape
    a = np.ascontiguousarray(a, dtype=np.float64)
    if at is None:
        at = np.empty((m, n), np.float32)
        lib.slap_negate_transpose_f32(a, n, m, float(sign), at)
    else:
        at = np.ascontiguousarray(at, dtype=np.float32)
    assert at.shape == (m, n)
    pops = ctypes.c_int64(0)
    rc = lib.slap_fr_dense_finish(
        n, m, a, float(sign), at,
        float(eps), prices, profits, p2o, o2p,
        int(max_pops), ctypes.byref(pops),
    )
    return int(rc), int(pops.value)


def forward_solve_cpu(
    solver,
    maximize: bool = False,
    eps: Optional[float] = None,
    start_eps: Optional[float] = None,
    max_iterations: int = 100_000,
):
    """Sequential eps-scaling forward solve on CPU.  Returns
    ``(solution, nits, nreductions, optimal_found)``."""
    lib = get_lib()
    solution, starts, cols, vals = _prep(solver, maximize)
    n, m = solver.num_rows, solver.num_cols
    target_eps = float(eps) if eps is not None else 1.0 / float(n)

    p2o = np.empty(n, dtype=np.int32)
    o2p = np.empty(m, dtype=np.int32)
    prices = np.empty(m, dtype=np.float64)
    nits = ctypes.c_int64(0)
    nreductions = ctypes.c_int64(0)
    optimal = ctypes.c_int32(0)
    final_eps = ctypes.c_double(0.0)
    rc = lib.slap_forward_solve(
        n, m, starts, cols, vals,
        target_eps,
        -1.0 if start_eps is None else float(start_eps),
        int(max_iterations),
        p2o, o2p, prices,
        ctypes.byref(nits), ctypes.byref(nreductions),
        ctypes.byref(optimal), ctypes.byref(final_eps),
    )
    assert rc == 0
    solution.eps = float(final_eps.value)
    return (
        _finish(solver, solution, p2o, o2p, prices),
        int(nits.value),
        int(nreductions.value),
        bool(optimal.value),
    )
