"""Tracing / observability (SURVEY.md §5.1).

The reference uses the `tracing` crate with trace!/info! call sites that
are compiled out of release builds (`Cargo.toml:18-19`).  The TPU-native
equivalents:

- :func:`set_debug` / :func:`trace_round` — optional `jax.debug.print`
  hooks, zero-cost when disabled (the flag is checked at trace time, so
  disabled tracing adds no ops to the compiled program);
- public counters on the solvers (``nits``, ``nreductions``,
  ``optimal_soln_found`` — mirroring `ksparse.rs:84`,
  `symmetric.rs:88-90`) and the achieved ``eps`` on the solution
  (`solution.rs:39`);
- :func:`profile_solve` — context manager around `jax.profiler.trace`
  for kernel-level timing of a solve.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator

import jax

_DEBUG = bool(os.environ.get("SLAP_TPU_DEBUG"))


def set_debug(enabled: bool) -> None:
    """Enable per-round debug printing inside jitted solve loops.

    Must be set before the solve is traced (compiled programs are
    cached); also controllable via the ``SLAP_TPU_DEBUG`` env var.
    """
    global _DEBUG
    _DEBUG = bool(enabled)


def trace_round(fmt: str, *args) -> None:
    """`jax.debug.print` gated on the debug flag — the analogue of the
    reference's `trace!` call sites (e.g. `ksparse.rs:189-190`,
    `symmetric.rs:406-407`).  No-op (no ops traced) when disabled."""
    if _DEBUG:
        jax.debug.print(fmt, *args)


def trace_kernel_round(fmt: str, *args) -> None:
    """``pl.debug_print`` gated on the debug flag — the in-kernel
    analogue of :func:`trace_round` for Mosaic kernel interiors, where
    ``jax.debug.print`` does not lower (the production fused paths
    ``ops/pallas_fr.py`` / ``ops/pallas_fr_big.py``; reference hot-loop
    trace sites `ksparse.rs:189-190`).  Checked at trace time, so the
    production program — and its persistent-cache key — carries no
    debug ops when disabled."""
    if _DEBUG:
        from jax.experimental import pallas as pl

        pl.debug_print(fmt, *args)


def trace_host(fmt: str, *args) -> None:
    """Host-side gated trace for driver-level events the reference logs
    with `info!`/`trace!` outside the hot loop (ε-phase transitions,
    `symmetric.rs:247-249,297`; chunk/tail handoffs).  Eagerly formatted
    and printed to stderr only when debugging is enabled."""
    if _DEBUG:
        import sys

        print(fmt.format(*args), file=sys.stderr, flush=True)


def is_enabled() -> bool:
    """Whether round tracing is currently enabled."""
    return _DEBUG


@contextlib.contextmanager
def profile_solve(log_dir: str = "/tmp/slap_tpu_profile") -> Iterator[None]:
    """Profile a solve with the JAX profiler (view with TensorBoard or
    `xprof`): ``with profile_solve(): solver.solve(...)``."""
    with jax.profiler.trace(log_dir):
        yield
