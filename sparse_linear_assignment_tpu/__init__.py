"""TPU-native sparse linear assignment (auction algorithms) in JAX/Pallas.

Brand-new framework with the capabilities of the Rust crate
``DXist/sparse_linear_assignment`` (reference mounted at
``/root/reference``; API façade mirrored from ``src/lib.rs:7-19``):

- :class:`KhoslaSolver` — auction for asymmetric k-regular sparse graphs
  (arXiv:2101.07155), finite termination on infeasible instances.
- :class:`ForwardAuctionSolver` — ε-scaling forward auction (à la sslap)
  with ``max_iterations`` cutoff.
- :class:`AuctionSolver` — shared base: CSR construction, lifecycle,
  objective and ε-CS evaluators.
- :class:`AuctionSolution` — matching result (both directions,
  ``num_unassigned``, achieved ``eps``).

TPU-native extensions beyond the reference:

- :func:`solve_batch` — vmapped batched mode solving thousands of
  independent fixed-shape LAPs per TPU core.
- ``parallel.sharded`` — shard_map multi-device solve over a
  ``jax.sharding.Mesh`` for single huge instances.
- ``cpu_reference`` — native C++ sequential engine replicating the
  reference's exact sequential semantics (CPU baseline / oracle).

float64 note: objective parity with the Rust solvers to 1e-9 requires
f64 price arithmetic, so importing this package enables
``jax_enable_x64`` (set ``SLAP_TPU_NO_X64=1`` to opt out and use the
float32 fast path only).
"""

import os

import jax

# Respect an explicit user choice (JAX_ENABLE_X64 env or the opt-out)
# before mutating process-global config; see the float64 note above.
if (
    not os.environ.get("SLAP_TPU_NO_X64")
    and "JAX_ENABLE_X64" not in os.environ
):
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the TPU backend in this environment takes
# minutes per cold compile of the solver loops; cache them across
# processes (override location with JAX_COMPILATION_CACHE_DIR, disable
# with SLAP_TPU_NO_COMPILE_CACHE).


def _cpu_platform_selected() -> bool:
    """True when this process is headed for the XLA:CPU backend.

    Checks the jax.config value (which mirrors the env var and
    reflects any ``jax.config.update("jax_platforms", "cpu")`` done
    before this import — the outage-safe pattern whose env var stays
    unset; keying on the env var alone let host-feature-keyed XLA:CPU
    AOT entries leak into the committed TPU cache, ADVICE r4 #1).
    ``jax_platforms`` is a PRIORITY list — this environment's default
    is ``"axon,cpu"`` (TPU first, cpu fallback) — so only the FIRST
    entry decides; a substring test would misroute every TPU process.
    Code that flips the platform AFTER this import must use
    :func:`force_cpu_platform` instead.
    """
    try:
        plat = jax.config.jax_platforms or ""
    except AttributeError:  # pragma: no cover - very old jax
        plat = ""
    plat = plat or os.environ.get("JAX_PLATFORMS", "")
    first = plat.split(",")[0].strip().lower()
    return first == "cpu"


if not os.environ.get("SLAP_TPU_NO_COMPILE_CACHE"):
    # CPU-platform runs (tests, dryrun_multichip) cache separately:
    # XLA:CPU entries are AOT machine code keyed to the build host's
    # CPU features — on any other host they load with SIGILL-risk
    # warnings and are useless.  The committed .jax_cache holds ONLY
    # TPU programs, which are device code and transfer across hosts.
    _default_cache = ".jax_cache_cpu" if _cpu_platform_selected() else ".jax_cache"
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", _default_cache),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # pragma: no cover
        pass

from .solution import (  # noqa: E402
    INDEX_DTYPE,
    UNASSIGNED,
    AuctionSolution,
    convert_indices,
    unassigned_value,
)
from .solver import AuctionSolver  # noqa: E402
from .ksparse import KhoslaSolver  # noqa: E402
from .symmetric import ForwardAuctionSolver  # noqa: E402

__all__ = [
    "AuctionSolution",
    "AuctionSolver",
    "KhoslaSolver",
    "ForwardAuctionSolver",
    "UNASSIGNED",
    "INDEX_DTYPE",
    "unassigned_value",
    "convert_indices",
    "solve_batch",
    "solve_batch_stream",
    "solve_batch_sparse",
    "solve_batch_sparse_stream",
    "stage_batch_sparse",
    "stage_batch_sparse_device",
    "BatchedLAP",
    "linear_sum_assignment",
]

__version__ = "0.1.0"


def force_cpu_platform() -> None:
    """Switch this process to the XLA:CPU platform AND repoint the
    persistent compilation cache at the CPU-entry directory.

    XLA:CPU persistent-cache entries are AOT machine code keyed to the
    build host's CPU features; on any other host they load with
    SIGILL-risk warnings.  A bare
    ``jax.config.update("jax_platforms", "cpu")`` after this package
    imported keeps the TPU cache dir selected at import time and
    writes CPU entries into the committed ``.jax_cache`` — the
    pollution found in the round-4 artifact.  Use this helper for any
    post-import platform flip (only valid before first backend use,
    like the underlying config update — importing this package does
    NOT initialize a backend: the module-level device constants are
    NumPy scalars precisely so an outage-time import cannot hang and
    this helper still works after it).
    """
    jax.config.update("jax_platforms", "cpu")
    _cur = jax.config.jax_compilation_cache_dir
    if _cur and os.path.basename(os.path.normpath(_cur)) == ".jax_cache":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.normpath(_cur)), ".jax_cache_cpu"
            ),
        )


def __getattr__(name):
    # lazy import to keep base import light
    if name in (
        "solve_batch",
        "solve_batch_stream",
        "solve_batch_sparse",
        "solve_batch_sparse_stream",
        "stage_batch_sparse",
        "stage_batch_sparse_device",
        "BatchedLAP",
        "linear_sum_assignment",
    ):
        from . import batch

        return getattr(batch, name)
    raise AttributeError(name)
