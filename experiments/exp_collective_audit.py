"""Collective-count audit of every sharded mode (VERDICT r3 item 7).

Traces each sharded core program (the exact shard_map+jit programs the
solvers dispatch) on a virtual 8-device CPU mesh and counts the
cross-device collective primitives in the jaxpr, normalized per round.
This makes the ICI cost model explicit: per round, how many all_gathers
/ psums / pmax/pmin merges ride the interconnect, over what vector
lengths.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     PYTHONPATH=/root/repo python experiments/exp_collective_audit.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sparse_linear_assignment_tpu.parallel import sharded as sh

S = jax.ShapeDtypeStruct
COLL_SUBSTR = ("all_gather", "psum", "pmax", "pmin", "ppermute",
               "all_to_all", "reduce_scatter", "all_reduce")


def count_collectives(closed):
    from jax._src import core as jcore

    per_round = Counter()   # inside a scan/while body: runs every round
    per_chunk = Counter()   # outside: runs once per chunk dispatch

    def as_jaxpr(x):
        if isinstance(x, jcore.ClosedJaxpr):
            return x.jaxpr
        if isinstance(x, jcore.Jaxpr):
            return x
        return None

    def walk(jaxpr, in_loop):
        for eqn in jaxpr.eqns:
            nm = eqn.primitive.name
            if any(s in nm for s in COLL_SUBSTR):
                (per_round if in_loop else per_chunk)[nm] += 1
            child_in_loop = in_loop or nm in ("scan", "while")
            for v in eqn.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for x in vs:
                    inner = as_jaxpr(x)
                    if inner is not None:
                        walk(inner, child_in_loop)

    walk(closed.jaxpr, False)
    return per_round, per_chunk


def report(label, chunk, counts, note=""):
    per_round, per_chunk = counts
    print(f"{label}: per-round {dict(sorted(per_round.items()))} "
          f"({sum(per_round.values())}), per-chunk "
          f"{dict(sorted(per_chunk.items()))} "
          f"({sum(per_chunk.values())}){note}")


def main():
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("shard",))
    f8 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # --- sharded Khosla (persons/objects sharded k-sparse) ---
    chunk = 4
    core = sh.sharded_khosla_core(mesh, chunk=chunk)
    K, N, M, Kc = 2, 16, 16, 4
    args = (
        S((K, N), jnp.int32), S((K, N), f8), S((K, N), jnp.bool_),
        S((Kc, M), jnp.int32), S((Kc, M), jnp.bool_),
        S((M,), f8), S((N,), jnp.int32), S((M,), jnp.int32),
        S((N,), jnp.bool_), S((), jnp.int32), S((), f8), S((), f8),
    )
    report("khosla", chunk, count_collectives(jax.make_jaxpr(core)(*args)))

    # --- sharded forward auction ---
    core = sh.sharded_forward_core(mesh, chunk=chunk)
    args = (
        S((K, N), jnp.int32), S((K, N), f8), S((K, N), jnp.bool_),
        S((Kc, M), jnp.int32), S((Kc, M), jnp.bool_),
        S((N,), jnp.bool_),
        S((M,), f8), S((N,), jnp.int32), S((M,), jnp.int32),
        S((), f8), S((), jnp.int32), S((), jnp.int32),
        S((), jnp.bool_), S((), jnp.bool_),
        S((), f8), S((), f8), S((), jnp.bool_), S((), jnp.int32),
        S((), f8),  # price_bound (infeasibility certificate)
    )
    report("forward", chunk, count_collectives(jax.make_jaxpr(core)(*args)))

    # --- sharded dense FR single (objects sharded) ---
    chunk_d = 4
    core = sh.sharded_fr_dense_core(mesh, chunk=chunk_d)
    N2 = 16
    args = (
        S((N2, N2), jnp.float32),       # vals_l (full; spec shards axis 0)
        S((N2,), jnp.float32), S((N2,), jnp.int32),
        S((N2,), jnp.float32), S((N2,), jnp.int32),
        S((), jnp.bool_), S((), jnp.bool_), S((), jnp.int32),
        S((), jnp.int32), S((), jnp.int32), S((), jnp.float32),
    )
    report("dense-fr", chunk_d,
           count_collectives(jax.make_jaxpr(core)(*args)))

    # --- sharded batched (data-parallel instances, XLA-rounds variant) ---
    from sparse_linear_assignment_tpu.ops.fr_dense import FRState

    chunk_b = 4
    core = sh.sharded_batch_core(mesh, chunk=chunk_b, use_kernel=False) \
        if hasattr(sh, "sharded_batch_core") else None
    if core is None:
        # wrap _fr_batch_chunk_local the way the solver does
        import functools
        from jax.sharding import PartitionSpec as P

        bspec = P("shard")
        fn = jax.shard_map(
            functools.partial(
                sh._fr_batch_chunk_local, chunk=chunk_b,
                use_kernel=False, sched=None, interpret=False,
            ),
            mesh=mesh,
            in_specs=(bspec, bspec, P(), P()),
            out_specs=(bspec, P()),
            check_vma=False,
        )
        core = jax.jit(fn)
    b, n = 8, 16
    states = FRState(
        prices=S((b, n), jnp.float32), profits=S((b, n), jnp.float32),
        p2o=S((b, n), jnp.int32), o2p=S((b, n), jnp.int32),
        eps=S((b,), jnp.float32), forward_mode=S((b,), jnp.bool_),
        since_inc=S((b,), jnp.int32), stall_k=S((b,), jnp.int32),
        nits=S((b,), jnp.int32), nreductions=S((b,), jnp.int32),
        optimal_found=S((b,), jnp.bool_), done=S((b,), jnp.bool_),
    )
    closed = jax.make_jaxpr(core)(
        S((b, n, n), jnp.float32), states, S((), jnp.float32),
        S((), jnp.int32),
    )
    report("batched (XLA rounds)", chunk_b, count_collectives(closed),
           "  [collectives here are per CHUNK, not per round]")


if __name__ == "__main__":
    main()
