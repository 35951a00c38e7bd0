"""Dense problem representation — fully gather-free auction rounds.

For dense instances (every person connected to every object, the batched
256x256 north-star case) the padded-CSR machinery degenerates: columns are
iotas, so *every* lookup in the auction round can be expressed as a
broadcast + masked reduction over the ``[M, N]`` value matrix.  TPU
gathers (per-lane dynamic indexing) are the one slow primitive on the
VPU; this layout has none at all — each round is a handful of vector
passes over ``[M, N]``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class DenseProblem:
    """One dense LAP instance: ``vals_t[M, N]`` — value of (object j,
    person u), i.e. the transposed cost matrix, persons on the lane axis."""

    def __init__(self, vals_t):
        self.vals_t = vals_t

    @property
    def dtype(self):
        return self.vals_t.dtype

    @property
    def num_rows(self) -> int:
        return self.vals_t.shape[1]

    @property
    def num_cols(self) -> int:
        return self.vals_t.shape[0]

    def tree_flatten(self):
        return (self.vals_t,), None

    @classmethod
    def tree_unflatten(cls, aux: Any, children):
        del aux
        return cls(*children)
