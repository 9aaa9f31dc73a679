"""Derivative-free inner optimizers: grid search, random point/sweep.

Reference: src/limbo/opt/grid_search.hpp:71 (recursive per-dim grid,
default 5 bins) and src/limbo/opt/random_point.hpp:59.  TPU-first: the grid /
random candidate sets are evaluated as one vmapped batch (a single fused XLA
program) instead of limbo's nested scalar recursion.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult
from limbo_tpu.utils.random import grid_points, random_vectors


def argmax_candidates(fun: Callable, X: jax.Array) -> OptResult:
    """Evaluate a (m, d) candidate batch with vmap; return the argmax."""
    vals = jax.vmap(fun)(X)
    i = jnp.argmax(vals)
    return OptResult(x=X[i], value=vals[i])


@struct.dataclass
class GridSearch:
    """Full cartesian grid, (bins+1)^d points, evaluated in one batch."""

    bins: int = struct.field(pytree_node=False, default=5)

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = True) -> OptResult:
        d = init.shape[0]
        X = grid_points(self.bins, d, dtype=init.dtype)
        return argmax_candidates(fun, X)


@struct.dataclass
class RandomPoint:
    """A single uniform random point in [0,1]^d (random_point.hpp:59)."""

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = True) -> OptResult:
        x = jax.random.uniform(key, init.shape, dtype=init.dtype)
        return OptResult(x=x, value=fun(x))


@struct.dataclass
class RandomSweep:
    """Best of ``samples`` uniform random points — the batched generalization
    of RandomPoint that actually exploits the accelerator (one vmapped eval).
    """

    samples: int = struct.field(pytree_node=False, default=1024)

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = True) -> OptResult:
        X = random_vectors(key, self.samples, init.shape[0], dtype=init.dtype)
        return argmax_candidates(fun, X)
