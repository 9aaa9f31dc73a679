"""Initialization designs: seed points before the BO loop starts.

Reference: src/limbo/init/{random_sampling,random_sampling_grid,grid_sampling,
lhs,no_init}.hpp.  Each design is a pytree dataclass returning a *batch* of
points (m, d); the BO driver evaluates them (in one vmapped call when the
objective is a device function) and seeds the GP, instead of limbo's one-by
-one eval_and_add (init/random_sampling.hpp:71-80).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.utils.random import grid_points, random_lhs, random_vectors


@struct.dataclass
class NoInit:
    """No seeding (init/no_init.hpp:54)."""

    def __call__(self, key, dim: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((0, dim), dtype=dtype)

    @property
    def count(self) -> int:
        return 0


@struct.dataclass
class RandomSampling:
    """samples random points (init/random_sampling.hpp:71; default 10).

    bounded=True -> U[0,1]^d; False -> N(0, 10^2) like limbo's unbounded
    tools::random_vector (random_generator.hpp:141)."""

    samples: int = struct.field(pytree_node=False, default=10)
    bounded: bool = struct.field(pytree_node=False, default=True)

    def __call__(self, key, dim: int, dtype=jnp.float32) -> jax.Array:
        return random_vectors(key, self.samples, dim, bounded=self.bounded,
                              dtype=dtype)

    @property
    def count(self) -> int:
        return self.samples


@struct.dataclass
class RandomSamplingGrid:
    """samples random points snapped onto a bins-grid
    (init/random_sampling_grid.hpp:76; defaults 10 samples, 5 bins)."""

    samples: int = struct.field(pytree_node=False, default=10)
    bins: int = struct.field(pytree_node=False, default=5)

    def __call__(self, key, dim: int, dtype=jnp.float32) -> jax.Array:
        idx = jax.random.randint(key, (self.samples, dim), 0, self.bins + 1)
        return idx.astype(dtype) / self.bins

    @property
    def count(self) -> int:
        return self.samples


@struct.dataclass
class GridSampling:
    """Full cartesian grid, (bins+1)^d points (init/grid_sampling.hpp:70)."""

    bins: int = struct.field(pytree_node=False, default=5)
    dim: int = struct.field(pytree_node=False, default=1)

    def __call__(self, key, dim: int, dtype=jnp.float32) -> jax.Array:
        return grid_points(self.bins, dim, dtype=dtype)

    @property
    def count(self) -> int:
        return (self.bins + 1) ** self.dim


@struct.dataclass
class LHS:
    """Latin hypercube sampling (init/lhs.hpp:71; default 10 samples)."""

    samples: int = struct.field(pytree_node=False, default=10)

    def __call__(self, key, dim: int, dtype=jnp.float32) -> jax.Array:
        return random_lhs(key, self.samples, dim, dtype=dtype)

    @property
    def count(self) -> int:
        return self.samples
