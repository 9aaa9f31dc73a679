"""Optimizer combinators: batched restarts and sequential chaining.

* ParallelRepeater (src/limbo/opt/parallel_repeater.hpp:77): limbo runs N
  perturbed restarts of a sub-optimizer on TBB threads and keeps the best.
  Here the restarts are a vmapped batch axis — one compiled program evaluates
  all restarts at once on the MXU/VPU; across chips the same axis shards with
  shard_map + a pmax/argmax collective (see limbo_tpu.parallel).

* Chained (src/limbo/opt/chained.hpp:60): run optimizers in sequence, each
  starting from the previous result.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult


@struct.dataclass
class ParallelRepeater:
    sub: object                 # sub-optimizer (pytree)
    repeats: int = struct.field(pytree_node=False, default=10)
    epsilon: float = struct.field(pytree_node=False, default=1e-2)

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = False) -> OptResult:
        keys = jax.random.split(key, self.repeats + 1)
        pert = jax.random.uniform(
            keys[0], (self.repeats, init.shape[0]), dtype=init.dtype,
            minval=-self.epsilon, maxval=self.epsilon)
        inits = init[None, :] + pert

        def one(x0, k):
            return self.sub(fun, x0, k, bounded)

        res = jax.vmap(one)(inits, keys[1:])
        i = jnp.argmax(res.value)
        return OptResult(x=res.x[i], value=res.value[i])


@struct.dataclass
class RandomRestarts:
    """Restarts from *uniform random* starting points (not perturbations) —
    the natural acquisition-optimizer default for bounded searches, replacing
    NLOpt DIRECT's global coverage with gradient ascent from a spread of
    starts plus an optional dense random sweep.
    """

    sub: object
    repeats: int = struct.field(pytree_node=False, default=16)
    sweep_samples: int = struct.field(pytree_node=False, default=0)

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = True) -> OptResult:
        d = init.shape[0]
        k_init, k_sub, k_sweep = jax.random.split(key, 3)
        inits = jax.random.uniform(k_init, (self.repeats, d), dtype=init.dtype)
        inits = inits.at[0].set(init)   # keep the provided start as one seed
        keys = jax.random.split(k_sub, self.repeats)

        res = jax.vmap(lambda x0, k: self.sub(fun, x0, k, bounded))(inits, keys)
        i = jnp.argmax(res.value)
        best_x, best_v = res.x[i], res.value[i]

        if self.sweep_samples > 0:
            Xs = jax.random.uniform(k_sweep, (self.sweep_samples, d),
                                    dtype=init.dtype)
            vals = jax.vmap(fun)(Xs)
            j = jnp.argmax(vals)
            better = vals[j] > best_v
            best_x = jnp.where(better, Xs[j], best_x)
            best_v = jnp.where(better, vals[j], best_v)
        return OptResult(x=best_x, value=best_v)


@struct.dataclass
class Chained:
    subs: Tuple = struct.field(default=())

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = False) -> OptResult:
        x = init
        best = OptResult(x=init, value=jnp.asarray(-jnp.inf, dtype=init.dtype))
        keys = jax.random.split(key, max(len(self.subs), 1))
        for sub, k in zip(self.subs, keys):
            res = sub(fun, x, k, bounded)
            x = res.x
            better = res.value > best.value
            best = OptResult(x=jnp.where(better, res.x, best.x),
                             value=jnp.where(better, res.value, best.value))
        return best
