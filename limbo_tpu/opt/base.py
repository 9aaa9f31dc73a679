"""Inner-optimizer protocol.

Reference: limbo's uniform functor protocol (src/limbo/opt/optimizer.hpp:61):
``opt::eval_t operator()(f, init, bounded)`` maximizing f.  Here an optimizer
is a pytree dataclass with static config, callable as

    result = optimizer(fun, init, key, bounded)

where ``fun: (d,) -> scalar`` is a *differentiable JAX function to maximize*
(gradient-based optimizers call jax.value_and_grad themselves — autodiff
replaces limbo's eval_grad plumbing), ``init`` is a (d,) start point, ``key``
is a PRNG key (replaces limbo's thread-local RNG), and ``bounded`` restricts
the search to [0, 1]^d.  Returns an OptResult pytree; every optimizer is pure
and jit/vmap-compatible, so restarts batch with vmap and fan out across chips
with shard_map (replacing limbo's TBB, tools/parallel.hpp:117-229).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class OptResult:
    x: jax.Array       # (d,) best point found
    value: jax.Array   # scalar f(x)


def clip01(x: jax.Array, bounded: bool) -> jax.Array:
    """Project onto [0,1]^d when bounded (limbo rprop.hpp:100-105 clamps)."""
    return jnp.clip(x, 0.0, 1.0) if bounded else x
