"""Stop criteria for the BO loop.

Reference: src/limbo/stop/{max_iterations,max_predicted_value,
chain_criteria}.hpp.  A criterion is a callable `(state) -> bool-array`; the
driver OR-folds a tuple of them (limbo chains via boost::fusion::accumulate,
chain_criteria.hpp:65).  Criteria are evaluated on host between iterations
for the host-driven loop; for the fully-jitted lax.scan loop only
MaxIterations applies (static trip count) and other criteria become masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop


@struct.dataclass
class MaxIterations:
    """Stop after `iterations` BO iterations (default 190,
    stop/max_iterations.hpp:55-64)."""

    iterations: int = struct.field(pytree_node=False, default=190)

    def __call__(self, state) -> jax.Array:
        return jnp.asarray(state.iteration >= self.iterations)


@struct.dataclass
class MaxPredictedValue:
    """Stop when best observation >= ratio * max predicted model value
    (stop/max_predicted_value.hpp:71; default ratio 0.9).

    The model-maximum search runs the configured optimizer on the posterior
    mean (limbo optimizes afun(mu(x)) with its acquiopt).
    """

    ratio: float = struct.field(pytree_node=False, default=0.9)
    optimizer: object = struct.field(
        default_factory=lambda: RandomRestarts(sub=Rprop(iterations=50),
                                               repeats=8, sweep_samples=512))

    def __call__(self, state) -> jax.Array:
        from limbo_tpu.models import gp as gp_mod

        gp = state.gp
        agg = state.aggregator

        def mean_val(x):
            mu, _ = gp_mod.query(gp, x[None, :])
            return agg(mu[0])

        res = self.optimizer(mean_val, jnp.full((gp.dim_in,), 0.5,
                                                dtype=gp.x.dtype),
                             state.key, True)
        return state.best_value >= self.ratio * res.value
