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

    def device_stop(self, gp, best_value: jax.Array, key: jax.Array,
                    aggregator) -> jax.Array:
        """jit-safe check used inside optimize_jit's scan: once true, the
        scan's freeze mask skips all remaining iterations (the jitted
        equivalent of breaking the host loop — stop/chain_criteria.hpp:65)."""
        from limbo_tpu.models.dispatch import query_any

        def mean_val(x):
            mu, _ = query_any(gp, x[None, :])
            return aggregator(mu[0])

        res = self.optimizer(mean_val, jnp.full((gp.dim_in,), 0.5,
                                                dtype=gp.x.dtype), key, True)
        return best_value >= self.ratio * res.value

    def __call__(self, state) -> jax.Array:
        return self.device_stop(state.gp,
                                jnp.asarray(state.best_value,
                                            dtype=state.gp.x.dtype),
                                state.key, state.aggregator)
