"""Multi-dimensional observations + custom aggregator.

Mirrors src/examples/obs_multi.cpp: the objective returns a 2-D observation;
the BO loop maximizes an aggregated scalar (here: distance-to-target like
the reference's example aggregator).
"""

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui import UCB
from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling


def eval_fn(x):
    x = np.asarray(x)
    return np.array([x[0] - 0.25, x[1] - 0.75])


def distance_to_target(mu):
    """Aggregator: negative distance of the 2-D observation to (0, 0)."""
    return -jnp.sqrt(jnp.sum(mu ** 2) + 1e-12)


def main():
    bo = BOptimizer(
        acqui=UCB(alpha=0.5),
        init=RandomSampling(10),
        stop=(MaxIterations(40),),
        stats_enabled=False,
    )
    state = bo.optimize(eval_fn, dim_in=2, dim_out=2,
                        aggregator=distance_to_target,
                        key=jax.random.PRNGKey(0))
    print("best sample:", state.best_sample)  # ~ (0.25, 0.75)
    return state


if __name__ == "__main__":
    main()
