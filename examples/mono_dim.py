"""2-in / 1-out Bayesian optimization with GP-UCB.

Mirrors src/examples/mono_dim.cpp:46-120: maximize a 1-peak objective over
[0,1]^2 with GP-UCB acquisition, random init, stats written to a
hostname_date_pid result dir.
"""

import jax
import numpy as np

from limbo_tpu.acqui import GP_UCB
from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling, stats


def fit_eval(x):
    # same shape as mono_dim.cpp's fit_eval: peak at (0.25, 0.75)
    x = np.asarray(x)
    return np.array([-np.sum((x - np.array([0.25, 0.75])) ** 2)])


def main():
    bo = BOptimizer(
        acqui=GP_UCB(),
        init=RandomSampling(10),
        stop=(MaxIterations(40),),
        stats=(stats.ConsoleSummary(), stats.Samples(), stats.Observations(),
               stats.BestObservations(), stats.AggregatedObservations()),
        res_base_dir=".",
    )
    state = bo.optimize(fit_eval, dim_in=2, key=jax.random.PRNGKey(0))
    print("best sample:", state.best_sample,
          "best observation:", state.best_observation)
    return state


if __name__ == "__main__":
    main()
