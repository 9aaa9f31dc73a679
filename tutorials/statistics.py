"""Custom statistics tutorial (mirrors src/tutorials/statistics.cpp):
define a new stat functor and attach it to the BO loop."""

import jax
import numpy as np

from limbo_tpu.bo import BOptimizer, MaxIterations
from limbo_tpu.bo.stats import StatBase


class WorstObservation(StatBase):
    """Example custom stat: log the worst observation so far."""

    filename = "worst_observations.dat"

    def __call__(self, bo, state):
        n = int(state.gp.n)
        ys = np.asarray(state.gp.y[:n])
        worst = ys[np.argmin([state.aggregator(y) for y in ys])]
        self._log(bo, f"{state.iteration} "
                  + " ".join(f"{v:.6g}" for v in worst))


def eval_fn(x):
    return np.array([-np.sum((np.asarray(x) - 0.5) ** 2)])


if __name__ == "__main__":
    bo = BOptimizer(stop=(MaxIterations(15),),
                    stats=(WorstObservation(),), res_base_dir=".")
    state = bo.optimize(eval_fn, dim_in=2, key=jax.random.PRNGKey(0))
    print("done; stats in", bo.res_dir)
