"""Advanced BO tutorial (mirrors src/tutorials/advanced_example.cpp):
custom kernel/mean/acquisition/optimizer/stop configuration, hyperparameter
learning, stats, and resume."""

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui import EI
from limbo_tpu.bo import BOptimizer, LHS, MaxIterations, stats
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import ConstantMean
from limbo_tpu.models.hp_opt import KernelLFOpt
from limbo_tpu.opt import Cmaes, ParallelRepeater, Rprop


def eval_fn(x):
    x = np.asarray(x)
    return np.array([-np.sum((x - 0.4) ** 2) + 0.1 * np.cos(8 * x[0])])


if __name__ == "__main__":
    bo = BOptimizer(
        kernel=SquaredExpARD.create(dim=2, optimize_noise=True),
        mean=ConstantMean.create(0.0),
        acqui=EI(jitter=0.01),
        acqui_optimizer=Cmaes(iterations=60, pop_size=16),
        init=LHS(samples=12),
        stop=(MaxIterations(25),),
        hp_opt=KernelLFOpt(
            optimizer=ParallelRepeater(sub=Rprop(iterations=100),
                                       repeats=4, epsilon=0.5)),
        hp_period=10,
        stats=(stats.ConsoleSummary(),),
        res_base_dir=None,
    )
    state = bo.optimize(eval_fn, dim_in=2, key=jax.random.PRNGKey(0))
    print("first run best:", state.best_sample)
    # resume without resetting (bo_base.hpp:249, reset=false)
    state = bo.optimize(eval_fn, dim_in=2, reset=False, state=state,
                        key=jax.random.PRNGKey(1))
    print("after resume:", state.best_sample, state.total_iterations)
