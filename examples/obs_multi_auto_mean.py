"""Multi-output observations with a learned mean function.

Mirrors src/examples/obs_multi_auto_mean.cpp: FunctionARD-wrapped mean whose
affine transform is learned jointly with the kernel hyperparameters
(KernelMeanLFOpt).
"""

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui import UCB
from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import ConstantMean, FunctionARD
from limbo_tpu.models.hp_opt import KernelMeanLFOpt
from limbo_tpu.opt import Rprop


def eval_fn(x):
    x = np.asarray(x)
    return np.array([2.0 - np.sum((x - 0.5) ** 2), x.sum()])


def main():
    mean = FunctionARD.create(ConstantMean.create(1.0, dim_out=2,
                                                  dtype=jnp.float32),
                              dim_out=2)
    bo = BOptimizer(
        kernel=SquaredExpARD.create(dim=2),
        mean=mean,
        acqui=UCB(alpha=0.5),
        init=RandomSampling(10),
        stop=(MaxIterations(30),),
        hp_opt=KernelMeanLFOpt(optimizer=Rprop(iterations=100)),
        hp_period=10,
        stats_enabled=False,
    )
    state = bo.optimize(eval_fn, dim_in=2, dim_out=2,
                        key=jax.random.PRNGKey(0))
    print("best sample:", state.best_sample)
    return state


if __name__ == "__main__":
    main()
