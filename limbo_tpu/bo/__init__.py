from limbo_tpu.bo.init_designs import (
    LHS,
    GridSampling,
    NoInit,
    RandomSampling,
    RandomSamplingGrid,
)
from limbo_tpu.bo.optimizer import (
    BOptimizer,
    BOState,
    EvaluationError,
    default_acqui_optimizer,
)
from limbo_tpu.bo.stop import MaxIterations, MaxPredictedValue
from limbo_tpu.bo import stats
from limbo_tpu.bo.distributed import DistributedBOptimizer

__all__ = [
    "BOptimizer", "BOState", "EvaluationError", "default_acqui_optimizer",
    "DistributedBOptimizer",
    "RandomSampling", "RandomSamplingGrid", "GridSampling", "LHS", "NoInit",
    "MaxIterations", "MaxPredictedValue", "stats",
]


def BOptimizerHPOpt(**kwargs):
    """BOptimizer preconfigured for hyperparameter learning (limbo
    BOptimizerHPOpt, bayes_opt/boptimizer.hpp:212): SquaredExpARD kernel +
    KernelLFOpt every `hp_period` (default 10) iterations."""
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.models.hp_opt import KernelLFOpt
    from limbo_tpu.opt import ParallelRepeater, Rprop

    dim_in = kwargs.pop("dim_in", None)
    dtype = kwargs.get("dtype", jnp.float32)
    kwargs.setdefault("hp_opt", KernelLFOpt(
        optimizer=ParallelRepeater(sub=Rprop(iterations=100), repeats=4)))
    kwargs.setdefault("hp_period", 10)
    if dim_in is not None and "kernel" not in kwargs:
        kwargs["kernel"] = SquaredExpARD.create(dim=dim_in, dtype=dtype)
    return BOptimizer(**kwargs)
