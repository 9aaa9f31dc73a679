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

__all__ = [
    "BOptimizer", "BOState", "EvaluationError", "default_acqui_optimizer",
    "RandomSampling", "RandomSamplingGrid", "GridSampling", "LHS", "NoInit",
    "MaxIterations", "MaxPredictedValue", "stats",
]
