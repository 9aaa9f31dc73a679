from limbo_tpu.opt.base import OptResult, clip01
from limbo_tpu.opt.cmaes import Cmaes
from limbo_tpu.opt.constrained import AugmentedLagrangian
from limbo_tpu.opt.compose import Chained, ParallelRepeater, RandomRestarts
from limbo_tpu.opt.direct import DirectL
from limbo_tpu.opt.gradient import Adam, GradientAscent, Rprop
from limbo_tpu.opt.nsga2 import Nsga2
from limbo_tpu.opt.search import GridSearch, RandomPoint, RandomSweep, argmax_candidates

__all__ = [
    "OptResult", "clip01", "Rprop", "Adam", "GradientAscent", "GridSearch",
    "RandomPoint", "RandomSweep", "argmax_candidates", "ParallelRepeater",
    "RandomRestarts", "Chained", "Cmaes", "DirectL", "Nsga2",
    "AugmentedLagrangian",
]
