from limbo_tpu.ops.ehvi import ehvi_2d_max, ehvi_2d_min, ehvi_mc_max
from limbo_tpu.ops.pareto import (
    dominance_matrix,
    hypervolume,
    hypervolume_2d,
    non_dominated_mask,
    pareto_set,
)

__all__ = [
    "dominance_matrix", "non_dominated_mask", "pareto_set",
    "hypervolume", "hypervolume_2d",
    "ehvi_2d_min", "ehvi_2d_max", "ehvi_mc_max",
]
