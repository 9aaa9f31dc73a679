from limbo_tpu.kernels.base import JITTER, KernelMixin
from limbo_tpu.kernels.kernels import (
    Exp,
    MaternFiveHalves,
    MaternThreeHalves,
    SquaredExpARD,
)

__all__ = [
    "JITTER",
    "KernelMixin",
    "Exp",
    "SquaredExpARD",
    "MaternThreeHalves",
    "MaternFiveHalves",
]
