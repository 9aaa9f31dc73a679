from limbo_tpu.means.means import (
    ConstantMean,
    DataMean,
    FunctionARD,
    NullMean,
    prepare_mean,
)

__all__ = ["NullMean", "ConstantMean", "DataMean", "FunctionARD", "prepare_mean"]
