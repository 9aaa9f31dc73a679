from limbo_tpu.benchmarks.functions import (
    ALL_FUNCTIONS,
    BRANIN,
    ELLIPSOID,
    GOLDSTEIN_PRICE,
    HARTMANN3,
    HARTMANN6,
    RASTRIGIN,
    SIX_HUMP_CAMEL,
    SPHERE,
    TestFunction,
)
from limbo_tpu.benchmarks.regression_functions import (
    ALL_REGRESSION,
    RegressionFunction,
)
