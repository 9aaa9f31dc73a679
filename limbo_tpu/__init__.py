"""limbo_tpu: a TPU-native Gaussian-process / Bayesian-optimization framework.

Brand-new JAX/XLA/Pallas/pjit design with the capability surface of
resibots/limbo (C++11/Eigen/TBB header library).  See SURVEY.md at the repo
root for the capability map and docstrings throughout for file:line parity
citations into the reference.
"""

__version__ = "0.1.0"

from limbo_tpu import kernels, means, models, opt, utils
