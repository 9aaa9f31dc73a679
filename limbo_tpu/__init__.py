"""limbo_tpu: a TPU-native Gaussian-process / Bayesian-optimization framework.

Brand-new JAX/XLA/Pallas/pjit design with the capability surface of
resibots/limbo (C++11/Eigen/TBB header library).  See SURVEY.md at the repo
root for the capability map and docstrings throughout for file:line parity
citations into the reference.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# GP numerics need true-f32 matmuls: on TPU the DEFAULT matmul precision
# runs bf16 passes, whose ~8e-3 relative error swamps the pairwise-distance
# cancellation (|a|^2+|b|^2-2ab) for closely spaced points and turns dense
# kernel matrices indefinite (observed: NaN Cholesky at n=600 in 1-D).
# Opt out with LIMBO_TPU_FAST_MATMUL=1 for throughput-over-accuracy runs.
if not _os.environ.get("LIMBO_TPU_FAST_MATMUL"):
    _jax.config.update("jax_default_matmul_precision", "highest")

from limbo_tpu import kernels, means, models, opt, utils
