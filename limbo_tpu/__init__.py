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

# Honor JAX_COMPILATION_CACHE_DIR even when a sitecustomize preloaded jax
# before the env var was set in-process (the axon TPU-tunnel image does):
# jax binds env-backed config at import time, so a late os.environ write
# silently leaves the persistent compile cache disabled — and the big
# n=10k programs then pay their full 50-230 s compile in every process.
# See utils/compile_cache.enable_compile_cache for the script-side helper.
_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _min = _os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
    if _min is not None:
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           float(_min))

from limbo_tpu import kernels, means, models, opt, utils
