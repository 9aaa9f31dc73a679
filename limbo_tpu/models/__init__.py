from limbo_tpu.models.gp import (
    GP,
    add_sample,
    empty,
    fit,
    grow,
    inv_kernel,
    log_lik,
    log_loo_cv,
    log_loo_cv_fn,
    log_marginal_likelihood,
    mean_observation,
    observations,
    query,
    recompute,
    samples,
)
from limbo_tpu.models.hp_opt import (
    KernelLFOpt,
    KernelLooOpt,
    KernelMeanLFOpt,
    MeanLFOpt,
    NoLFOpt,
)


def GPBasic(dim_in: int, dim_out: int = 1, capacity: int = 256,
            dtype=None):
    """Matern-5/2 + DataMean + no hp-opt (limbo model::GPBasic,
    model/gp.hpp:637)."""
    import jax.numpy as jnp

    from limbo_tpu.kernels import MaternFiveHalves
    from limbo_tpu.means import DataMean

    dtype = dtype if dtype is not None else jnp.float32
    return empty(MaternFiveHalves.create(dtype=dtype),
                 DataMean.create(dim_out=dim_out, dtype=dtype),
                 dim_in, dim_out, capacity, dtype=dtype)


def GPOpt(dim_in: int, dim_out: int = 1, capacity: int = 256, dtype=None):
    """SquaredExpARD + DataMean, to be trained with KernelLFOpt (limbo
    model::GPOpt, model/gp.hpp:642)."""
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean

    dtype = dtype if dtype is not None else jnp.float32
    return empty(SquaredExpARD.create(dim=dim_in, dtype=dtype),
                 DataMean.create(dim_out=dim_out, dtype=dtype),
                 dim_in, dim_out, capacity, dtype=dtype)
