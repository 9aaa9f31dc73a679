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
