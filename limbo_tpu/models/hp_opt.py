"""Hyperparameter-learning strategies for the GP.

Reference: src/limbo/model/gp/{hp_opt,kernel_lf_opt,kernel_loo_opt,
kernel_mean_lf_opt,mean_lf_opt,no_lf_opt}.hpp — strategy objects that copy the
GP, set candidate log-space params, recompute, and hand the objective (+ its
hand-derived gradient) to opt::Rprop.

Here each strategy is a callable pytree `(gp, key) -> gp` whose objective is a
differentiable scalar in the flat log-parameter vector; `jax.value_and_grad`
inside the (scan-based) optimizer replaces the manual gradients.  The whole
optimization — hundreds of Cholesky factorizations — is one jitted program
on the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import ParallelRepeater
from limbo_tpu.opt.gradient import Rprop


def _default_opt():
    return Rprop(iterations=300)


@struct.dataclass
class NoLFOpt:
    """Do-nothing strategy (limbo gp::NoLFOpt, no_lf_opt.hpp:57)."""

    def __call__(self, gp: gp_mod.GP, key=None) -> gp_mod.GP:
        return gp


@struct.dataclass
class KernelLFOpt:
    """Max log-marginal-likelihood over kernel params (kernel_lf_opt.hpp:57)."""

    optimizer: object = struct.field(default_factory=_default_opt)

    def __call__(self, gp: gp_mod.GP, key=None) -> gp_mod.GP:
        key = key if key is not None else jax.random.PRNGKey(0)

        def objective(p):
            return gp_mod.log_marginal_likelihood(
                gp.kernel.with_params(p), gp.mean, gp.x, gp.y, gp.n)

        init = gp.kernel.params
        res = self.optimizer(objective, init, key, bounded=False)
        return gp_mod.recompute(
            gp.replace(kernel=gp.kernel.with_params(res.x)))


@struct.dataclass
class KernelLooOpt:
    """Max LOO-CV log prob over kernel params (kernel_loo_opt.hpp:57)."""

    optimizer: object = struct.field(default_factory=_default_opt)

    def __call__(self, gp: gp_mod.GP, key=None) -> gp_mod.GP:
        key = key if key is not None else jax.random.PRNGKey(0)

        def objective(p):
            return gp_mod.log_loo_cv_fn(
                gp.kernel.with_params(p), gp.mean, gp.x, gp.y, gp.n)

        res = self.optimizer(objective, gp.kernel.params, key, bounded=False)
        return gp_mod.recompute(
            gp.replace(kernel=gp.kernel.with_params(res.x)))


@struct.dataclass
class KernelMeanLFOpt:
    """Joint kernel+mean LML optimization (kernel_mean_lf_opt.hpp:57).

    Parameter vector = [kernel params, mean params] (limbo order).
    """

    optimizer: object = struct.field(default_factory=_default_opt)

    def __call__(self, gp: gp_mod.GP, key=None) -> gp_mod.GP:
        key = key if key is not None else jax.random.PRNGKey(0)
        nk = gp.kernel.params_size

        def objective(p):
            k = gp.kernel.with_params(p[:nk])
            m = gp.mean.with_params(p[nk:])
            return gp_mod.log_marginal_likelihood(k, m, gp.x, gp.y, gp.n)

        init = jnp.concatenate([gp.kernel.params, gp.mean.params])
        res = self.optimizer(objective, init, key, bounded=False)
        return gp_mod.recompute(gp.replace(
            kernel=gp.kernel.with_params(res.x[:nk]),
            mean=gp.mean.with_params(res.x[nk:])))


@struct.dataclass
class MeanLFOpt:
    """LML optimization over mean params only (mean_lf_opt.hpp:57)."""

    optimizer: object = struct.field(default_factory=_default_opt)

    def __call__(self, gp: gp_mod.GP, key=None) -> gp_mod.GP:
        key = key if key is not None else jax.random.PRNGKey(0)

        def objective(p):
            return gp_mod.log_marginal_likelihood(
                gp.kernel, gp.mean.with_params(p), gp.x, gp.y, gp.n)

        res = self.optimizer(objective, gp.mean.params, key, bounded=False)
        return gp_mod.recompute(gp.replace(mean=gp.mean.with_params(res.x)))
