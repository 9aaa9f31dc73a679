"""Acquisition functions: UCB, GP-UCB, EI (+ aggregators).

Reference: src/limbo/acqui/{ucb,gp_ucb,ei}.hpp.  An acquisition is a pytree
dataclass; `acq(gp, x, iteration)` scores a single (d,) candidate through the
aggregator, and — unlike limbo, whose acquisition functors refuse gradients
(`assert(!gradient)`, ucb.hpp:84) — it is differentiable end-to-end through
the GP query, so the inner optimizer can use ascent directly instead of
derivative-free DIRECT.

Aggregators map multi-output mu (p,) to a scalar (limbo FirstElem,
bayes_opt/bo_base.hpp:99).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.models import gp as gp_mod


def FirstElem(mu: jax.Array) -> jax.Array:
    """limbo FirstElem aggregator (bo_base.hpp:99)."""
    return mu[0]


def MeanAggregator(mu: jax.Array) -> jax.Array:
    return jnp.mean(mu)


def DistanceToTarget(target):
    """Aggregator factory: -|mu - target| (the reference's example custom
    aggregator pattern, e.g. src/examples/obs_multi.cpp)."""
    target = jnp.asarray(target)

    def agg(mu: jax.Array) -> jax.Array:
        return -jnp.sqrt(jnp.sum((mu - target) ** 2) + 1e-12)

    return agg


def _query1(gp, x):
    from limbo_tpu.models.dispatch import query_any

    mu, var = query_any(gp, x[None, :])
    # MultiGP returns per-output variances (q, p); aggregate like limbo's
    # scalar sigma by taking the first output's variance
    var0 = var[0] if var.ndim == 1 else var[0, 0]
    return mu[0], var0


@struct.dataclass
class UCB:
    """UCB(x) = agg(mu(x)) + alpha * sigma(x) (acqui/ucb.hpp:74-92; default
    alpha = 0.5)."""

    alpha: float = struct.field(pytree_node=False, default=0.5)

    def __call__(self, gp, x: jax.Array, aggregator=FirstElem,
                 iteration=0) -> jax.Array:
        mu, var = _query1(gp, x)
        return aggregator(mu) + self.alpha * jnp.sqrt(var)


@struct.dataclass
class GP_UCB:
    """GP-UCB with iteration-dependent beta (acqui/gp_ucb.hpp:81-89):

    beta = sqrt(2 log(t^(D/2+2) pi^2 / (3 delta))), default delta = 0.1.
    """

    delta: float = struct.field(pytree_node=False, default=0.1)

    def __call__(self, gp, x: jax.Array, aggregator=FirstElem,
                 iteration=0) -> jax.Array:
        d = gp.dim_in
        t = jnp.asarray(iteration, dtype=x.dtype)
        nt = jnp.power(jnp.maximum(t, 1e-10), d / 2.0 + 2.0)
        # clamp the log argument >= 1: limbo's formula NaNs at iteration 0
        # (log(0) -> sqrt(-inf)); we floor beta at 0 instead
        log_arg = jnp.maximum(nt * (math.pi ** 2) / (3.0 * self.delta), 1.0)
        beta = jnp.sqrt(2.0 * jnp.log(log_arg))
        mu, var = _query1(gp, x)
        return aggregator(mu) + beta * jnp.sqrt(var)


@struct.dataclass
class EI:
    """Expected improvement with jitter xi (acqui/ei.hpp:76-117):

    EI(x) = (m - f_max - xi) Phi(Z) + s phi(Z), Z = (m - f_max - xi)/s.

    f_max is the best *predicted* value over current samples (limbo caches it
    per model size, ei.hpp:99-113); here it is evaluated in-batch — one masked
    query over the sample buffer, fused into the same XLA program.
    """

    jitter: float = struct.field(pytree_node=False, default=0.0)

    def best_predicted(self, gp, aggregator=FirstElem) -> jax.Array:
        from limbo_tpu.models.dispatch import query_any

        mu_all, _ = query_any(gp, gp.x)                     # (N, p)
        vals = jax.vmap(aggregator)(mu_all)                 # (N,)
        vals = jnp.where(gp.mask > 0, vals, -jnp.inf)
        return jnp.max(vals)

    def __call__(self, gp, x: jax.Array, aggregator=FirstElem,
                 iteration=0, f_max=None) -> jax.Array:
        mu, var = _query1(gp, x)
        sigma = jnp.sqrt(var)
        if f_max is None:
            f_max = self.best_predicted(gp, aggregator)
        X = aggregator(mu) - f_max - self.jitter
        Z = X / jnp.maximum(sigma, 1e-10)
        phi = jnp.exp(-0.5 * Z * Z) / jnp.sqrt(2.0 * jnp.pi)
        Phi = 0.5 * jax.lax.erfc(-Z / jnp.sqrt(2.0))
        ei = X * Phi + sigma * phi
        # limbo returns 0 when sigma ~ 0 or no samples yet (ei.hpp:95-97)
        return jnp.where((sigma < 1e-10) | (gp.n < 1), 0.0, ei)
