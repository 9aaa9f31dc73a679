"""Dispatching gram builders: fused Pallas forward + jnp-recompute backward.

Forward covariance blocks use the fused Pallas kernel on TPU (one pass at
HBM bandwidth); the VJP recomputes through the jnp reference formula — the
backward only runs inside hyperparameter learning / acquisition gradients,
where its cost equals the old forward, so nothing regresses while every
forward (fit, query sweeps, BO loops) gets the fused path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from limbo_tpu.ops.gram_pallas import gram_pallas, use_pallas
from limbo_tpu.utils.maths import safe_sqrt, sq_dist


# -- jnp reference forms -----------------------------------------------------

def se_gram_ref(X1s, X2s, sf2):
    return sf2 * jnp.exp(-0.5 * sq_dist(X1s, X2s))


def matern32_gram_ref(X1, X2, sf2, inv_l):
    d = safe_sqrt(sq_dist(X1, X2))
    t = (math.sqrt(3.0) * inv_l) * d
    return sf2 * (1.0 + t) * jnp.exp(-t)


def matern52_gram_ref(X1, X2, sf2, inv_l):
    d2 = sq_dist(X1, X2)
    d = safe_sqrt(d2)
    t = (math.sqrt(5.0) * inv_l) * d
    quad = (5.0 / 3.0) * (inv_l * inv_l) * d2
    return sf2 * (1.0 + t + quad) * jnp.exp(-t)


# -- fused forward + reference backward --------------------------------------

@jax.custom_vjp
def _se_fast(X1s, X2s, sf2):
    return gram_pallas(X1s, X2s, sf2, jnp.asarray(1.0, X1s.dtype), form="se")


def _se_fwd(X1s, X2s, sf2):
    return _se_fast(X1s, X2s, sf2), (X1s, X2s, sf2)


def _se_bwd(res, g):
    X1s, X2s, sf2 = res
    _, vjp = jax.vjp(se_gram_ref, X1s, X2s, sf2)
    return vjp(g)


_se_fast.defvjp(_se_fwd, _se_bwd)


def _make_matern_fast(form, ref):
    @jax.custom_vjp
    def fast(X1, X2, sf2, inv_l):
        return gram_pallas(X1, X2, sf2, inv_l, form=form)

    def fwd(X1, X2, sf2, inv_l):
        return fast(X1, X2, sf2, inv_l), (X1, X2, sf2, inv_l)

    def bwd(res, g):
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fast.defvjp(fwd, bwd)
    return fast


_m32_fast = _make_matern_fast("matern32", matern32_gram_ref)
_m52_fast = _make_matern_fast("matern52", matern52_gram_ref)


# -- public dispatchers ------------------------------------------------------

def se_gram(X1s, X2s, sf2):
    """(n, m) SE covariance from pre-scaled inputs."""
    if use_pallas(X1s, X2s):
        return _se_fast(X1s, X2s, sf2)
    return se_gram_ref(X1s, X2s, sf2)


def matern32_gram(X1, X2, sf2, inv_l):
    if use_pallas(X1, X2):
        return _m32_fast(X1, X2, sf2, inv_l)
    return matern32_gram_ref(X1, X2, sf2, inv_l)


def matern52_gram(X1, X2, sf2, inv_l):
    if use_pallas(X1, X2):
        return _m52_fast(X1, X2, sf2, inv_l)
    return matern52_gram_ref(X1, X2, sf2, inv_l)
