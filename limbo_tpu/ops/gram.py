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

from limbo_tpu.ops.gram_pallas import gram_pallas, gram_train_pallas, use_pallas
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


# -- fused training covariance (gram + diag add + masked-identity padding) ---

def train_assemble(K: jax.Array, diag_add: jax.Array, nf: jax.Array
                   ) -> jax.Array:
    """Reference assembly: K + diag_add*I on the valid block, identity on
    the padded block (== masked_identity_gram(K + diag_add*I, mask))."""
    N = K.shape[0]
    idx = jnp.arange(N, dtype=K.dtype)
    m2 = jnp.logical_and(idx[:, None] < nf, idx[None, :] < nf)
    eye = jnp.eye(N, dtype=K.dtype)
    return jnp.where(m2, K + diag_add * eye, eye)


def se_train_ref(Xs, sf2, inv_l, diag_add, nf):      # inv_l unused (pre-scaled)
    return train_assemble(se_gram_ref(Xs, Xs, sf2), diag_add, nf)


def matern32_train_ref(X, sf2, inv_l, diag_add, nf):
    return train_assemble(matern32_gram_ref(X, X, sf2, inv_l), diag_add, nf)


def matern52_train_ref(X, sf2, inv_l, diag_add, nf):
    return train_assemble(matern52_gram_ref(X, X, sf2, inv_l), diag_add, nf)


_TRAIN_REFS = {"se": se_train_ref, "matern32": matern32_train_ref,
               "matern52": matern52_train_ref}


def _make_train_fast(form, ref):
    @jax.custom_vjp
    def fast(X, sf2, inv_l, diag_add, nf):
        return gram_train_pallas(X, sf2, inv_l, diag_add, nf, form=form)

    def fwd(X, sf2, inv_l, diag_add, nf):
        return fast(X, sf2, inv_l, diag_add, nf), (X, sf2, inv_l, diag_add, nf)

    def bwd(res, g):
        X, sf2, inv_l, diag_add, nf = res
        _, vjp = jax.vjp(lambda a, b, c, d: ref(a, b, c, d, nf),
                         X, sf2, inv_l, diag_add)
        return (*vjp(g), jnp.zeros_like(nf))

    fast.defvjp(fwd, bwd)
    return fast


_TRAIN_FAST = {form: _make_train_fast(form, ref)
               for form, ref in _TRAIN_REFS.items()}


def gram_train_masked(form: str, X: jax.Array, sf2, inv_l, diag_add, n
                      ) -> jax.Array:
    """(N, N) chol-ready padded training covariance, one fused pass on TPU.

    Replaces the unfused gram_train + masked_identity_gram pair — the hot
    matrix build of every recompute / LML-ascent step (limbo
    _compute_full_kernel, model/gp.hpp:550-571, which fills per-entry on
    CPU).  Backward recomputes through the jnp reference (same trick as the
    plain gram dispatchers above).
    """
    nf = jnp.asarray(n, X.dtype)
    sf2 = jnp.asarray(sf2, X.dtype)
    inv_l = jnp.asarray(inv_l, X.dtype)
    diag_add = jnp.asarray(diag_add, X.dtype)
    if use_pallas(X, X):
        return _TRAIN_FAST[form](X, sf2, inv_l, diag_add, nf)
    return _TRAIN_REFS[form](X, sf2, inv_l, diag_add, nf)


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
