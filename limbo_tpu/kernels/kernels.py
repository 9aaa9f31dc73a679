"""The kernel library: Exp, SquaredExpARD, Matern 3/2, Matern 5/2.

Formula parity with limbo (see each class docstring for the reference file);
implementation is matmul-first: every gram matrix is one MXU matmul (the
pairwise-distance expansion) plus fused VPU elementwise math.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.kernels.base import KernelMixin
from limbo_tpu.ops.gram import matern32_gram, matern52_gram, se_gram
from limbo_tpu.utils.maths import safe_sqrt, sq_dist

_DEFAULT_LOG_NOISE = math.log(math.sqrt(0.01))  # limbo defaults::kernel::noise=0.01


def _as_f(x, dtype):
    return jnp.asarray(x, dtype=dtype)


@struct.dataclass
class Exp(KernelMixin):
    """Exponential (squared-exponential, isotropic) kernel.

    k(v1, v2) = sf2 * exp(-|v1-v2|^2 / (2 l^2)).
    Reference: src/limbo/kernel/exp.hpp:74 (params [log l, log sigma], both
    log-space, sf2 = exp(2 log sigma); defaults sigma_sq=1, l=1).
    """

    log_l: jax.Array
    log_sigma: jax.Array
    log_noise: jax.Array
    optimize_noise: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, sigma_sq: float = 1.0, l: float = 1.0, noise: float = 0.01,
               optimize_noise: bool = False, dtype=jnp.float32) -> "Exp":
        return cls(
            log_l=_as_f(math.log(l), dtype),
            log_sigma=_as_f(0.5 * math.log(sigma_sq), dtype),
            log_noise=_as_f(0.5 * math.log(noise), dtype),
            optimize_noise=optimize_noise,
        )

    def _core_params(self) -> jax.Array:
        return jnp.stack([self.log_l, self.log_sigma])

    def _with_core_params(self, p: jax.Array) -> "Exp":
        return self.replace(log_l=p[0], log_sigma=p[1])

    def gram_core(self, X1: jax.Array, X2: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        inv_l = jnp.exp(-self.log_l)
        return se_gram(X1 * inv_l, X2 * inv_l, sf2)

    def k_diag(self, X: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    def _fused_train_args(self, X: jax.Array):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        ones = jnp.ones((), dtype=X.dtype)
        return "se", X * jnp.exp(-self.log_l), sf2, ones


@struct.dataclass
class SquaredExpARD(KernelMixin):
    """Squared exponential with automatic relevance determination.

    k(v1, v2) = sf2 * exp(-0.5 (v1-v2)^T M (v1-v2)),
    M = A A^T + diag(ell^-2) with optional low-rank A (d x rank).
    Reference: src/limbo/kernel/squared_exp_ard.hpp:82; parameter vector is
    [log ell (d), A column-major (d*rank), log sigma].

    TPU note: the quadratic form splits as |Delta/ell|^2 + |A^T Delta|^2, so
    the gram is two matmul-based sq_dist calls (both MXU-friendly).
    """

    log_ell: jax.Array          # (d,)
    A: jax.Array                # (d, rank); rank may be 0
    log_sigma: jax.Array
    log_noise: jax.Array
    optimize_noise: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, dim: int, rank: int = 0, sigma_sq: float = 1.0,
               noise: float = 0.01, optimize_noise: bool = False,
               dtype=jnp.float32) -> "SquaredExpARD":
        return cls(
            log_ell=jnp.zeros((dim,), dtype=dtype),
            A=jnp.zeros((dim, rank), dtype=dtype),
            log_sigma=_as_f(0.5 * math.log(sigma_sq), dtype),
            log_noise=_as_f(0.5 * math.log(noise), dtype),
            optimize_noise=optimize_noise,
        )

    def _core_params(self) -> jax.Array:
        # limbo order: ell, then A by columns (p((j+1)*d + i) = A[i, j]), sigma
        return jnp.concatenate(
            [self.log_ell, jnp.ravel(self.A.T), jnp.reshape(self.log_sigma, (1,))])

    def _with_core_params(self, p: jax.Array) -> "SquaredExpARD":
        d = self.log_ell.shape[0]
        rank = self.A.shape[1]
        log_ell = p[:d]
        A = jnp.reshape(p[d:d + d * rank], (rank, d)).T
        log_sigma = p[d + d * rank]
        return self.replace(log_ell=log_ell, A=A, log_sigma=log_sigma)

    def gram_core(self, X1: jax.Array, X2: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        inv_ell = jnp.exp(-self.log_ell)
        if self.A.shape[1] > 0:
            z = sq_dist(X1 * inv_ell, X2 * inv_ell)
            z = z + sq_dist(jnp.dot(X1, self.A), jnp.dot(X2, self.A))
            return sf2 * jnp.exp(-0.5 * z)
        return se_gram(X1 * inv_ell, X2 * inv_ell, sf2)

    def k_diag(self, X: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    def _fused_train_args(self, X: jax.Array):
        # |Delta/ell|^2 + |A^T Delta|^2 == one Euclidean distance over the
        # concatenated features [X/ell, X A] — so even the low-rank form
        # maps onto the fused SE kernel
        sf2 = jnp.exp(2.0 * self.log_sigma)
        Xs = X * jnp.exp(-self.log_ell)
        if self.A.shape[1] > 0:
            Xs = jnp.concatenate([Xs, jnp.dot(X, self.A)], axis=1)
        return "se", Xs, sf2, jnp.ones((), dtype=X.dtype)

    @property
    def ell(self) -> jax.Array:
        return jnp.exp(self.log_ell)


@struct.dataclass
class MaternThreeHalves(KernelMixin):
    """Matern nu=3/2 kernel: sf2 * (1 + t) * exp(-t), t = sqrt(3) d / l.

    Reference: src/limbo/kernel/matern_three_halves.hpp:82
    (params [log l, log sigma]; defaults sigma_sq=1, l=1).
    """

    log_l: jax.Array
    log_sigma: jax.Array
    log_noise: jax.Array
    optimize_noise: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, sigma_sq: float = 1.0, l: float = 1.0, noise: float = 0.01,
               optimize_noise: bool = False, dtype=jnp.float32):
        return cls(
            log_l=_as_f(math.log(l), dtype),
            log_sigma=_as_f(0.5 * math.log(sigma_sq), dtype),
            log_noise=_as_f(0.5 * math.log(noise), dtype),
            optimize_noise=optimize_noise,
        )

    def _core_params(self) -> jax.Array:
        return jnp.stack([self.log_l, self.log_sigma])

    def _with_core_params(self, p: jax.Array):
        return self.replace(log_l=p[0], log_sigma=p[1])

    def gram_core(self, X1: jax.Array, X2: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return matern32_gram(X1, X2, sf2, jnp.exp(-self.log_l))

    def k_diag(self, X: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    def _fused_train_args(self, X: jax.Array):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return "matern32", X, sf2, jnp.exp(-self.log_l)


@struct.dataclass
class MaternFiveHalves(KernelMixin):
    """Matern nu=5/2: sf2 * (1 + t + 5 d^2/(3 l^2)) * exp(-t), t = sqrt(5) d/l.

    Reference: src/limbo/kernel/matern_five_halves.hpp:84
    (params [log l, log sigma]; defaults sigma_sq=1, l=1).  This is limbo's
    default/recommended BO kernel (used by GPBasic, model/gp.hpp:637).
    """

    log_l: jax.Array
    log_sigma: jax.Array
    log_noise: jax.Array
    optimize_noise: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, sigma_sq: float = 1.0, l: float = 1.0, noise: float = 0.01,
               optimize_noise: bool = False, dtype=jnp.float32):
        return cls(
            log_l=_as_f(math.log(l), dtype),
            log_sigma=_as_f(0.5 * math.log(sigma_sq), dtype),
            log_noise=_as_f(0.5 * math.log(noise), dtype),
            optimize_noise=optimize_noise,
        )

    def _core_params(self) -> jax.Array:
        return jnp.stack([self.log_l, self.log_sigma])

    def _with_core_params(self, p: jax.Array):
        return self.replace(log_l=p[0], log_sigma=p[1])

    def gram_core(self, X1: jax.Array, X2: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return matern52_gram(X1, X2, sf2, jnp.exp(-self.log_l))

    def k_diag(self, X: jax.Array) -> jax.Array:
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return jnp.full((X.shape[0],), sf2, dtype=X.dtype)

    def _fused_train_args(self, X: jax.Array):
        sf2 = jnp.exp(2.0 * self.log_sigma)
        return "matern52", X, sf2, jnp.exp(-self.log_l)
