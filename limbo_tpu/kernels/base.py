"""Covariance-function base machinery.

Design (TPU-first): a kernel is a pytree dataclass whose *fields are the
hyperparameters* (log-space arrays), so `jax.grad` over a loss of the kernel
gives hyperparameter gradients directly — this replaces limbo's hand-derived
`gradient()` methods (src/limbo/kernel/kernel.hpp:74, exp.hpp:96, ...), which
we keep only as test oracles.

The fundamental operation is `gram(X1, X2)`, a full cross-covariance matrix
built from one matmul-based pairwise-distance computation plus fused
elementwise math, rather than limbo's per-entry `operator()(v1, v2)` fill
(src/limbo/model/gp.hpp:550-571).  The per-pair form is derived from gram on
singleton batches.

Noise handling mirrors limbo's BaseKernel (kernel/kernel.hpp:74-125): the
kernel owns a log-noise parameter (log of the noise *standard deviation*),
`noise + 1e-8` jitter is added on the diagonal of training covariance
matrices, and the noise parameter is appended last to the flat hyperparameter
vector iff `optimize_noise` is set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

JITTER = 1e-8


def effective_jitter(dtype) -> float:
    """Dtype-aware diagonal jitter: limbo's 1e-8 in f64; ~32*eps in f32
    (1e-8 is below f32 resolution next to unit diagonals)."""
    import jax.numpy as _jnp

    return max(JITTER, 32 * float(_jnp.finfo(dtype).eps))


class KernelMixin:
    """Shared behaviour for all kernels (not a dataclass itself).

    Subclasses (flax.struct dataclasses) must provide:
      - field ``log_noise``: scalar array, log of noise std (so noise variance
        = exp(2*log_noise)); limbo default noise=0.01 -> log_noise=log(0.1).
      - static field ``optimize_noise``: bool.
      - ``_core_params()`` -> flat log-space parameter vector (limbo order).
      - ``_with_core_params(p)`` -> new kernel with those parameters.
      - ``gram_core(X1, X2)`` -> (n, m) noiseless cross-covariance.
      - ``k_diag(X)`` -> (n,) noiseless prior variances k(x, x).
    """

    # -- noise ---------------------------------------------------------------

    @property
    def noise(self) -> jax.Array:
        """Noise variance (limbo BaseKernel::noise, kernel.hpp:127)."""
        return jnp.exp(2.0 * self.log_noise)

    # -- hyperparameter vector (limbo h_params protocol) ---------------------

    @property
    def params(self) -> jax.Array:
        """Flat log-space hyperparameters; noise appended iff optimized."""
        core = self._core_params()
        if self.optimize_noise:
            return jnp.concatenate([core, jnp.ravel(self.log_noise)])
        return core

    @property
    def params_size(self) -> int:
        n = int(self._core_params().shape[0])
        return n + (1 if self.optimize_noise else 0)

    def with_params(self, p: jax.Array):
        """Rebuild the kernel from a flat log-space parameter vector."""
        if self.optimize_noise:
            core, ln = p[:-1], p[-1]
            return self._with_core_params(core).replace(log_noise=ln)
        return self._with_core_params(p)

    # -- evaluation ----------------------------------------------------------

    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        """Scalar covariance k(x1, x2) for two (d,) points (no noise)."""
        return self.gram_core(x1[None, :], x2[None, :])[0, 0]

    def gram(self, X1: jax.Array, X2: jax.Array) -> jax.Array:
        """(n, m) cross-covariance, no noise (query path)."""
        return self.gram_core(X1, X2)

    def gram_train(self, X: jax.Array) -> jax.Array:
        """(n, n) training covariance: gram + (noise + jitter) * I.

        Matches limbo operator()(v1, v2, i, j) adding noise + 1e-8 when i==j
        (kernel/kernel.hpp:81-84).  The jitter is dtype-aware: limbo's 1e-8
        is below float32's resolution next to unit diagonals (eps ~ 1.2e-7),
        so in f32 the floor rises to ~32*eps — without it, dense f32 kernel
        matrices at n >= a few hundred go numerically indefinite.
        """
        K = self.gram_core(X, X)
        n = X.shape[0]
        return K + self.train_diag_add(X) * jnp.eye(n, dtype=K.dtype)

    def gram_train_masked(self, X: jax.Array, n, extra_jitter=None
                          ) -> jax.Array:
        """Chol-ready padded training covariance in ONE fused pass.

        Equivalent to ``masked_identity_gram(gram_train(X) [+ extra*I],
        arange(N) < n)`` — the matrix build of every recompute and every
        LML/LOO hp-opt ascent step — but on TPU the covariance, the diagonal
        noise+jitter add, and the masked-identity padding are fused into a
        single Pallas tile write (ops/gram.gram_train_masked) instead of
        three full passes over the (N, N) buffer.  Falls back to the
        composed reference off-TPU or for kernels without a fused form.
        """
        args = self._fused_train_args(X)
        if args is not None:
            from limbo_tpu.ops.gram import gram_train_masked as _fused

            form, Xs, sf2, inv_l = args
            # scalar train_diag_add: every fused kernel has constant prior
            # variance k_diag == sf2 (see train_diag_add)
            diag_add = self.noise + effective_jitter(X.dtype) * jnp.maximum(
                sf2, jnp.ones((), dtype=X.dtype))
            if extra_jitter is not None:
                diag_add = diag_add + jnp.asarray(extra_jitter, X.dtype)
            return _fused(form, Xs, sf2, inv_l, diag_add, n)
        from limbo_tpu.utils.maths import masked_identity_gram

        K = self.gram_train(X)
        if extra_jitter is not None:
            K = K + jnp.asarray(extra_jitter, K.dtype) * jnp.eye(
                X.shape[0], dtype=K.dtype)
        mask = (jnp.arange(X.shape[0]) < n).astype(X.dtype)
        return masked_identity_gram(K, mask)

    def _fused_train_args(self, X: jax.Array):
        """(form, scaled_inputs, sf2, inv_l) for the fused train-gram path,
        or None when this kernel has no single-distance form."""
        return None

    def train_diag_add(self, X: jax.Array) -> jax.Array:
        """(n,) additive training-diagonal term: noise + scale-aware jitter.

        The jitter scales with the kernel's own prior variance (k_diag) when
        that exceeds 1: conditioning of K is relative to lambda_max ~ n *
        k_diag, so an *absolute* floor tuned for unit-variance kernels is
        orders of magnitude too small once hyperparameter learning drives
        sigma^2 to match an objective with a large output range (observed:
        SE-ARD on SixHumpCamel learns sigma^2 ~ 54, and the f32 Cholesky of
        the refit NaNs at the absolute floor, freezing the whole BO loop).
        At k_diag <= 1 this reduces exactly to the absolute floor.
        """
        kd = self.k_diag(X)
        return self.noise + effective_jitter(kd.dtype) * jnp.maximum(
            kd, jnp.ones((), dtype=kd.dtype))
