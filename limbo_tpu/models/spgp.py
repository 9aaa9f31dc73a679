"""SPGP: Sparse Pseudo-input GP (Snelson & Ghahramani, NIPS 2005).

Reference capability: src/limbo/experimental/model/spgp.hpp:86 — m pseudo
-inputs (default 10% of the data), O(n m^2) training, joint LBFGS
optimization of {pseudo-inputs, kernel params, noise} with ~140 lines of
hand-derived gradients (spgp.hpp:440-580).

TPU-first: the FITC negative-log-marginal-likelihood is a differentiable
scalar of the flat parameter vector [xb (m*d), kernel params, log_sig];
autodiff replaces every hand gradient, and the optimizer is a scanned
Rprop/Adam (one jitted program).  All shapes padded/masked as in gp.py.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular

from limbo_tpu.kernels.base import JITTER
from limbo_tpu.means.means import prepare_mean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.gradient import Rprop

DEFAULT_RATIO = 0.1   # limbo defaults::model_spgp pseudo-input ratio
_MJITTER = 1e-6


@struct.dataclass
class SPGP:
    """Padded SPGP state.

    kernel: covariance with params (signal/lengthscales); its log_noise field
            is the FITC noise sig (limbo's `sig`, spgp.hpp:95).
    xb: (m, d) pseudo-inputs.  x, y, n as in gp.GP.
    """

    kernel: object
    mean: object
    x: jax.Array
    y: jax.Array
    n: jax.Array
    xb: jax.Array

    @property
    def m(self) -> int:
        return self.xb.shape[0]

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dim_in(self) -> int:
        return self.x.shape[1]

    @property
    def dim_out(self) -> int:
        return self.y.shape[1]

    @property
    def mask(self) -> jax.Array:
        return (jnp.arange(self.capacity) < self.n).astype(self.x.dtype)


def _fitc_terms(kernel, xb, X, Yc, mask, noise_var):
    """Shared FITC quantities.  Yc: centered observations (N, p), masked."""
    m = xb.shape[0]
    Kmm = kernel.gram(xb, xb) + _MJITTER * jnp.eye(m, dtype=X.dtype)
    Knm = kernel.gram(X, xb) * mask[:, None]                # (N, m)
    Lm = jnp.linalg.cholesky(Kmm)
    V = solve_triangular(Lm, Knm.T, lower=True)             # (m, N)
    q_diag = jnp.sum(V * V, axis=0)                         # (N,)
    lam = kernel.k_diag(X) - q_diag + noise_var             # (N,)
    lam = jnp.where(mask > 0, jnp.maximum(lam, 1e-12), 1.0)
    Vs = V / jnp.sqrt(lam)[None, :]                         # scaled
    A = jnp.eye(m, dtype=X.dtype) + Vs @ Vs.T
    La = jnp.linalg.cholesky(A)
    ys = Yc / jnp.sqrt(lam)[:, None]                        # (N, p)
    beta = solve_triangular(La, Vs @ ys, lower=True)        # (m, p)
    return Lm, La, Vs, lam, ys, beta


def neg_log_marginal_likelihood(kernel, mean, xb, X, Y, n) -> jax.Array:
    """FITC NLML, differentiable in (kernel params, xb) — the training
    objective (replaces spgp.hpp _optimize_hyperparams:409 + gradients)."""
    N = X.shape[0]
    mask = (jnp.arange(N) < n).astype(X.dtype)
    mean = prepare_mean(mean, Y, mask)
    Yc = (Y - mean(X)) * mask[:, None]
    noise_var = kernel.noise
    Lm, La, Vs, lam, ys, beta = _fitc_terms(kernel, xb, X, Yc, mask, noise_var)
    nf = n.astype(X.dtype) if hasattr(n, "astype") else jnp.asarray(n, X.dtype)
    p = Y.shape[1]
    data = 0.5 * (jnp.sum(ys * ys) - jnp.sum(beta * beta))
    logdet = (jnp.sum(jnp.log(lam) * mask)
              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(La))))
    return data + 0.5 * p * logdet + 0.5 * nf * p * math.log(2 * math.pi)


def fit(kernel, mean, X: jax.Array, Y: jax.Array,
        m: Optional[int] = None, capacity: Optional[int] = None,
        key=None) -> SPGP:
    """Initialize pseudo-inputs as a random subset of the data (limbo
    initializes xb from samples) and build the SPGP state."""
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    n, d = X.shape
    m = m if m is not None else max(2, int(math.ceil(DEFAULT_RATIO * n)))
    N = capacity if capacity is not None else gp_mod._round_capacity(n)
    key = key if key is not None else jax.random.PRNGKey(0)
    idx = jax.random.choice(key, n, (m,), replace=False)
    xb = X[idx]
    xpad = jnp.zeros((N, d), dtype=X.dtype).at[:n].set(X)
    ypad = jnp.zeros((N, Y.shape[1]), dtype=X.dtype).at[:n].set(Y)
    mask = (jnp.arange(N) < n).astype(X.dtype)
    mean = prepare_mean(mean, ypad, mask)
    return SPGP(kernel=kernel, mean=mean, x=xpad, y=ypad,
                n=jnp.asarray(n, jnp.int32), xb=xb)


def empty(kernel, mean, dim_in: int, dim_out: int = 1, m: int = 16,
          capacity: int = 256, dtype=jnp.float32, key=None) -> SPGP:
    """SPGP with no samples (BO-loop model slot; pseudo-inputs start on a
    uniform random scatter and are refined by SPGPHpOpt)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    xb = jax.random.uniform(key, (m, dim_in), dtype=dtype)
    return SPGP(kernel=kernel, mean=mean,
                x=jnp.zeros((capacity, dim_in), dtype=dtype),
                y=jnp.zeros((capacity, dim_out), dtype=dtype),
                n=jnp.asarray(0, jnp.int32), xb=xb)


def add_sample(sp: SPGP, x_new: jax.Array, y_new: jax.Array) -> SPGP:
    """Append one sample (jit/scan-safe).  FITC terms are recomputed from
    data at every query (spgp.hpp keeps no per-sample factor either — its
    add_sample triggers a full recompute), so appending is O(1): write the
    row, bump n, refresh the data mean."""
    i = sp.n
    x = sp.x.at[i].set(jnp.asarray(x_new, sp.x.dtype))
    y = sp.y.at[i].set(jnp.asarray(y_new, sp.y.dtype))
    sp2 = sp.replace(x=x, y=y, n=i + 1)
    mean = prepare_mean(sp2.mean, y, sp2.mask)
    return sp2.replace(mean=mean)


def query(sp: SPGP, Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """FITC predictive moments (spgp.hpp predict/query:193).

    mu = k_q^T Kmm^{-1} m_post ; implemented via the standard
    Lm/La factors.  Variance is latent + FITC correction, clamped >= 0.
    """
    Xq = jnp.atleast_2d(Xq).astype(sp.x.dtype)
    mask = sp.mask
    mean = sp.mean
    Yc = (sp.y - mean(sp.x)) * mask[:, None]
    noise_var = sp.kernel.noise
    Lm, La, Vs, lam, ys, beta = _fitc_terms(
        sp.kernel, sp.xb, sp.x, Yc, mask, noise_var)
    kq = sp.kernel.gram(sp.xb, Xq)                          # (m, q)
    lq = solve_triangular(Lm, kq, lower=True)               # (m, q)
    lq2 = solve_triangular(La, lq, lower=True)              # (m, q)
    mu = lq2.T @ beta + mean(Xq)                            # (q, p)
    var = (sp.kernel.k_diag(Xq)
           - jnp.sum(lq * lq, axis=0)
           + jnp.sum(lq2 * lq2, axis=0))
    return mu, jnp.maximum(var, 0.0)


@struct.dataclass
class SPGPHpOpt:
    """Joint optimization of pseudo-inputs + kernel params + noise.

    limbo uses NLOpt LD_LBFGS (spgp.hpp:85); here a scanned Rprop ascends the
    negated NLML with autodiff gradients.
    """

    optimizer: object = struct.field(
        default_factory=lambda: Rprop(iterations=200))

    def __call__(self, sp: SPGP, key=None) -> SPGP:
        key = key if key is not None else jax.random.PRNGKey(0)
        m, d = sp.xb.shape
        nk = sp.kernel.params_size

        def unpack(p):
            xb = jnp.reshape(p[:m * d], (m, d))
            kernel = sp.kernel.with_params(p[m * d:])
            return xb, kernel

        def objective(p):
            xb, kernel = unpack(p)
            return -neg_log_marginal_likelihood(
                kernel, sp.mean, xb, sp.x, sp.y, sp.n)

        init = jnp.concatenate([jnp.ravel(sp.xb), sp.kernel.params])
        res = self.optimizer(objective, init, key, bounded=False)
        xb, kernel = unpack(res.x)
        return sp.replace(xb=xb, kernel=kernel)
