"""q-EI: Monte-Carlo batch expected improvement (batch BO).

No reference counterpart (limbo proposes one point per iteration); this
covers the BASELINE "batch BO: q-EI candidate batches" configuration.
TPU-first: the q-point joint posterior is one masked solve against the
training factorization; the MC estimate uses reparameterized base normals
(fixed per optimization, so qEI is smooth and differentiable in the whole
(q, d) batch), and the batch is ascended jointly with the standard scanned
optimizers.  Candidate batches and MC samples are pure batch axes — the
whole proposal is one fused device program, shardable over a mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular

from limbo_tpu.acqui.acqui import FirstElem
from limbo_tpu.models import gp as gp_mod


def joint_posterior(gp, Xb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Joint posterior of a (q, d) batch: mean (q,) [first output] and
    covariance (q, q), from the training Cholesky factor."""
    Xb = jnp.atleast_2d(Xb).astype(gp.x.dtype)
    mask = gp.mask
    ks = gp.kernel.gram(Xb, gp.x) * mask[None, :]          # (q, N)
    mu = (jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype)
          + gp.mean(Xb))[:, 0]
    V = solve_triangular(gp.L, ks.T, lower=True)           # (N, q)
    Kqq = gp.kernel.gram(Xb, Xb)
    cov = Kqq - V.T @ V
    q = Xb.shape[0]
    cov = cov + 1e-6 * jnp.eye(q, dtype=cov.dtype)         # jitter
    return mu, cov


def joint_posterior_multi(m, Xb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Joint posterior of a (q, d) batch under a MultiGP: mean (q, p) and
    per-objective covariance (p, q, q) — objectives are independent GPs
    (limbo bo_multi.hpp:153), so the joint law is p separate (q, q)
    Gaussians.  Feeds ops.ehvi.qehvi_exact_max."""
    mus, covs = jax.vmap(lambda g: joint_posterior(g, Xb))(m.gps)
    return mus.T + m.mean(jnp.atleast_2d(Xb)), covs


@struct.dataclass
class QEI:
    """Monte-Carlo q-EI with reparameterized base samples.

    qEI(X) = E[ max_i (f(x_i) - f_max)^+ ] under the joint posterior.
    """

    n_samples: int = struct.field(pytree_node=False, default=128)
    jitter: float = struct.field(pytree_node=False, default=0.0)

    def __call__(self, gp, Xb: jax.Array, base: jax.Array,
                 aggregator=FirstElem, f_max: Optional[jax.Array] = None
                 ) -> jax.Array:
        """Xb: (q, d) candidate batch; base: (n_samples, q) N(0,1) draws."""
        if f_max is None:
            from limbo_tpu.acqui.acqui import EI

            f_max = EI().best_predicted(gp, aggregator)
        mu, cov = joint_posterior(gp, Xb)
        Lq = jnp.linalg.cholesky(cov)
        draws = mu[None, :] + base @ Lq.T                  # (S, q)
        imp = jnp.maximum(jnp.max(draws, axis=1) - f_max - self.jitter, 0.0)
        return jnp.mean(imp)


def propose_batch(gp, q: int, key, qei: Optional[QEI] = None,
                  restarts: int = 16, steps: int = 30,
                  aggregator=FirstElem) -> Tuple[jax.Array, jax.Array]:
    """Maximize qEI over a (q, d) batch with multi-start gradient ascent.

    Returns (best batch (q, d), qEI value).  jit-safe; the restart axis
    shards over a mesh exactly like single-point proposals.
    """
    from limbo_tpu.acqui.acqui import EI
    from limbo_tpu.opt.gradient import Rprop

    qei = qei if qei is not None else QEI()
    d = gp.dim_in
    k_base, k_init, k_run = jax.random.split(key, 3)
    base = jax.random.normal(k_base, (qei.n_samples, q), dtype=gp.x.dtype)
    f_max = EI().best_predicted(gp, aggregator)

    def objective(flat):
        Xb = jnp.reshape(flat, (q, d))
        return qei(gp, Xb, base, aggregator, f_max=f_max)

    inits = jax.random.uniform(k_init, (restarts, q * d), dtype=gp.x.dtype)
    keys = jax.random.split(k_run, restarts)
    opt = Rprop(iterations=steps)
    res = jax.vmap(lambda x0, k: opt(objective, x0, k, True))(inits, keys)
    i = jnp.argmax(res.value)
    return jnp.reshape(res.x[i], (q, d)), res.value[i]
