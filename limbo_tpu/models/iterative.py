"""Iterative (matvec-based) GP for large n — the 10k-50k scaling path.

The reference scales large-n only algorithmically (SparsifiedGP subset-of
-data, SPGP pseudo-inputs); exact large-n GPs are out of its reach because
Eigen's dense LLT is O(n^3) time / O(n^2) memory on one host.  On TPU the
right large-n design is matmul-streaming: never materialize K, solve
K alpha = y with conjugate gradients where each CG step re-builds gram
blocks on the fly (GPyTorch-style blackbox matrix-matrix inference — see
PAPERS.md, Gardner et al. 2018 — expressed as lax.scan over row blocks).

* O(n * B) memory (B = block rows), O(n^2 d / chip) compute per matvec, all
  MXU matmuls;
* multi-RHS: alpha solves and per-query variance solves batch over columns;
* the row-block axis shards over a mesh with a psum (see
  limbo_tpu.parallel.sharded) — the multi-chip exact-GP story.

Predictive variance uses CG too: sigma^2(x) = k(x,x) - k_x^T K^{-1} k_x.
"""

from __future__ import annotations

import functools

import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.kernels.base import JITTER
from limbo_tpu.means.means import prepare_mean


def blocked_kernel_matvec(kernel, X: jax.Array, mask: jax.Array,
                          noise_var, V: jax.Array,
                          block: int = 2048) -> jax.Array:
    """(K_masked + (noise + jitter) I) @ V without materializing K.

    X: (n, d) padded; mask: (n,); V: (n, q).  Row blocks of the gram matrix
    are built, multiplied and discarded inside a lax.scan.
    """
    n = X.shape[0]
    nb = -(-n // block)
    npad = nb * block
    Xp = jnp.zeros((npad, X.shape[1]), X.dtype).at[:n].set(X)
    maskp = jnp.zeros((npad,), X.dtype).at[:n].set(mask)
    Vm = V * mask[:, None]

    def body(_, i):
        rows = jax.lax.dynamic_slice_in_dim(Xp, i * block, block)
        rmask = jax.lax.dynamic_slice_in_dim(maskp, i * block, block)
        G = kernel.gram(rows, X) * mask[None, :] * rmask[:, None]
        return None, jnp.dot(G, Vm, preferred_element_type=V.dtype)

    _, out = jax.lax.scan(body, None, jnp.arange(nb))
    out = jnp.reshape(out, (npad, V.shape[1]))[:n]
    # diagonal: (K_ii + noise + jitter) for valid, identity for padding
    diag = (noise_var + JITTER) * mask + (1.0 - mask)
    return out + diag[:, None] * V


def _cg_solve_impl(matvec: Callable, B: jax.Array, tol: float,
                   maxiter: int) -> Tuple[jax.Array, jax.Array]:
    X0 = jnp.zeros_like(B)
    R0 = B
    P0 = B
    rs0 = jnp.sum(R0 * R0, axis=0)
    bnorm = jnp.maximum(jnp.sqrt(jnp.sum(B * B, axis=0)), 1e-30)

    def cond(state):
        X, R, P, rs, it = state
        return (it < maxiter) & jnp.any(jnp.sqrt(rs) > tol * bnorm)

    def step(state):
        X, R, P, rs, it = state
        KP = matvec(P)
        denom = jnp.sum(P * KP, axis=0)
        alpha = rs / jnp.maximum(denom, 1e-30)
        active = (jnp.sqrt(rs) > tol * bnorm).astype(B.dtype)
        alpha = alpha * active
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * KP
        rs_new = jnp.sum(R * R, axis=0)
        beta = rs_new / jnp.maximum(rs, 1e-30)
        P = R + beta[None, :] * P
        return (X, R, P, rs_new, it + 1)

    X, R, P, rs, it = jax.lax.while_loop(
        cond, step, (X0, R0, P0, rs0, jnp.asarray(0, jnp.int32)))
    return X, jnp.sqrt(rs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3))
def cg_solve(matvec: Callable, B: jax.Array, tol: float = 1e-6,
             maxiter: int = 256) -> Tuple[jax.Array, jax.Array]:
    """Batched conjugate gradients for SPD systems, multi-RHS.

    B: (n, q).  Returns (X, residual_norms).  Fixed-iteration lax.while_loop
    with an early-exit residual test (converged columns freeze).

    Differentiable in B by the implicit function theorem: for X = A^{-1}B
    with A symmetric, the pullback is Bbar = A^{-1}Xbar — one more CG solve
    (reverse-mode cannot go through the dynamic while_loop itself, and the
    iterates are the wrong thing to differentiate anyway).  Gradients do NOT
    flow through `matvec`'s captured parameters (kernel hyperparameters) —
    hp-opt for the CG model family re-fits instead.  The residual norms are
    a convergence DIAGNOSTIC and are deliberately non-differentiable (their
    cotangent is dropped, i.e. stop_gradient semantics): don't build losses
    on them.
    """
    return _cg_solve_impl(matvec, B, tol, maxiter)


def _cg_fwd(matvec, B, tol, maxiter):
    out = _cg_solve_impl(matvec, B, tol, maxiter)
    return out, None


def _cg_bwd(matvec, tol, maxiter, _res, cts):
    Xbar, _ = cts
    Bbar, _ = _cg_solve_impl(matvec, Xbar, tol, maxiter)
    return (Bbar,)


cg_solve.defvjp(_cg_fwd, _cg_bwd)


@struct.dataclass
class IterativeGP:
    """Large-n GP state: data + CG-solved alpha (no Cholesky factor)."""

    kernel: object
    mean: object
    x: jax.Array
    y: jax.Array
    n: jax.Array
    alpha: jax.Array
    block: int = struct.field(pytree_node=False, default=2048)
    cg_tol: float = struct.field(pytree_node=False, default=1e-5)
    cg_maxiter: int = struct.field(pytree_node=False, default=256)

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dim_in(self) -> int:
        return self.x.shape[1]

    @property
    def mask(self) -> jax.Array:
        return (jnp.arange(self.capacity) < self.n).astype(self.x.dtype)


def fit(kernel, mean, X: jax.Array, Y: jax.Array,
        capacity: Optional[int] = None, block: int = 2048,
        cg_tol: float = 1e-5, cg_maxiter: int = 256) -> IterativeGP:
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    n, d = X.shape
    N = capacity if capacity is not None else -(-n // block) * block
    xp = jnp.zeros((N, d), X.dtype).at[:n].set(X)
    yp = jnp.zeros((N, Y.shape[1]), X.dtype).at[:n].set(Y)
    mask = (jnp.arange(N) < n).astype(X.dtype)
    mean = prepare_mean(mean, yp, mask)
    centered = (yp - mean(xp)) * mask[:, None]

    def matvec(V):
        return blocked_kernel_matvec(kernel, xp, mask, kernel.noise, V, block)

    alpha, _ = cg_solve(matvec, centered, cg_tol, cg_maxiter)
    return IterativeGP(kernel=kernel, mean=mean, x=xp, y=yp,
                       n=jnp.asarray(n, jnp.int32), alpha=alpha, block=block,
                       cg_tol=cg_tol, cg_maxiter=cg_maxiter)


def empty(kernel, mean, dim_in: int, dim_out: int = 1,
          capacity: int = 256, dtype=jnp.float32, block: int = 2048,
          cg_tol: float = 1e-5, cg_maxiter: int = 256) -> IterativeGP:
    """IterativeGP with no samples (BO-loop model slot)."""
    return IterativeGP(kernel=kernel, mean=mean,
                       x=jnp.zeros((capacity, dim_in), dtype=dtype),
                       y=jnp.zeros((capacity, dim_out), dtype=dtype),
                       n=jnp.asarray(0, jnp.int32),
                       alpha=jnp.zeros((capacity, dim_out), dtype=dtype),
                       block=min(block, capacity), cg_tol=cg_tol,
                       cg_maxiter=cg_maxiter)


def add_sample(gp: IterativeGP, x_new: jax.Array,
               y_new: jax.Array) -> IterativeGP:
    """Append one sample WITHOUT re-solving (alpha goes stale; call
    `refit` to re-run CG — the BO driver does this every
    model_refit_period iterations)."""
    i = gp.n
    x = gp.x.at[i].set(jnp.asarray(x_new, gp.x.dtype))
    y = gp.y.at[i].set(jnp.asarray(y_new, gp.y.dtype))
    return gp.replace(x=x, y=y, n=i + 1)


def refit(gp: IterativeGP) -> IterativeGP:
    """Re-solve alpha by CG from the current (padded) dataset — jit-safe,
    static shapes; warm-started from the stale alpha."""
    mask = gp.mask
    mean = prepare_mean(gp.mean, gp.y, mask)
    centered = (gp.y - mean(gp.x)) * mask[:, None]

    def matvec(V):
        return blocked_kernel_matvec(gp.kernel, gp.x, mask, gp.kernel.noise,
                                     V, gp.block)

    alpha, _ = cg_solve(matvec, centered, gp.cg_tol, gp.cg_maxiter)
    return gp.replace(mean=mean, alpha=alpha)


def query(gp: IterativeGP, Xq: jax.Array,
          compute_variance: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Posterior moments; the variance solve is one batched CG over the
    query columns (set compute_variance=False for the mean-only hot path)."""
    Xq = jnp.atleast_2d(Xq).astype(gp.x.dtype)
    mask = gp.mask
    ks = gp.kernel.gram(Xq, gp.x) * mask[None, :]          # (q, N)
    mu = jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype) + gp.mean(Xq)
    if not compute_variance:
        return mu, jnp.zeros((Xq.shape[0],), gp.x.dtype)

    def matvec(V):
        return blocked_kernel_matvec(gp.kernel, gp.x, mask, gp.kernel.noise,
                                     V, gp.block)

    Z, _ = cg_solve(matvec, ks.T, gp.cg_tol, gp.cg_maxiter)   # (N, q)
    var = gp.kernel.k_diag(Xq) - jnp.sum(ks.T * Z, axis=0)
    return mu, jnp.maximum(var, 0.0)
