"""Row-sharded blocked Cholesky + exact GP fit/query over a device mesh.

This is the distributed *factorization* path — the piece of the scaling axis
the CG solver (parallel/distributed_gp.py) cannot cover: an exact lower
Cholesky factor of the n x n training covariance with the rows sharded over
the mesh, giving exact log-determinants (hence the exact log-marginal
likelihood) and exact posterior variances at n far past one chip's HBM.
The reference's counterpart is the single-host Eigen LLT inside GP::compute
(/root/reference/src/limbo/model/gp.hpp:550-605); limbo has no distributed
story at all (SURVEY.md section 2.4) — this component is new, designed for
the ICI-connected mesh.

Algorithm: left-looking blocked Cholesky on a block-ROW sharding.

    for each block column k (width B):
        Lrow_k = rows [kB, kB+B) of L, columns [:kB)      (owner -> psum)
        panel  = A[:, kB:kB+B] - L[:, :kB] @ Lrow_k^T     (local GEMM, all
                                                           devices, own rows)
        D      = rows [kB, kB+B) of panel                 (owner -> psum)
        L11, L11inv = factor(D)                           (replicated, B x B)
        L[:, kB:kB+B] = rowmask(panel @ L11inv^T)         (local GEMM)

Every O(n^3) flop is a local GEMM over the device's own row block; the only
communication per step is a psum of a (B, kB) strip and a (B, B) block —
total O(n^2/2) words over the run, half of a right-looking all-gather
scheme.  Static shapes per step (the outer loop is Python-unrolled), so the
whole factorization jits to one XLA program with nb = n/B straight-line
steps.  Load is balanced by computing all local rows at every step and
masking rows above the current block column — 3/2x the ideal flop count,
the standard price for contiguous-row sharding without block-cyclic
redistribution (and every wasted flop is still MXU work, not stalls).

Triangular solves against the sharded factor ride the same two primitives:

* forward (L w = c): right-looking substitution — after w_k is known, each
  device updates its own rows of the residual with one (rows_loc, B) x
  (B, q) GEMM; comm is one (B, q) psum per step.
* backward (L^T a = v): left-looking — s_k = psum over devices of
  (local tail rows of block column k)^T @ (local rows of a): the transpose
  product is distributed because L^T's columns are L's rows, which is
  exactly the sharded axis.

The B x B diagonal blocks use the Pallas panel kernel from ops/chol.py on
TPU (w-wide micro-pivots, factor+invert in VMEM) and stock XLA elsewhere.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from limbo_tpu.means.means import prepare_mean
from limbo_tpu.ops.chol import PIVOT_W, panel_factor

DEFAULT_BLOCK = 256


def _resolve_use_pallas(use_pallas: Optional[bool], block: int) -> bool:
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return use_pallas and block % PIVOT_W == 0


def _geometry(mesh: Mesh, axis: Optional[str], N: int, block: int):
    axis = axis if axis is not None else mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if N % (n_dev * block) != 0:
        raise ValueError(
            f"N={N} must be a multiple of n_devices*block = {n_dev * block} "
            f"(pad the capacity; identity-padded blocks factor exactly)")
    return axis, n_dev, N // n_dev


def _owner_extract(M_loc: jax.Array, row0, rows_loc: int, j0: int,
                   width: int, ncols: int, axis: str) -> jax.Array:
    """Rows [j0, j0+width) of the global row-sharded matrix, via psum.

    Each global row lives on exactly one device; the owner contributes its
    slice, everyone else zeros.  j0/width/ncols are Python ints (static
    shapes); row0 is the traced global offset of this device's rows.
    """
    idx = jnp.clip(j0 - row0, 0, rows_loc - width)
    cand = jax.lax.dynamic_slice(M_loc, (idx, jnp.zeros_like(idx)),
                                 (width, ncols))
    own = (row0 <= j0) & (j0 + width <= row0 + rows_loc)
    return jax.lax.psum(jnp.where(own, cand, jnp.zeros_like(cand)), axis)


class ShardedGP(struct.PyTreeNode):
    """Exact GP state with the Cholesky factor row-sharded over the mesh.

    L is a global (N, N) array laid out P(axis, None); everything else is
    replicated (alpha/mean values are O(N p), negligible next to L).
    """
    kernel: object
    mean: object = struct.field(pytree_node=True)
    x: jax.Array            # (N, d) replicated
    y: jax.Array            # (N, p) replicated
    n: jax.Array            # () int32 — true sample count
    L: jax.Array            # (N, N) row-sharded lower Cholesky factor
    L11invs: jax.Array      # (nb, B, B) replicated diagonal-block inverses
    alpha: jax.Array        # (N, p) replicated, K^{-1}(y - m)
    logdet: jax.Array       # () — log det K
    lml: jax.Array          # () — exact log marginal likelihood
    block: int = struct.field(pytree_node=False, default=DEFAULT_BLOCK)
    axis: str = struct.field(pytree_node=False, default="rows")

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


def _factor_loop(A_loc, c, row0, rows_loc: int, N: int, block: int,
                 axis: str, use_pallas: bool):
    """Factor the row-sharded A and solve K a = c.  Returns
    (L_loc, L11invs, a, logdet)."""
    nb = N // block
    dtype = A_loc.dtype
    p = c.shape[1]
    grow = row0 + jnp.arange(rows_loc)                    # global row ids
    L_loc = jnp.zeros((rows_loc, N), dtype)
    L11invs = []
    # forward solve, right-looking: r_loc holds this device's rows of the
    # running residual c - L[:, done] @ w[done]
    r_loc = jax.lax.dynamic_slice(c, (row0, jnp.zeros_like(row0)),
                                  (rows_loc, p))
    w = jnp.zeros((N, p), dtype)
    for k in range(nb):
        j0 = k * block
        j1 = j0 + block
        if k > 0:
            Lrow_k = _owner_extract(L_loc[:, :j0], row0, rows_loc, j0,
                                    block, j0, axis)      # (B, kB)
            panel = A_loc[:, j0:j1] - jnp.dot(
                L_loc[:, :j0], Lrow_k.T, preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
        else:
            panel = A_loc[:, :block]
        D = _owner_extract(panel, row0, rows_loc, j0, block, block, axis)
        L11, L11inv = panel_factor(D, use_pallas=use_pallas)
        Lcol = jnp.dot(panel, L11inv.T, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        Lcol = jnp.where(grow[:, None] >= j0, Lcol, jnp.zeros_like(Lcol))
        L_loc = jax.lax.dynamic_update_slice(L_loc, Lcol, (0, j0))
        L11invs.append(L11inv)
        # forward substitution step: w_k from the owner's residual rows
        rk = _owner_extract(r_loc, row0, rows_loc, j0, block, p, axis)
        wk = jnp.dot(L11inv, rk, preferred_element_type=dtype)
        w = jax.lax.dynamic_update_slice(w, wk, (j0, 0))
        # push the update into this device's remaining rows (rows < j1 are
        # never read again, no mask needed)
        r_loc = r_loc - jnp.dot(Lcol, wk, preferred_element_type=dtype)
    # backward solve, left-looking over block rows of L^T (= block columns
    # of L, whose tails are row-sharded — the distributed product)
    a = jnp.zeros((N, p), dtype)
    for k in reversed(range(nb)):
        j0 = k * block
        j1 = j0 + block
        Lcol_tail = jnp.where(grow[:, None] >= j1, L_loc[:, j0:j1],
                              jnp.zeros((rows_loc, block), dtype))
        a_loc = jax.lax.dynamic_slice(a, (row0, jnp.zeros_like(row0)),
                                      (rows_loc, p))
        s = jax.lax.psum(jnp.dot(Lcol_tail.T, a_loc,
                                 preferred_element_type=dtype), axis)
        ak = jnp.dot(L11invs[k].T, w[j0:j1] - s,
                     preferred_element_type=dtype)
        a = jax.lax.dynamic_update_slice(a, ak, (j0, 0))
    diag = jnp.take_along_axis(L_loc, grow[:, None], axis=1)[:, 0]
    logdet = 2.0 * jax.lax.psum(jnp.sum(jnp.log(diag)), axis)
    return L_loc, jnp.stack(L11invs), a, logdet


def sharded_cholesky(mesh: Mesh, A: jax.Array, block: int = DEFAULT_BLOCK,
                     axis: Optional[str] = None,
                     use_pallas: Optional[bool] = None) -> jax.Array:
    """Lower Cholesky factor of PD A, computed with rows sharded over the
    mesh.  Returns the global (N, N) factor laid out P(axis, None)."""
    N = A.shape[0]
    axis, n_dev, rows_loc = _geometry(mesh, axis, N, block)
    use_pallas = _resolve_use_pallas(use_pallas, block)

    def body(A_loc):
        row0 = jax.lax.axis_index(axis) * rows_loc
        L_loc, _, _, _ = _factor_loop(
            A_loc, jnp.zeros((N, 1), A_loc.dtype), row0, rows_loc, N,
            block, axis, use_pallas)
        return L_loc

    shard = jax.shard_map(body, mesh=mesh, check_vma=False,
                          in_specs=(P(axis, None),), out_specs=P(axis, None))
    return shard(A)


def sharded_fit(mesh: Mesh, kernel, mean, X: jax.Array, Y: jax.Array,
                n: Optional[jax.Array] = None, block: int = DEFAULT_BLOCK,
                axis: Optional[str] = None,
                use_pallas: Optional[bool] = None) -> ShardedGP:
    """Exact GP fit with the covariance factorized across the mesh.

    X: (N, d), Y: (N, p) — padded to a multiple of n_devices*block; `n` is
    the true sample count (defaults to N).  The gram rows are built
    per-device (never materializing K unsharded), identity-padded like
    utils.maths.masked_identity_gram, factorized by the sharded blocked
    Cholesky, and solved for alpha; the exact LML comes out of the same
    program.  Functional parity: GP::compute + compute_log_lik
    (/root/reference/src/limbo/model/gp.hpp:88,267) at mesh scale.
    """
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    N = X.shape[0]
    p = Y.shape[1]
    axis, n_dev, rows_loc = _geometry(mesh, axis, N, block)
    use_pallas = _resolve_use_pallas(use_pallas, block)
    n = jnp.asarray(N if n is None else n, jnp.int32)
    dtype = X.dtype

    mask = (jnp.arange(N) < n).astype(dtype)
    mean = prepare_mean(mean, Y, mask)
    centered = (Y.astype(dtype) - mean(X)) * mask[:, None]

    def body(Xf, maskf, c):
        row0 = jax.lax.axis_index(axis) * rows_loc
        x_loc = jax.lax.dynamic_slice(
            Xf, (row0, jnp.zeros_like(row0)), (rows_loc, Xf.shape[1]))
        m_loc = jax.lax.dynamic_slice(maskf, (row0,), (rows_loc,))
        grow = row0 + jnp.arange(rows_loc)
        # local gram rows with identity padding on masked rows/cols
        G = kernel.gram(x_loc, Xf) * (m_loc[:, None] * maskf[None, :])
        diag_val = m_loc * kernel.train_diag_add(x_loc) + (1.0 - m_loc)
        G = G + jnp.where(jnp.arange(N)[None, :] == grow[:, None],
                          diag_val[:, None], jnp.zeros((), dtype))
        L_loc, L11invs, alpha, logdet = _factor_loop(
            G, c, row0, rows_loc, N, block, axis, use_pallas)
        return L_loc, L11invs, alpha, logdet

    shard = jax.shard_map(
        body, mesh=mesh, check_vma=False, in_specs=(P(), P(), P()),
        out_specs=(P(axis, None), P(), P(), P()))
    L, L11invs, alpha, logdet = jax.jit(shard)(X, mask, centered)
    nf = n.astype(dtype)
    lml = (-0.5 * jnp.sum(centered * alpha) - 0.5 * logdet
           - 0.5 * nf * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype)))
    return ShardedGP(kernel=kernel, mean=mean, x=X, y=Y.astype(dtype), n=n,
                     L=L,
                     L11invs=L11invs, alpha=alpha, logdet=logdet, lml=lml,
                     block=block, axis=axis)


def sharded_query(mesh: Mesh, sgp: ShardedGP,
                  Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact posterior (mu, sigma^2) for a candidate batch against the
    sharded factor.

    mu rides the row-sharded cross-covariance psum; sigma^2 = k_diag -
    ||L^{-1} k_q||^2 via the distributed right-looking forward solve (each
    step one local (rows_loc, B) x (B, q) GEMM + a (B, q) psum).  Parity:
    GP::query (/root/reference/src/limbo/model/gp.hpp:159-167,613-626).
    """
    N = sgp.capacity
    block = sgp.block
    axis = sgp.axis
    _, n_dev, rows_loc = _geometry(mesh, axis, N, block)
    nb = N // block
    dtype = sgp.x.dtype
    q = Xq.shape[0]
    kernel = sgp.kernel
    mask = sgp.mask
    mean_q = sgp.mean(Xq)

    def body(L_loc, L11invs, Xf, maskf, alpha, Xq_):
        row0 = jax.lax.axis_index(axis) * rows_loc
        x_loc = jax.lax.dynamic_slice(
            Xf, (row0, jnp.zeros_like(row0)), (rows_loc, Xf.shape[1]))
        m_loc = jax.lax.dynamic_slice(maskf, (row0,), (rows_loc,))
        a_loc = jax.lax.dynamic_slice(
            alpha, (row0, jnp.zeros_like(row0)), (rows_loc, alpha.shape[1]))
        Kq_loc = kernel.gram(x_loc, Xq_) * m_loc[:, None]  # (rows_loc, q)
        mu = jax.lax.psum(jnp.dot(Kq_loc.T, a_loc,
                                  preferred_element_type=dtype), axis)
        # forward solve L w = k_q, right-looking on the sharded rows;
        # accumulate sum_k w_k^2 directly — w never materializes.
        r_loc = Kq_loc
        ssq = jnp.zeros((q,), dtype)
        for k in range(nb):
            j0 = k * block
            rk = _owner_extract(r_loc, row0, rows_loc, j0, block, q, axis)
            wk = jnp.dot(L11invs[k], rk, preferred_element_type=dtype)
            ssq = ssq + jnp.sum(wk * wk, axis=0)
            r_loc = r_loc - jnp.dot(L_loc[:, j0:j0 + block], wk,
                                    preferred_element_type=dtype)
        return mu, ssq

    shard = jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(), P(), P(), P(), P()),
        out_specs=(P(), P()))
    mu, ssq = jax.jit(shard)(sgp.L, sgp.L11invs, sgp.x, mask,
                             sgp.alpha, Xq)
    kd = kernel.k_diag(Xq)
    sigma_sq = jnp.maximum(kd - ssq, jnp.zeros((), dtype))
    return mu + mean_q, sigma_sq
