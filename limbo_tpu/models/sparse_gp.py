"""SparsifiedGP: subset-of-data GP with density-based point removal.

Reference: src/limbo/model/sparsified_gp.hpp:72 — when the dataset exceeds
`max_points` (default 200), iteratively remove the *densest* point, where
density(i) = sum of the D nearest-neighbour distances of point i (D = input
dim; _get_most_dense_point, sparsified_gp.hpp:126), then fit the normal GP on
the survivors.

TPU-first: one pairwise-distance matrix (matmul), then a `lax.while_loop`
whose body is [masked top-k -> argmin -> mask update] — limbo's TBB loop +
mutex min-reduction (sparsified_gp.hpp:128-150) becomes a batched reduction.
Survivors are compacted to the front of the padded buffers with one stable
argsort so the padded-prefix invariant of the GP holds.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.models import gp as gp_mod
from limbo_tpu.utils.maths import safe_sqrt, sq_dist

DEFAULT_MAX_POINTS = 200  # limbo defaults::model_sparse_gp::max_points


def sparsify(X: jax.Array, Y: jax.Array, n: jax.Array, max_points: int
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return compacted (X, Y, n') with at most max_points valid rows.

    X: (N, d) padded, Y: (N, p) padded, n: valid count.  jit-safe.
    """
    N, d = X.shape
    dist = safe_sqrt(sq_dist(X, X))
    big = jnp.asarray(jnp.finfo(X.dtype).max, X.dtype)
    eye = jnp.eye(N, dtype=bool)
    mask0 = jnp.arange(N) < n

    def cond(carry):
        mask, cnt = carry
        return cnt > max_points

    def body(carry):
        mask, cnt = carry
        valid2 = mask[:, None] & mask[None, :] & (~eye)
        dm = jnp.where(valid2, dist, big)
        # density(i) = sum of the d smallest distances from i
        smallest = -jax.lax.top_k(-dm, d)[0]          # (N, d)
        density = jnp.sum(smallest, axis=1)
        density = jnp.where(mask, density, big)
        k = jnp.argmin(density)
        return mask.at[k].set(False), cnt - 1

    mask, n_new = jax.lax.while_loop(cond, body, (mask0, n))
    # stable compaction: kept points first, original order preserved
    order = jnp.argsort(jnp.logical_not(mask), stable=True)
    keep = mask[order].astype(X.dtype)
    Xc = X[order] * keep[:, None]
    Yc = Y[order] * keep[:, None]
    return Xc, Yc, n_new.astype(jnp.int32)


@struct.dataclass
class SparsifiedGP:
    """GP + sparsification budget (mirrors limbo's SparsifiedGP subclass)."""

    gp: gp_mod.GP
    max_points: int = struct.field(pytree_node=False,
                                   default=DEFAULT_MAX_POINTS)

    @property
    def n(self):
        return self.gp.n

    @property
    def x(self):
        return self.gp.x

    @property
    def y(self):
        return self.gp.y

    @property
    def mask(self):
        return self.gp.mask

    @property
    def dim_in(self):
        return self.gp.dim_in

    @property
    def dim_out(self):
        return self.gp.dim_out

    def query(self, Xq):
        return gp_mod.query(self.gp, Xq)


def fit(kernel, mean, X: jax.Array, Y: jax.Array,
        max_points: int = DEFAULT_MAX_POINTS,
        capacity: Optional[int] = None) -> SparsifiedGP:
    """Sparsify (if needed) then fit (sparsified_gp.hpp compute():84-100)."""
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    n, d = X.shape
    N = capacity if capacity is not None else gp_mod._round_capacity(n)
    xpad = jnp.zeros((N, d), dtype=X.dtype).at[:n].set(X)
    ypad = jnp.zeros((N, Y.shape[1]), dtype=X.dtype).at[:n].set(Y)
    Xc, Yc, n_new = sparsify(xpad, ypad, jnp.asarray(n, jnp.int32), max_points)
    g = gp_mod.GP(kernel=kernel, mean=mean, x=Xc, y=Yc, n=n_new,
                  L=jnp.eye(N, dtype=X.dtype),
                  alpha=jnp.zeros((N, Y.shape[1]), dtype=X.dtype))
    return SparsifiedGP(gp=gp_mod.recompute(g), max_points=max_points)


def add_sample(sgp: SparsifiedGP, x_new: jax.Array,
               y_new: jax.Array) -> SparsifiedGP:
    """Rank-1 add; on budget overflow re-sparsify + recompute
    (sparsified_gp.hpp add_sample:104-121).  jit-safe via lax.cond."""
    g = gp_mod.add_sample(sgp.gp, x_new, y_new)

    def resparsify(g):
        Xc, Yc, n_new = sparsify(g.x, g.y, g.n, sgp.max_points)
        return gp_mod.recompute(g.replace(x=Xc, y=Yc, n=n_new))

    g = jax.lax.cond(g.n > sgp.max_points, resparsify, lambda g: g, g)
    return sgp.replace(gp=g)
