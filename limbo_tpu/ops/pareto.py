"""Pareto utilities: non-dominated filtering and hypervolume.

Reference: src/limbo/experimental/tools/pareto.hpp (dominate_flag:60,
pareto_set:198 — TBB-parallel sort-based filtering) and the vendored Zitzler
hypervolume code src/hv/hypervol.c (FilterNondominatedSet,
CalculateHypervolume).

TPU-first: dominance is one (n, n) comparison tensor (VPU-friendly), masked
for padded rows; the 2-D hypervolume is a sort + segmented sum.  Higher-D
hypervolume uses the native C++ sweep (limbo_tpu.native) on host — it is a
stat/logging quantity, not a hot device op.

Convention: MAXIMIZATION (limbo's BO convention; pareto.hpp compares with >=).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dominance_matrix(Y: jax.Array, mask: Optional[jax.Array] = None
                     ) -> jax.Array:
    """D[i, j] = 1 iff point j dominates point i (all >=, any >).

    Y: (n, p) objective values (maximize).  mask: (n,) validity.
    """
    ge = jnp.all(Y[None, :, :] >= Y[:, None, :], axis=-1)      # j >= i
    gt = jnp.any(Y[None, :, :] > Y[:, None, :], axis=-1)
    dom = ge & gt
    if mask is not None:
        dom = dom & (mask[None, :] > 0)
    return dom


def non_dominated_mask(Y: jax.Array, mask: Optional[jax.Array] = None
                       ) -> jax.Array:
    """(n,) boolean: point is on the Pareto front (limbo pareto_set)."""
    dom = dominance_matrix(Y, mask)
    nd = jnp.logical_not(jnp.any(dom, axis=1))
    if mask is not None:
        nd = nd & (mask > 0)
    return nd


def pareto_set(X: jax.Array, Y: jax.Array,
               mask: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compacted Pareto set: (X', Y', front_mask) with front points first
    (stable order).  Static shapes — survivors are argsort-compacted like
    sparse_gp.sparsify."""
    nd = non_dominated_mask(Y, mask)
    order = jnp.argsort(jnp.logical_not(nd), stable=True)
    keep = nd[order]
    return X[order], Y[order], keep


def hypervolume_2d(Y: jax.Array, ref: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """Exact 2-D hypervolume (maximization) dominated by Y above `ref`.

    Sort by objective 0 descending; sweep accumulating
    (y0 - prev_reach) * (y1 - ref1) for ascending staircase — one jnp.sort +
    cumulative max, jit-safe with masking.
    """
    n = Y.shape[0]
    valid = (mask > 0) if mask is not None else jnp.ones(n, dtype=bool)
    # clip at ref: points below ref contribute nothing
    y0 = jnp.where(valid, Y[:, 0], ref[0])
    y1 = jnp.where(valid, Y[:, 1], ref[1])
    y0 = jnp.maximum(y0, ref[0])
    y1 = jnp.maximum(y1, ref[1])
    order = jnp.argsort(-y0)                      # descending in obj0
    y0s, y1s = y0[order], y1[order]
    # running max of y1 over better-y0 prefix = staircase height before i
    prev_h = jnp.concatenate([ref[1][None], jax.lax.cummax(y1s)[:-1]])
    width = y0s - ref[0]
    height = jnp.maximum(y1s - prev_h, 0.0)
    return jnp.sum(width * height)


def hypervolume(Y, ref, mask=None):
    """Hypervolume for p objectives: exact 2-D on device; host native C++
    sweep otherwise (see limbo_tpu.native.hv)."""
    Y = jnp.atleast_2d(Y)
    if Y.shape[1] == 2:
        return hypervolume_2d(Y, jnp.asarray(ref, dtype=Y.dtype), mask)
    from limbo_tpu.native import hv_host

    import numpy as np
    Yn = np.asarray(Y)
    if mask is not None:
        Yn = Yn[np.asarray(mask) > 0]
    return hv_host(Yn, np.asarray(ref))
