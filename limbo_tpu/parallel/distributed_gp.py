"""Distributed large-n GP: row-sharded CG over a device mesh.

This is the multi-chip exact-GP path (≙ nothing in the reference — limbo is
single-host): the kernel matvec at the heart of the iterative GP
(models/iterative.py) shards its row-block axis over the mesh; each device
computes gram blocks against its shard of the training rows and a psum
combines partial products — the canonical tensor-parallel matmul, riding ICI.

At n = 50k f32, K would be 10 GB — over a single v5e's practical budget once
workspaces are counted; sharded, each of 8 chips streams 1/8 of the rows and
never materializes more than (block x n) floats.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from limbo_tpu.kernels.base import JITTER
from limbo_tpu.models.iterative import cg_solve


def sharded_kernel_matvec(mesh: Mesh, kernel, X: jax.Array, mask: jax.Array,
                          noise_var, V: jax.Array,
                          axis: Optional[str] = None) -> jax.Array:
    """(K + (noise + jitter) I) @ V with training rows sharded over `axis`.

    X: (n, d), mask: (n,), V: (n, q); n must divide the mesh axis size.
    Output is replicated (each device holds the full product) — CG state
    stays replicated, only the O(n^2) gram work shards.
    """
    if axis is None:
        axis = mesh.axis_names[0]

    def shard_fn(x_s, m_s, Xf, maskf, Vf):
        # rows of K owned by this device: gram(x_s, Xf)
        G = kernel.gram(x_s, Xf) * maskf[None, :] * m_s[:, None]
        part = jnp.dot(G, Vf * maskf[:, None],
                       preferred_element_type=Vf.dtype)      # (n/dev, q)
        full = jax.lax.all_gather(part, axis, tiled=True)     # (n, q)
        return full

    shard = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                          in_specs=(P(axis, None), P(axis), P(), P(), P()),
                          out_specs=P())
    out = shard(X, mask, X, mask, V)
    diag = (noise_var + JITTER) * mask + (1.0 - mask)
    return out + diag[:, None] * V


def sharded_cg_fit_alpha(mesh: Mesh, kernel, X: jax.Array, mask: jax.Array,
                         centered: jax.Array, tol: float = 1e-5,
                         maxiter: int = 256) -> jax.Array:
    """alpha = K^{-1} centered with the matvec sharded over the mesh."""

    def matvec(V):
        return sharded_kernel_matvec(mesh, kernel, X, mask, kernel.noise, V)

    alpha, _ = cg_solve(matvec, centered, tol, maxiter)
    return alpha
