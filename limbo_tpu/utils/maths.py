"""Small math helpers shared across the framework.

TPU-first notes: pairwise (squared) distances are computed with the
``|a|^2 + |b|^2 - 2 a.b`` expansion so the dominant cost is a single matmul
that lands on the MXU, instead of an O(n^2 d) broadcasted subtract that is
bandwidth-bound on the VPU.  (Reference behaviour: limbo builds kernel
matrices entry-by-entry, src/limbo/model/gp.hpp:550.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances.

    Args:
      a: (n, d) array.
      b: (m, d) array.

    Returns:
      (n, m) array of squared distances, clamped at 0 (the matmul expansion
      can go slightly negative in finite precision).
    """
    a2 = jnp.sum(a * a, axis=-1)[:, None]
    b2 = jnp.sum(b * b, axis=-1)[None, :]
    # the a.b matmul MUST run at true input precision: bf16 MXU passes
    # (TPU's DEFAULT for f32) carry ~8e-3 relative error, which swamps the
    # |a|^2+|b|^2-2ab cancellation for nearby points and makes dense kernel
    # matrices indefinite — this op stays HIGHEST even in fast-matmul mode
    ab = jnp.dot(a, b.T, preferred_element_type=a.dtype,
                 precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt with a well-defined (zero) gradient at x == 0.

    Needed for Matern kernels evaluated at coincident points: d/dx sqrt(x)
    diverges at 0, which would poison autodiff of the kernel matrix diagonal.
    """
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)


def masked_identity_gram(K: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace padded rows/cols of a gram matrix by the identity.

    The framework stores datasets in fixed-capacity padded buffers so that the
    whole BO loop stays jit-compiled with static shapes (a new XLA program per
    dataset size would defeat TPU compilation caching).  Padding the kernel
    matrix with an identity block keeps the Cholesky factorization well-posed:
    ``chol(blockdiag(K_n, I)) = blockdiag(chol(K_n), I)``, and triangular
    solves against right-hand sides that are zero in the padded region stay
    zero there.

    Args:
      K: (N, N) gram matrix (noise/jitter already added on the diagonal).
      mask: (N,) 0/1 validity mask.

    Returns:
      (N, N) matrix equal to K on valid x valid entries, identity elsewhere.
    """
    m2 = mask[:, None] * mask[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    return K * m2 + (1.0 - m2) * eye


def flatten_params(*parts: jax.Array) -> jax.Array:
    """Concatenate parameter arrays into one flat vector (limbo h_params)."""
    flats = [jnp.ravel(p) for p in parts if p.size > 0]
    if not flats:
        return jnp.zeros((0,))
    return jnp.concatenate(flats)
