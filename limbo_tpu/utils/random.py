"""RNG utilities: counter-based JAX keys replace limbo's thread-local mt19937.

Reference behaviour: src/limbo/tools/random_generator.hpp:130-158
(random_vector_bounded / random_vector / random_lhs).  JAX's threefry keys are
deterministic and splittable, so there is no thread-local state; every sampler
takes an explicit key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_vector(key: jax.Array, dim: int, bounded: bool = True,
                  dtype=jnp.float32) -> jax.Array:
    """One random vector; U[0,1]^dim when bounded, N(0,10^2) otherwise.

    Mirrors limbo tools::random_vector (random_generator.hpp:149): the
    unbounded variant draws gaussians with sigma=10.
    """
    if bounded:
        return jax.random.uniform(key, (dim,), dtype=dtype)
    return 10.0 * jax.random.normal(key, (dim,), dtype=dtype)


def random_vectors(key: jax.Array, n: int, dim: int, bounded: bool = True,
                   dtype=jnp.float32) -> jax.Array:
    """(n, dim) batch of random vectors (batched counterpart)."""
    if bounded:
        return jax.random.uniform(key, (n, dim), dtype=dtype)
    return 10.0 * jax.random.normal(key, (n, dim), dtype=dtype)


def random_lhs(key: jax.Array, n: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Latin hypercube sample of n points in [0,1]^dim.

    Mirrors limbo tools::random_lhs (random_generator.hpp:158): each of the n
    strata per dimension contains exactly one point, with an independent
    random permutation per dimension.
    """
    key_perm, key_jit = jax.random.split(key)
    # one independent permutation of 0..n-1 per dimension
    perm_keys = jax.random.split(key_perm, dim)
    perms = jnp.stack([jax.random.permutation(k, n) for k in perm_keys], axis=1)
    jitter = jax.random.uniform(key_jit, (n, dim), dtype=dtype)
    return (perms.astype(dtype) + jitter) / n


_HALTON_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
                  59, 61, 67, 71)


def halton(key: jax.Array, n: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Randomized Halton sequence: (n, dim) low-discrepancy points in
    [0,1)^dim with an independent Cramér shift per dimension (mod 1), so
    repeated calls stay unbiased while each draw keeps O(log n / n) star
    discrepancy — vs O(sqrt(1/n)) for iid uniform.  Used as the global
    sweep of the acquisition optimizer (the DIRECT-replacement's coverage
    phase); fully jittable (digit loops unroll at trace time).

    Falls back to iid uniform beyond the prime table (dim > 20).
    """
    import math

    if dim > len(_HALTON_PRIMES):
        return jax.random.uniform(key, (n, dim), dtype=dtype)
    i0 = jnp.arange(1, n + 1)
    cols = []
    for b in _HALTON_PRIMES[:dim]:
        digits = max(1, int(math.ceil(math.log(n + 1) / math.log(b))))
        x = jnp.zeros((n,), dtype)
        f = 1.0 / b
        idx = i0
        for _ in range(digits):
            x = x + (idx % b).astype(dtype) * f
            idx = idx // b
            f = f / b
        cols.append(x)
    H = jnp.stack(cols, axis=1)
    shift = jax.random.uniform(key, (dim,), dtype=dtype)
    return jnp.mod(H + shift[None, :], 1.0)


def grid_points(bins: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Full cartesian grid with (bins+1) points per dimension in [0,1]^dim.

    Mirrors limbo init::GridSampling (init/grid_sampling.hpp:70).  Returns
    ((bins+1)^dim, dim).  Built on host (static shapes) — the grid is part of
    the program, not data.
    """
    axes = [jnp.linspace(0.0, 1.0, bins + 1, dtype=dtype) for _ in range(dim)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.ravel() for m in mesh], axis=-1)
