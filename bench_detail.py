"""Detailed benchmark: BO iteration rate at large n (BASELINE north star).

One BO iteration at dataset size n (the steady-state hot loop):
  * acquisition maximization: 16 restarts x 60 Rprop steps of gradient
    ascent on UCB through the GP query, plus a 1024-candidate sweep
    (all vmapped, one program);
  * evaluate (synthetic, on device);
  * rank-1 Cholesky add_sample.

Usage: python bench_detail.py [n]
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


import sys
import time

import jax
import jax.numpy as jnp

from limbo_tpu.acqui.acqui import UCB, FirstElem
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop


def make_bo_iter(kernel, acqui, opt):
    """Matmul-only BO iteration: UCB through the cached-K^{-1} query +
    O(n^2) block-inverse add (no triangular solves on the hot path)."""

    def bo_iter(gp, cache, key):
        def acq_fn(x):
            mu, var = gp_mod.query_cached(gp, cache, x[None, :])
            return mu[0, 0] + 0.5 * jnp.sqrt(var[0])

        start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
        res = opt(acq_fn, start, key, True)
        y = jnp.sin(3.0 * jnp.sum(res.x))[None]
        return gp_mod.add_sample_cached(gp, cache, res.x, y)

    return jax.jit(bo_iter)


def main(n=10000, d=8, iters=20):
    capacity = -(-(n + iters + 1) // 256) * 256
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)

    t0 = time.perf_counter()
    gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                         capacity=capacity))(X, Y)
    float(gp.L[0, 0])   # host transfer = real sync on the tunneled backend
    print(f"initial fit (n={n}, capacity={capacity}): "
          f"{time.perf_counter()-t0:.2f}s (incl. compile)")

    t0 = time.perf_counter()
    cache = jax.jit(gp_mod.QueryCache.build)(gp)
    float(cache.Kinv[0, 0])
    print(f"Kinv cache build: {time.perf_counter()-t0:.2f}s (incl. compile)")

    bo_iter = make_bo_iter(kernel, UCB(alpha=0.5),
                           RandomRestarts(sub=Rprop(iterations=30),
                                          repeats=32, sweep_samples=1024))
    gp, cache = bo_iter(gp, cache, key)
    float(gp.L[0, 0])                 # compile + sync
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        gp, cache = bo_iter(gp, cache, k)
    float(gp.n)                       # sync the whole chain
    dt = (time.perf_counter() - t0) / iters
    print(f"bo_iter at n~{n}: {dt*1e3:.1f} ms -> {1.0/dt:.2f} iters/s")
    return 1.0 / dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    main(n)
