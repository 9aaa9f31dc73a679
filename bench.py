"""Headline benchmark: GP fit + batched posterior query throughput on-chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (the framework's hot path, = limbo's _compute_full_kernel + LLT +
triangular solves + query, model/gp.hpp:550-626):
  n=4096 training points, d=8, 1024-point query batch, float32 on TPU.

vs_baseline: speedup over the same algorithm in NumPy float64 (OpenBLAS —
an Eigen-class CPU implementation, i.e. what the reference does on a host),
measured at n=1024/q=256 and scaled to the TPU workload by exact FLOP count
(dense-linear-algebra CPU time is FLOP-proportional at these sizes; cache
effects favour the smaller CPU problem, so the scaling is conservative).
"""

from __future__ import annotations

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import json
import time

import numpy as np


def flops(n: int, d: int, q: int, p: int = 1) -> float:
    gram = 2.0 * n * n * d          # pairwise-distance matmul
    chol = n ** 3 / 3.0
    alpha = 2.0 * n * n * p         # two triangular solves
    qgram = 2.0 * q * n * d
    qsolve = 1.0 * n * n * q        # one triangular solve for variance
    qmu = 2.0 * q * n * p
    return gram + chol + alpha + qgram + qsolve + qmu


def bench_tpu(n=4096, d=8, q=1024, iters=10):
    import jax
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    key = jax.random.PRNGKey(0)
    kx, ky, kq = jax.random.split(key, 3)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(3 * jnp.sum(X, axis=1, keepdims=True)) + \
        0.1 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    Xq = jax.random.uniform(kq, (q, d), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)

    # NOTE: timing syncs via an explicit host transfer of a checksum that
    # depends on every output — block_until_ready alone does not reliably
    # synchronize on the tunneled TPU backend.
    @jax.jit
    def fit_query(X, Y, Xq, it):
        gp = gp_mod.fit(kernel, mean, X + it * 1e-7, Y, capacity=n)
        mu, var = gp_mod.query(gp, Xq)
        return jnp.sum(mu) + jnp.sum(var)

    float(fit_query(X, Y, Xq, jnp.asarray(0.0)))      # compile + warmup
    t0 = time.perf_counter()
    for i in range(iters):
        chk = fit_query(X, Y, Xq, jnp.asarray(float(i + 1)))
    chk = float(chk)
    dt = (time.perf_counter() - t0) / iters
    return dt, flops(n, d, q) / dt / 1e12


def bench_numpy(n=1024, d=8, q=256, iters=3):
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(n, d))
    Y = np.sin(3 * X.sum(1, keepdims=True)) + 0.1 * rng.normal(size=(n, 1))
    Xq = rng.uniform(size=(q, d))
    from scipy.linalg import cholesky, solve_triangular

    def sqdist(A, B):
        return ((A * A).sum(1)[:, None] + (B * B).sum(1)[None, :]
                - 2 * A @ B.T)

    def fit_query():
        K = np.exp(-0.5 * sqdist(X, X)) + 0.0100000101 * np.eye(n)
        L = cholesky(K, lower=True)
        z = solve_triangular(L, Y - Y.mean(0), lower=True)
        alpha = solve_triangular(L.T, z)
        ks = np.exp(-0.5 * sqdist(Xq, X))
        mu = ks @ alpha + Y.mean(0)
        v = solve_triangular(L, ks.T, lower=True)
        var = 1.0 - (v * v).sum(0)
        return mu, var

    fit_query()
    t0 = time.perf_counter()
    for _ in range(iters):
        fit_query()
    dt = (time.perf_counter() - t0) / iters
    return dt, flops(n, d, q) / dt / 1e12


def main():
    dt_tpu, tflops_tpu = bench_tpu()
    dt_np, tflops_np = bench_numpy()
    # speedup at equal workload = ratio of achieved FLOP rates
    speedup = tflops_tpu / tflops_np
    print(json.dumps({
        "metric": "gp_fit_query_throughput",
        "value": round(tflops_tpu, 4),
        "unit": "TFLOP/s/chip (n=4096 fit + 1024-pt query, f32)",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
