"""A/B microbench: fused vs two-pass training-covariance build on TPU.

Times the full (N, N) chol-ready matrix build (gram + diag noise/jitter +
masked-identity padding) for SE-ARD — the matrix the GP refactorizes in
every recompute and every LML hp-opt ascent step:

  * two-pass: Pallas gram forward + XLA elementwise diag-add/mask pass
    (what models/gp.py did before kernels gained gram_train_masked);
  * fused: ops/gram_pallas.gram_train_pallas — one tile write.

Timings are chained-in-jit steady state (scan over dummy iterations so the
per-build time dominates), synced by host transfer (tunneled backend's
block_until_ready does not fence).

Usage: python scripts/train_gram_bench.py [n ...]   (default 4096 8192 10240)
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.utils.maths import masked_identity_gram

REPS = 20


def two_pass(kern, X, n):
    K = kern.gram_train(X)          # Pallas gram + XLA diag add
    mask = (jnp.arange(X.shape[0]) < n).astype(X.dtype)
    return masked_identity_gram(K, mask)


def fused(kern, X, n):
    return kern.gram_train_masked(X, n)


def time_build(build, kern, X, n):
    @jax.jit
    def chain(X, n):
        def body(acc, i):
            K = build(kern, X + 1e-9 * acc, n)   # data dep: no CSE across reps
            return K[0, 0], i
        acc, _ = jax.lax.scan(body, jnp.zeros((), X.dtype),
                              jnp.arange(REPS))
        return acc

    float(chain(X, n))               # compile + sync
    t0 = time.perf_counter()
    float(chain(X, n))
    return (time.perf_counter() - t0) / REPS


def main(sizes):
    d = 8
    for n in sizes:
        N = -(-n // 256) * 256
        key = jax.random.PRNGKey(0)
        X = jax.random.uniform(key, (N, d), dtype=jnp.float32)
        X = X.at[n:].set(0.0)
        kern = SquaredExpARD.create(dim=d)
        nn = jnp.asarray(n, jnp.int32)
        t2 = time_build(two_pass, kern, X, nn)
        t1 = time_build(fused, kern, X, nn)
        print(f"n={n:6d}  two-pass {t2*1e3:7.2f} ms   fused {t1*1e3:7.2f} ms"
              f"   speedup {t2/t1:.2f}x")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [4096, 8192, 10240])
