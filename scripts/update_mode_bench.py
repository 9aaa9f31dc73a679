"""A/B the cached-K^{-1} update modes at headline scale (n=10k).

Measures update-only ms/iter for fast_update in {"refined", "linv",
"deferred", True}
with the same chained-scan methodology as scripts/iter_breakdown_bench.py.
Expected ranking from HBM traffic (n=10k f32, 400 MB per N x N pass):
  * refined: Kinv matvec + K matvec + Kinv matvec + L^T matvec
             + Kinv rewrite + K rewrite + bf16 mirror  ~= 3.4 GB
  * linv:    Linv matvec + Linv^T matvec + Kinv rewrite + mirror ~= 1.8 GB
  * True:    Kinv matvec + L^T matvec + Kinv rewrite + mirror    ~= 1.8 GB
             (but compounding drift; linv holds solve accuracy)
  * deferred: Linv matvec + Linv^T matvec + O(N) writes, plus one
             (N,32)@(32,N) flush GEMM every 32 appends               ~= 0.8 GB

Usage: python scripts/update_mode_bench.py [n] [iters]
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("LIMBO_TPU_FAST_MATMUL", "1")

import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod


def log(msg):
    print(f"[update-ab] {msg}", file=sys.stderr, flush=True)


def setup(n, d, iters, mode):
    capacity = -(-(n + iters + 2) // 512) * 512
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
    float(gp.L[0, 0])
    log(f"fit {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    cache = jax.jit(partial(gp_mod.QueryCache.build,
                            with_K=(mode == "refined"),
                            with_Linv=(mode in ("linv", "deferred")),
                            qdtype=jnp.bfloat16,
                            defer_m=(32 if mode == "deferred" else 0)))(gp)
    float(cache.Kinv[0, 0])
    log(f"cache {time.perf_counter()-t0:.0f}s")
    return gp, cache


def bench_mode(n, d, iters, mode):
    @partial(jax.jit, donate_argnums=(0, 1))
    def upd_chain(gp, cache, key):
        def body(carry, k):
            gp, cache = carry
            x = jax.random.uniform(k, (gp.dim_in,), dtype=gp.x.dtype)
            y = jnp.sin(3.0 * jnp.sum(x))[None]
            return gp_mod.add_sample_cached(gp, cache, x, y,
                                            fast_update=mode), ()
        (gp, cache), _ = jax.lax.scan(body, (gp, cache),
                                      jax.random.split(key, iters))
        return gp, cache

    key = jax.random.PRNGKey(1)
    gp, cache = setup(n, d, iters, mode)
    g, c = upd_chain(gp, cache, key)           # compile
    float(g.n)
    gp, cache = setup(n, d, iters, mode)       # fresh (donated)
    t0 = time.perf_counter()
    g, c = upd_chain(gp, cache, key)
    float(g.n)
    t = (time.perf_counter() - t0) / iters
    log(f"mode={mode!r:10} {t*1e3:7.2f} ms/iter")
    return t


def main(n, iters):
    d = 8
    results = {}
    for mode in ("refined", "linv", "deferred", True):
        results[repr(mode)] = bench_mode(n, d, iters, mode)
    base = results["'refined'"]
    for m, t in results.items():
        log(f"{m:10} {t*1e3:7.2f} ms/iter  ({base/t:.2f}x vs refined)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(args[0] if args else 10_000, args[1] if len(args) > 1 else 10)
