"""Per-phase breakdown of the headline BO iteration (bench.py) at n=10k.

Isolates where the ~27 ms/iteration goes:
  * python-loop: bench.py's measurement mode — one jitted bo_iter dispatch
    per iteration, donated buffers, one sync at the end;
  * scanned: the same K iterations inside ONE `lax.scan` program (the
    optimize_jit execution style) — any gap vs python-loop is host dispatch
    overhead on the tunneled backend;
  * acquisition-only: the RandomRestarts maximization alone, chained;
  * update-only: add_sample_cached ("deferred" mode, the shipped
    bench default) alone, chained.

Usage: python scripts/iter_breakdown_bench.py [n] [iters]
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
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop

RESTARTS, ASCENT_STEPS = (int(v) for v in os.environ.get(
    "LIMBO_BENCH_SCHEDULE", "64x20").split("x"))  # library default
SWEEP = 1024


def log(msg):
    print(f"[breakdown] {msg}", file=sys.stderr, flush=True)


def setup(n, d, iters):
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
    cache = jax.jit(partial(gp_mod.QueryCache.build, with_Linv=True,
                            qdtype=jnp.bfloat16, defer_m=32))(gp)
    float(cache.Kinv[0, 0])
    log(f"cache {time.perf_counter()-t0:.0f}s")
    return gp, cache


def make_parts(gp0):
    opt = RandomRestarts(sub=Rprop(iterations=ASCENT_STEPS),
                         repeats=RESTARTS, sweep_samples=SWEEP)

    def acquire(gp, cache, key):
        def acq_fn(x):
            mu, var = gp_mod.query_cached(gp, cache, x[None, :])
            return mu[0, 0] + 0.5 * jnp.sqrt(var[0])

        start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
        return opt(acq_fn, start, key, True).x

    def update(gp, cache, x, y):
        return gp_mod.add_sample_cached(gp, cache, x, y,
                                        fast_update="deferred")

    def bo_iter(gp, cache, key):
        x = acquire(gp, cache, key)
        y = jnp.sin(3.0 * jnp.sum(x))[None]
        return update(gp, cache, x, y)

    return acquire, update, bo_iter


def main(n, iters):
    d = 8
    gp, cache = setup(n, d, iters)
    acquire, update, bo_iter = make_parts(gp)
    key = jax.random.PRNGKey(1)

    # -- python-loop (bench.py mode) --------------------------------------
    step = jax.jit(bo_iter, donate_argnums=(0, 1))
    g, c = step(gp, cache, key)
    float(g.n)
    t0 = time.perf_counter()
    kk = key
    for _ in range(iters):
        kk, k = jax.random.split(kk)
        g, c = step(g, c, k)
    float(g.n)
    t_loop = (time.perf_counter() - t0) / iters
    log(f"python-loop   {t_loop*1e3:7.2f} ms/iter ({1/t_loop:.1f} iters/s)")

    # -- scanned (one program) --------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def scanned(gp, cache, key):
        def body(carry, k):
            gp, cache = carry
            return bo_iter(gp, cache, k), ()
        keys = jax.random.split(key, iters)
        (gp, cache), _ = jax.lax.scan(body, (gp, cache), keys)
        return gp, cache

    gp2, cache2 = setup(n, d, iters)       # fresh buffers (donated above)
    t0 = time.perf_counter()
    g2, c2 = scanned(gp2, cache2, key)
    float(g2.n)
    log(f"scanned compile+run {time.perf_counter()-t0:.0f}s")
    gp3, cache3 = setup(n, d, iters)
    t0 = time.perf_counter()
    g3, c3 = scanned(gp3, cache3, key)
    float(g3.n)
    t_scan = (time.perf_counter() - t0) / iters
    log(f"scanned       {t_scan*1e3:7.2f} ms/iter ({1/t_scan:.1f} iters/s)")

    # -- acquisition-only (chained) ----------------------------------------
    gp4, cache4 = setup(n, d, iters)

    @jax.jit
    def acq_chain(gp, cache, key):
        def body(acc, k):
            x = acquire(gp, cache, k)
            return acc + x[0], ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), gp.x.dtype),
                              jax.random.split(key, iters))
        return acc

    float(acq_chain(gp4, cache4, key))
    t0 = time.perf_counter()
    float(acq_chain(gp4, cache4, key))
    t_acq = (time.perf_counter() - t0) / iters
    log(f"acquire-only  {t_acq*1e3:7.2f} ms/iter")

    # -- update-only (chained) ---------------------------------------------
    @partial(jax.jit, donate_argnums=(0, 1))
    def upd_chain(gp, cache, key):
        def body(carry, k):
            gp, cache = carry
            x = jax.random.uniform(k, (gp.dim_in,), dtype=gp.x.dtype)
            y = jnp.sin(3.0 * jnp.sum(x))[None]
            return update(gp, cache, x, y), ()
        (gp, cache), _ = jax.lax.scan(body, (gp, cache),
                                      jax.random.split(key, iters))
        return gp, cache

    gp5, cache5 = setup(n, d, iters)
    g5, c5 = upd_chain(gp5, cache5, key)
    float(g5.n)
    gp6, cache6 = setup(n, d, iters)
    t0 = time.perf_counter()
    g6, c6 = upd_chain(gp6, cache6, key)
    float(g6.n)
    t_upd = (time.perf_counter() - t0) / iters
    log(f"update-only   {t_upd*1e3:7.2f} ms/iter")

    log(f"acquire {t_acq*1e3:.1f} + update {t_upd*1e3:.1f} = "
        f"{(t_acq+t_upd)*1e3:.1f} ms vs scanned {t_scan*1e3:.1f} "
        f"vs python-loop {t_loop*1e3:.1f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(args[0] if args else 10_000, args[1] if len(args) > 1 else 10)
