"""Large-n scaling of the headline BO iteration on one chip.

BASELINE.md's north star is the n=10k-50k regime.  This measures, per n:
  * GP fit (gram + Cholesky + solves) steady-state,
  * QueryCache build (blocked triangular inverse + Kinv),
  * BO iteration (acquisition maximization + linv cached update),
with the bench.py protocol (d=8, 64 restarts x 20 ascent steps + 1024
sweep — the round-5 default schedule; rows recorded before round 5 used
32x30 — bf16 query mirror).  Memory budget per n (f32): L + Linv + Kinv
+ bf16 mirror ~ 3.5 N^2 bytes + workspace — n=24576 ~ 8.5 GB of a v5e's
16 GB HBM; beyond that the row-sharded / iterative paths take over
(parallel/sharded_chol.py, models/iterative.py).

Usage: python scripts/large_n_bench.py [--lite] [n1 n2 ...]
(default 10240 16384 24576).  --lite drops the f32 K^{-1} master
(mirror-only cache, defer_m=256): L + Linv + bf16 mirror ~ 2.5 N^2 bytes —
the n=32k+ single-chip configuration.
Appends one JSON line per n to scaling_results/large_n.jsonl.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("LIMBO_TPU_FAST_MATMUL", "1")

import json
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

RESTARTS, ASCENT_STEPS, SWEEP = 64, 20, 1024
ITERS = 6
D = 8
LITE = False


def log(msg):
    print(f"[large-n] {msg}", file=sys.stderr, flush=True)


def run(n, lite=False):
    capacity = -(-(n + ITERS + 2) // 512) * 512
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.uniform(kx, (n, D), dtype=jnp.float32)
    # A WELL-POSED large-n configuration: noise std 0.3 / kernel noise
    # 0.09, length scale 0.3.  With ell=1 the n >= 16k kernel matrix is so
    # collinear that even a backward-stable f32 triangular solve computes
    # the rank-1 Schur complement with O(0.1) absolute error — s comes out
    # <= 0 where the true value is >= noise (the f32 factorization's
    # FORWARD error, shared by the reference's algorithm run in f32), and
    # acquisition-driven appends then feed a phantom-maximum loop; previous
    # rounds' >=16k rows timed NaN/garbage buffers.  At ell=0.3 the
    # measured Schur complements at n=16k sit at 0.32-0.75 (solve == raw
    # matvec == refined to 4 decimals, /tmp probes in round 3) — two
    # orders above the f32 error floor, with margin for 32k.  Short length
    # scales are also the statistically right regime at large n (finer
    # resolvable structure).  The bench asserts finiteness per row.
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.3 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=D, noise=0.09, dtype=jnp.float32)
    kernel = kernel.replace(log_ell=jnp.full((D,), jnp.log(0.3),
                                             dtype=jnp.float32))
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)

    fit = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                          capacity=capacity))
    t0 = time.perf_counter()
    gp = fit(X, Y)
    float(gp.L[0, 0])
    t_fit_cold = time.perf_counter() - t0
    gp = None          # free the cold fit's N x N factor before re-running
    t0 = time.perf_counter()
    gp = fit(X, Y)
    float(gp.L[0, 0])
    t_fit = time.perf_counter() - t0
    log(f"n={n}: fit {t_fit*1e3:.0f} ms (cold {t_fit_cold:.0f} s)")

    build = jax.jit(partial(gp_mod.QueryCache.build, with_Linv=True,
                            qdtype=jnp.bfloat16,
                            defer_m=(256 if lite else 32), lite=lite))
    t0 = time.perf_counter()
    cache = build(gp)
    float(cache.Kinv_q[0, 0])
    t_cache_cold = time.perf_counter() - t0
    cache = None       # free before the steady-state rebuild
    t0 = time.perf_counter()
    cache = build(gp)
    float(cache.Kinv_q[0, 0])
    t_cache = time.perf_counter() - t0
    log(f"n={n}: cache build {t_cache*1e3:.0f} ms (cold {t_cache_cold:.0f} s)")

    opt = RandomRestarts(sub=Rprop(iterations=ASCENT_STEPS),
                         repeats=RESTARTS, sweep_samples=SWEEP)

    @partial(jax.jit, donate_argnums=(0, 1))
    def bo_iter(gp, cache, key):
        def acq_fn(x):
            mu, var = gp_mod.query_cached(gp, cache, x[None, :])
            return mu[0, 0] + 0.5 * jnp.sqrt(var[0])
        start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
        res = opt(acq_fn, start, key, True)
        y = jnp.sin(3.0 * jnp.sum(res.x))[None]
        return gp_mod.add_sample_cached(gp, cache, res.x, y,
                                        fast_update="deferred")

    key = jax.random.PRNGKey(1)
    gp, cache = bo_iter(gp, cache, key)     # compile
    float(gp.n)
    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        key, k = jax.random.split(key)
        gp, cache = bo_iter(gp, cache, k)
    float(gp.n)
    t_iter = (time.perf_counter() - t0) / (ITERS - 1)
    log(f"n={n}: bo_iter {t_iter*1e3:.2f} ms ({1/t_iter:.1f} iters/s)")
    # numerics validity: a NaN factor would produce identical timings
    finite = bool(jnp.all(jnp.isfinite(gp.L))
                  and jnp.all(jnp.isfinite(gp.alpha))
                  and jnp.all(jnp.isfinite(
                      cache.Kinv_q.astype(jnp.float32)
                      if cache.Kinv_q is not None else cache.Kinv)))
    log(f"n={n}: finite={finite}")

    return {"n": n, "capacity": capacity, "lite": lite, "finite": finite,
            "schedule": f"{RESTARTS}x{ASCENT_STEPS}",
            "fit_ms": round(t_fit * 1e3, 1),
            "cache_build_ms": round(t_cache * 1e3, 1),
            "bo_iter_ms": round(t_iter * 1e3, 2),
            "iters_per_s": round(1 / t_iter, 1)}


def main(ns, lite=False):
    os.makedirs("scaling_results", exist_ok=True)
    out = os.path.join("scaling_results", "large_n.jsonl")
    for n in ns:
        rec = run(n, lite=lite)
        with open(out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        log(json.dumps(rec))


if __name__ == "__main__":
    args = sys.argv[1:]
    lite = "--lite" in args
    ns = [int(a) for a in args if not a.startswith("--")] \
        or [10240, 16384, 24576]
    main(ns, lite=lite)
