"""A/B microbench: acquisition-ascent cost at large n through query_cached.

Compares, at n=10k (the headline bench setting):
  * autodiff VJP (two N x N contractions per Rprop step) vs the
    symmetry-aware custom VJP (_sym_quad_diag: one contraction, gradient
    reuses the forward matmul) — see models/gp.py;
  * f32 Kinv vs the bf16 query mirror (QueryCache.build(qdtype=bf16)).

Timings are chained-in-jit steady state, synced by host transfer (the
tunneled backend's block_until_ready does not fence — see
.claude/skills/verify/SKILL.md).

Usage: python scripts/ascent_bench.py [n]
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
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop

RESTARTS, ASCENT_STEPS = (int(v) for v in os.environ.get(
    "LIMBO_BENCH_SCHEDULE", "64x20").split("x"))  # library default
SWEEP = 1024


def query_cached_autodiff(gp, cache, Xq):
    """Reference query WITHOUT the symmetric custom VJP (autodiff does a
    second (q,N)@(N,N) contraction in the backward pass)."""
    Xq = jnp.atleast_2d(Xq).astype(gp.x.dtype)
    ks = gp.kernel.gram(Xq, gp.x) * gp.mask[None, :]
    mu = jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype) + gp.mean(Xq)
    Kq = cache.Kinv_q if cache.Kinv_q is not None else cache.Kinv
    t = jnp.dot(ks.astype(Kq.dtype), Kq, preferred_element_type=ks.dtype)
    var = gp.kernel.k_diag(Xq) - jnp.sum(t * ks, axis=1)
    return mu, jnp.maximum(var, 0.0)


def time_maximize(gp, cache, query, reps=30):
    opt = RandomRestarts(sub=Rprop(iterations=ASCENT_STEPS),
                         repeats=RESTARTS, sweep_samples=SWEEP)

    # gp/cache must be jit ARGUMENTS: closed-over arrays become HLO
    # constants, and a 400 MB Kinv constant overflows the tunneled
    # remote-compile request (HTTP 413).
    @jax.jit
    def chain(gp, cache, key):
        def acq_fn(x):
            mu, var = query(gp, cache, x[None, :])
            return mu[0, 0] + 0.5 * jnp.sqrt(var[0])

        def body(carry, k):
            res = opt(acq_fn, carry, k, True)
            return res.x, res.value
        keys = jax.random.split(key, reps)
        x, vals = jax.lax.scan(body, jnp.full((gp.dim_in,), 0.5,
                                              dtype=gp.x.dtype), keys)
        return vals

    v = chain(gp, cache, jax.random.PRNGKey(0))
    float(v[0])                       # compile + sync
    t0 = time.perf_counter()
    v = chain(gp, cache, jax.random.PRNGKey(1))
    float(v[0])
    return (time.perf_counter() - t0) / reps


def main(n=10_000, d=8):
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)
    capacity = -(-n // 256) * 256
    gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                         capacity=capacity))(X, Y)
    float(gp.L[0, 0])
    print(f"n={n} fit done", file=sys.stderr)
    c32 = jax.jit(gp_mod.QueryCache.build)(gp)
    c16 = jax.jit(lambda g: gp_mod.QueryCache.build(
        g, qdtype=jnp.bfloat16))(gp)
    float(c32.Kinv[0, 0]); float(c16.Kinv[0, 0])
    rows = []
    for name, cache, query in [
            ("f32 autodiff-vjp", c32, query_cached_autodiff),
            ("f32 sym-vjp", c32, gp_mod.query_cached),
            ("bf16 autodiff-vjp", c16, query_cached_autodiff),
            ("bf16 sym-vjp", c16, gp_mod.query_cached)]:
        dt = time_maximize(gp, cache, query)
        rows.append((name, dt))
        print(f"{name:20s} {dt*1e3:8.2f} ms/maximize "
              f"({RESTARTS}x{ASCENT_STEPS} ascent + {SWEEP} sweep)")
    base = rows[0][1]
    for name, dt in rows[1:]:
        print(f"{name:20s} speedup vs f32 autodiff: {base/dt:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000)
