"""Decompose the acquisition phase at n=10k: where do 13 ms go?

The phase's HBM floor is ~(steps+1) reads of the bf16 N x N mirror
(~0.28 ms each at n=10k on a v5e's ~819 GB/s).  This chains each candidate
component in its own jitted program (data-dependent chains, one sync) to
get per-step costs free of tunnel dispatch overhead:

  read-chain     : t_{k+1} = normalize(t_k @ M)    — one (q,N)@(N,N) bf16
                   dot per step, nothing else: the measured floor.
  fixed-ks ascent: Rprop on quad(ks0 + small f(x)) — the full custom-VJP
                   query WITHOUT the gram build (ks fixed up to a rank-1
                   perturbation that keeps the ascent honest).
  full ascent    : the shipped acquisition maximization (gram + query +
                   P-correction + Rprop), varying step counts to get the
                   slope (per-step) and intercept (sweep + final evals).

Usage: python scripts/acq_decomp_bench.py [n]
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

RESTARTS, SWEEP = 32, 1024


def log(msg):
    print(f"[decomp] {msg}", file=sys.stderr, flush=True)


def chain_time(fn, state, reps=30):
    """fn: state -> state, data-dependent; returns ms per rep."""
    jfn = jax.jit(fn)
    state = jfn(state)
    jax.tree_util.tree_map(
        lambda a: jax.device_get(jax.tree_util.tree_leaves(a)[0:1]), state)
    s = state
    # sync via a tiny host transfer of one leaf
    leaf = lambda st: float(jnp.asarray(jax.tree_util.tree_leaves(st)[0]).ravel()[0])
    leaf(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = jfn(s)
    leaf(s)
    return (time.perf_counter() - t0) / reps * 1e3


def main(n=10_000, d=8):
    capacity = -(-(n + 4) // 512) * 512
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)
    gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                         capacity=capacity))(X, Y)
    float(gp.L[0, 0])
    cache = jax.jit(partial(gp_mod.QueryCache.build, with_Linv=True,
                            qdtype=jnp.bfloat16, defer_m=32))(gp)
    float(cache.Kinv[0, 0])
    N = capacity
    M = cache.Kinv_q
    log(f"setup done, N={N}")

    # --- 1. pure read chain ------------------------------------------------
    def read_step(t):
        u = jnp.dot(t.astype(jnp.bfloat16), M,
                    preferred_element_type=jnp.float32)
        return u / (1.0 + jnp.max(jnp.abs(u)))

    t0 = jnp.ones((RESTARTS, N), jnp.float32)
    per_read = chain_time(read_step, t0)
    log(f"pure (q={RESTARTS},N)@(N,N) bf16 read-chain: {per_read:.3f} ms/step"
        f"  ({N*N*2/per_read/1e6:.0f} GB/s)")

    # sweep-sized read
    t1 = jnp.ones((SWEEP, N), jnp.float32)
    per_sweep_read = chain_time(read_step, t1)
    log(f"pure (q={SWEEP},N)@(N,N) bf16 read: {per_sweep_read:.3f} ms")

    # --- 2. query_cached chain (gram + query, no Rprop) --------------------
    def query_step(x):
        mu, var = gp_mod.query_cached(gp, cache, x)
        score = mu[:, 0] + 0.5 * jnp.sqrt(var)
        return jnp.clip(x + 1e-4 * score[:, None], 0.0, 1.0)

    x0 = jnp.full((RESTARTS, d), 0.5, jnp.float32)
    per_query = chain_time(query_step, x0)
    log(f"query_cached fwd-only chain (gram+mu+quad): {per_query:.3f} ms/step")

    # --- 3. query + grad chain (the real ascent step's work) ---------------
    def vg_step(x):
        def acq(xi):
            mu, var = gp_mod.query_cached(gp, cache, xi[None, :])
            return mu[0, 0] + 0.5 * jnp.sqrt(var[0])
        v, g = jax.vmap(jax.value_and_grad(acq))(x)
        return jnp.clip(x + 1e-4 * g, 0.0, 1.0)

    per_vg = chain_time(vg_step, x0)
    log(f"query+grad chain (fwd+bwd custom VJP):      {per_vg:.3f} ms/step")

    # --- 4. full acquisition at varying step counts -------------------------
    times = {}
    for steps in (5, 15, 30):
        opt = RandomRestarts(sub=Rprop(iterations=steps),
                             repeats=RESTARTS, sweep_samples=SWEEP)

        def acq_phase(carry):
            x, key = carry
            key, k = jax.random.split(key)

            def acq_fn(xi):
                mu, var = gp_mod.query_cached(gp, cache, xi[None, :])
                return mu[0, 0] + 0.5 * jnp.sqrt(var[0])

            res = opt(acq_fn, x[0], k, True)
            return (jnp.tile(res.x[None, :], (RESTARTS, 1)), key)

        tms = chain_time(acq_phase, (x0, key), reps=20)
        times[steps] = tms
        log(f"full acquisition, {steps:2d} ascent steps: {tms:.3f} ms")

    slope = (times[30] - times[5]) / 25.0
    intercept = times[30] - 30 * slope
    log(f"per-ascent-step slope: {slope:.3f} ms; "
        f"intercept (sweep+final+misc): {intercept:.3f} ms")
    log(f"floor check: slope vs pure read {slope/per_read:.2f}x; "
        f"intercept vs sweep read {intercept/per_sweep_read:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000)
