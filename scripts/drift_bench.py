"""f32 drift telemetry for the cached-K^{-1} BO fast path.

The large-n BO iteration maintains K^{-1} by O(n^2) block-inverse updates
(models/gp.add_sample_cached) instead of refactorizing; in f32 the update
error compounds.  This script runs a long add_sample_cached horizon at
BO-realistic scale and logs, every `probe_every` iterations:

  * residual = max |(K Kinv - I) v|  for random probe vectors v (an O(n^2)
    estimate of the inverse's consistency);
  * posterior deltas |mu - mu_exact|, |var - var_exact| on a candidate
    batch, vs a freshly recomputed GP + exactly rebuilt cache.

Output: drift_results/drift.json with the telemetry curve and the smallest
refresh period that keeps posterior drift under `mu_tol` — the data behind
BOptimizer's cache_refresh_period default.

Usage: python scripts/drift_bench.py [n] [iters] [mode]   (TPU; ~minutes)
mode: solve (default) | refined | linv | deferred | raw — the
add_sample_cached fast_update mode under test.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod


def run(n=10000, iters=200, d=8, probe_every=10, mu_tol=1e-3,
        out_dir="drift_results", dtype=jnp.float32, seed=0, mode="solve",
        ell=None, noise=0.01):
    capacity = -(-(n + iters + 1) // 256) * 256
    key = jax.random.PRNGKey(seed)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=dtype)
    kernel = SquaredExpARD.create(dim=d, noise=noise, dtype=dtype)
    if ell is not None:
        kernel = kernel.replace(log_ell=jnp.full((d,), jnp.log(ell),
                                                 dtype=dtype))
    mean = DataMean.create(dim_out=1, dtype=dtype)

    gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                         capacity=capacity))(X, Y)
    fast_update = {"solve": False, "raw": True}.get(mode, mode)
    from functools import partial
    cache = jax.jit(partial(
        gp_mod.QueryCache.build,
        with_K=(mode == "refined"),
        with_Linv=(mode in ("linv", "deferred")),
        defer_m=(32 if mode == "deferred" else 0)))(gp)
    float(cache.Kinv[0, 0])

    add = jax.jit(partial(gp_mod.add_sample_cached, fast_update=fast_update))

    @jax.jit
    def probe_residual(gp, cache, key):
        K = gp.kernel.gram_train_masked(gp.x, gp.n)
        v = jax.random.normal(key, (gp.capacity, 8), dtype=gp.x.dtype)
        Kinv = cache.Kinv if cache.Kinv is not None \
            else cache.Kinv_q.astype(gp.x.dtype)
        Kv = jnp.dot(Kinv, v, preferred_element_type=gp.x.dtype)
        if cache.P is not None:
            # apply the pending deferred correction: the effective inverse
            # is Kinv + P P^T - diag(pend)
            idx = jnp.arange(gp.capacity)
            pend = ((idx >= cache.base_n) & (idx < gp.n)).astype(gp.x.dtype)
            Kv = (Kv + jnp.dot(cache.P, jnp.dot(cache.P.T, v))
                  - pend[:, None] * v)
        r = jnp.dot(K, Kv, preferred_element_type=gp.x.dtype) - v
        return jnp.max(jnp.abs(r))

    @jax.jit
    def posterior_delta(gp, cache, key):
        Xq = jax.random.uniform(key, (256, d), dtype=gp.x.dtype)
        mu_c, var_c = gp_mod.query_cached(gp, cache, Xq)
        gp_x = gp_mod.recompute(gp)
        cache_x = gp_mod.QueryCache.build(gp_x)
        mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
        return (jnp.max(jnp.abs(mu_c - mu_e)), jnp.max(jnp.abs(var_c - var_e)),
                jnp.max(jnp.abs(mu_e)))

    curve = []
    k = jax.random.PRNGKey(seed + 1)
    for it in range(1, iters + 1):
        k, ka, kx2 = jax.random.split(k, 3)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        y_new = jnp.sin(3.0 * jnp.sum(x_new))[None]
        gp, cache = add(gp, cache, x_new, y_new)
        if it % probe_every == 0:
            k, kp, kq = jax.random.split(k, 3)
            res = float(probe_residual(gp, cache, kp))
            dmu, dvar, mu_scale = (float(v) for v in
                                   posterior_delta(gp, cache, kq))
            curve.append({"iteration": it, "residual": res,
                          "d_mu": dmu, "d_var": dvar, "mu_scale": mu_scale})
            print(f"it={it:4d} residual={res:.3e} d_mu={dmu:.3e} "
                  f"d_var={dvar:.3e}", flush=True)

    # smallest horizon at which posterior drift crosses mu_tol
    safe = iters
    for row in curve:
        if row["d_mu"] > mu_tol:
            safe = row["iteration"] - probe_every
            break
    os.makedirs(out_dir, exist_ok=True)
    out = {"n": n, "iters": iters, "dtype": str(dtype.__name__),
           "mode": mode, "curve": curve, "mu_tol": mu_tol,
           "recommended_refresh_period": max(safe, probe_every)}
    with open(os.path.join(out_dir, f"drift_{mode}.json"
                           if mode != "solve" else "drift.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"recommended cache_refresh_period >= {out['recommended_refresh_period']}")
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    mode = sys.argv[3] if len(sys.argv) > 3 else "solve"
    ell = float(sys.argv[4]) if len(sys.argv) > 4 else None
    noise = float(sys.argv[5]) if len(sys.argv) > 5 else 0.01
    run(n=n, iters=iters, mode=mode, ell=ell, noise=noise)
