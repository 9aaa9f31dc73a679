"""Ablate the "linv" cached update to find where its ms/iter goes.

Each variant is a chained-in-jit loop (donated buffers) that performs a
subset of add_sample_cached's work at n=10k:
  * pivot     — k build + two Linv matvecs only (800 MB of reads)
  * +rows     — pivot + the L / Linv row writes (in-place DUS)
  * +kinv     — the above + the fused outer-product Kinv rewrite
  * +alpha    — the above + the alpha matvec (should fuse with +kinv)
  * full      — add_sample_cached(fast_update="linv") incl. bf16 mirror

Usage: python scripts/update_ablation_bench.py [n] [iters]
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
from limbo_tpu.means.means import prepare_mean
from limbo_tpu.kernels.base import effective_jitter


def log(msg):
    print(f"[update-ablate] {msg}", file=sys.stderr, flush=True)


def setup(n, d, iters, qdtype):
    capacity = -(-(n + iters + 2) // 512) * 512
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
                            qdtype=qdtype))(gp)
    float(cache.Kinv[0, 0])
    return gp, cache


def make_step(stage):
    def step(gp, cache, x_new, y_new):
        i = gp.n
        mask = gp.mask
        dtype = gp.x.dtype
        k_vec = gp.kernel.gram(x_new[None, :], gp.x)[0] * mask
        kappa = (gp.kernel.k_diag(x_new[None, :])[0]
                 + gp.kernel.train_diag_add(x_new[None, :])[0])
        N = gp.capacity
        e_i = (jnp.arange(N) == i).astype(dtype)
        l = jnp.dot(cache.Linv, k_vec, preferred_element_type=dtype) * mask
        u = jnp.dot(cache.Linv.T, l, preferred_element_type=dtype) * mask
        s = jnp.maximum(kappa - jnp.dot(k_vec, u),
                        effective_jitter(dtype) * kappa)
        d_piv = jnp.sqrt(s)
        if stage == "pivot":
            # consume everything so nothing is DCEd; buffers pass through
            gp2 = gp.replace(n=i + 1,
                             x=gp.x.at[i].set(x_new),
                             y=gp.y.at[i].set(y_new))
            return gp2.replace(alpha=gp.alpha + (u / d_piv)[:, None]), cache
        L = gp.L.at[i].set(l * mask + d_piv * e_i)
        Linv_new = cache.Linv.at[i].set(-(u / d_piv) * mask
                                        + (1.0 / d_piv) * e_i)
        gp2 = gp.replace(n=i + 1, L=L,
                         x=gp.x.at[i].set(x_new),
                         y=gp.y.at[i].set(y_new))
        if stage == "rows":
            return (gp2.replace(alpha=gp.alpha + (u / d_piv)[:, None]),
                    cache.replace(Linv=Linv_new))
        v = u - e_i
        Kinv = cache.Kinv + jnp.outer(v, v) / s - jnp.outer(e_i, e_i)
        if stage == "kinv":
            return (gp2.replace(alpha=gp.alpha + (u / d_piv)[:, None]),
                    cache.replace(Kinv=Kinv, Linv=Linv_new))
        mean = prepare_mean(gp2.mean, gp2.y, gp2.mask)
        centered = (gp2.y - mean(gp2.x)) * gp2.mask[:, None]
        alpha = jnp.dot(Kinv, centered, preferred_element_type=dtype)
        # stage == "alpha": everything except the bf16 mirror cast
        return (gp2.replace(mean=mean, alpha=alpha),
                cache.replace(Kinv=Kinv, Linv=Linv_new))

    return step


def bench(n, iters, stage):
    qdtype = jnp.bfloat16 if stage == "full" else None
    if stage == "full":
        step = partial(gp_mod.add_sample_cached, fast_update="linv")
    else:
        step = make_step(stage)

    @partial(jax.jit, donate_argnums=(0, 1))
    def chain(gp, cache, key):
        def body(carry, k):
            gp, cache = carry
            x = jax.random.uniform(k, (gp.dim_in,), dtype=gp.x.dtype)
            y = jnp.sin(3.0 * jnp.sum(x))[None]
            return step(gp, cache, x, y), ()
        (gp, cache), _ = jax.lax.scan(body, (gp, cache),
                                      jax.random.split(key, iters))
        return gp, cache

    key = jax.random.PRNGKey(1)
    gp, cache = setup(n, 8, iters, qdtype)
    g, c = chain(gp, cache, key)
    float(g.n)
    gp, cache = setup(n, 8, iters, qdtype)
    t0 = time.perf_counter()
    g, c = chain(gp, cache, key)
    float(g.n)
    t = (time.perf_counter() - t0) / iters
    log(f"{stage:8} {t*1e3:7.2f} ms/iter")
    return t


def main(n, iters):
    for stage in ("pivot", "rows", "kinv", "alpha", "full"):
        bench(n, iters, stage)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(args[0] if args else 10_000, args[1] if len(args) > 1 else 10)
