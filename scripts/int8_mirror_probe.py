"""Probe: int8 query mirror for the acquisition quadratic form.

The acquisition-ascent hot path is HBM-bound on the per-step read of the
N x N K^{-1} query mirror (bf16 today).  This probes the next halving:
store the mirror as int8 with per-column scales (K^{-1} is symmetric, so
per-column == per-row; column scales fold into the OUTPUT of the matmul,
leaving a native s8 x s8 -> s32 MXU contraction).

Measures, at the bench config (n=10k, d=8, SE-ARD):
  1. speed of the (q,N)@(N,N) contraction: f32 vs bf16 vs int8;
  2. accuracy of quad = diag(ks K^{-1} ks^T) vs the f32 cache, compared
     with the bf16 mirror's error (the shipped default);
  3. accuracy of the resulting posterior VARIANCE and UCB value.
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
import numpy as np


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main(n=10_000, d=8, q=32):
    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    capacity = -(-n // 512) * 512
    key = jax.random.PRNGKey(0)
    kx, ky, kq = jax.random.split(key, 3)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)
    gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y,
                                         capacity=capacity))(X, Y)
    cache = jax.jit(partial(gp_mod.QueryCache.build))(gp)
    Kinv = cache.Kinv
    N = capacity
    print(f"N={N}  Kinv |max|={float(jnp.max(jnp.abs(Kinv))):.3g}")

    Xq = jax.random.uniform(kq, (q, d), dtype=jnp.float32)
    ks = (kernel.gram(Xq, gp.x) * gp.mask[None, :])  # (q, N)

    # --- reference quad (f64 on host) -----------------------------------
    ks64 = np.asarray(ks, np.float64)
    K64 = np.asarray(Kinv, np.float64)
    quad64 = np.einsum("qi,ij,qj->q", ks64, K64, ks64)

    def quad_f32(ks, M):
        t = jnp.dot(ks, M, preferred_element_type=jnp.float32)
        return jnp.sum(t * ks, axis=1)

    # --- bf16 mirror (shipped default) ----------------------------------
    M16 = Kinv.astype(jnp.bfloat16)

    def quad_bf16(ks, M):
        t = jnp.dot(ks.astype(jnp.bfloat16), M,
                    preferred_element_type=jnp.float32)
        return jnp.sum(t * ks, axis=1)

    # --- int8 mirror with per-column scales -----------------------------
    c = jnp.maximum(jnp.max(jnp.abs(Kinv), axis=0), 1e-30) / 127.0   # (N,)
    Q = jnp.round(Kinv / c[None, :]).astype(jnp.int8)

    def quad_int8(ks, Q, c):
        a = jnp.maximum(jnp.max(jnp.abs(ks), axis=1), 1e-30) / 127.0  # (q,)
        U = jnp.clip(jnp.round(ks / a[:, None]), -127, 127).astype(jnp.int8)
        t32 = jax.lax.dot_general(
            U, Q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)                        # (q,N)
        t = t32.astype(jnp.float32) * a[:, None] * c[None, :]
        return jnp.sum(t * ks, axis=1)

    # --- int8 weights, f32 activations (no ks quantization) -------------
    def quad_int8_f32act(ks, Q, c):
        t = jnp.dot(ks, Q.astype(jnp.float32) * c[None, :],
                    preferred_element_type=jnp.float32)
        return jnp.sum(t * ks, axis=1)

    j32 = jax.jit(quad_f32)
    j16 = jax.jit(quad_bf16)
    j8 = jax.jit(quad_int8)

    q32 = np.asarray(j32(ks, Kinv), np.float64)
    q16 = np.asarray(j16(ks, M16), np.float64)
    q8 = np.asarray(j8(ks, Q, c), np.float64)
    q8f = np.asarray(jax.jit(quad_int8_f32act)(ks, Q, c), np.float64)

    kd = np.asarray(kernel.k_diag(Xq), np.float64)
    var64 = np.maximum(kd - quad64, 0)
    print("prior k_diag ~", kd[:3])
    print("var (f64 ref):", var64[:6])
    for name, qq in [("f32 cache", q32), ("bf16 mirror", q16),
                     ("int8 s8xs8", q8), ("int8 w-only", q8f)]:
        err_q = np.max(np.abs(qq - quad64))
        var = np.maximum(kd - qq, 0)
        err_v = np.max(np.abs(var - var64))
        err_s = np.max(np.abs(np.sqrt(var) - np.sqrt(var64)))
        print(f"{name:14s} max|dquad|={err_q:.3e}  max|dvar|={err_v:.3e}"
              f"  max|dsigma|={err_s:.3e}")

    # --- speed -----------------------------------------------------------
    for qsz in (32, 1024):
        ksq = jnp.tile(ks, (qsz // q, 1))[:qsz] if qsz >= q else ks[:qsz]
        t_f32 = timed(j32, ksq, Kinv)
        t_bf16 = timed(j16, ksq, M16)
        t_int8 = timed(j8, ksq, Q, c)
        print(f"q={qsz:5d}:  f32 {t_f32:7.3f} ms   bf16 {t_bf16:7.3f} ms   "
              f"int8 {t_int8:7.3f} ms   (int8 vs bf16: "
              f"{t_bf16 / t_int8:.2f}x)")


if __name__ == "__main__":
    main()
