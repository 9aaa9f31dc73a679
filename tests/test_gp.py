"""GP model tests, mirroring src/tests/test_gp.cpp's strategy:

- exact interpolation at samples (test_gp.cpp:473)
- incremental add_sample == batch fit (test_gp_bw_inversion, :568)
- prior behaviour with no samples (:637, :697)
- log-lik gradient vs finite differences (:131-315, via autodiff here)
- hyperparameter optimization improves log-lik (gp_auto, :669)
- K^{-1} correctness (:382)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import Exp, MaternFiveHalves, SquaredExpARD
from limbo_tpu.means import ConstantMean, DataMean, NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.models.hp_opt import KernelLFOpt, KernelLooOpt, KernelMeanLFOpt
from limbo_tpu.opt import Rprop

F64 = jnp.float64


def make_data(rng, n=20, d=2, p=1):
    X = jnp.asarray(rng.uniform(size=(n, d)))
    Y = jnp.asarray(np.sin(3 * np.asarray(X).sum(axis=1, keepdims=True))
                    + 0.1 * rng.normal(size=(n, p)))
    return X, Y


def test_exact_interpolation(rng):
    """Posterior mean at training points reproduces observations (low noise)."""
    # short length scale keeps K well-conditioned so interpolation is tight
    X, Y = make_data(rng, n=15)
    kern = Exp.create(noise=1e-10, l=0.2, dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y)
    mu, var = gp_mod.query(gp, X)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(Y), atol=1e-5)
    assert np.all(np.asarray(var) < 1e-4)


def test_prior_no_samples():
    """Empty GP returns the prior mean and prior variance (gp.hpp:159-171)."""
    kern = Exp.create(sigma_sq=2.0, dtype=F64)
    gp = gp_mod.empty(kern, ConstantMean.create(0.5, dtype=F64), dim_in=2,
                      capacity=64, dtype=F64)
    mu, var = gp_mod.query(gp, jnp.asarray([[0.3, 0.4]], dtype=F64))
    np.testing.assert_allclose(float(mu[0, 0]), 0.5, atol=1e-12)
    np.testing.assert_allclose(float(var[0]), 2.0, rtol=1e-10)


def test_incremental_equals_batch(rng):
    """add_sample chain == one-shot fit (limbo test_gp_bw_inversion)."""
    X, Y = make_data(rng, n=12, d=2)
    kern = MaternFiveHalves.create(dtype=F64)
    mean = DataMean.create(dim_out=1, dtype=F64)
    batch = gp_mod.fit(kern, mean, X, Y, capacity=64)

    inc = gp_mod.empty(kern, mean, dim_in=2, capacity=64, dtype=F64)
    add = jax.jit(gp_mod.add_sample)
    for i in range(12):
        inc = add(inc, X[i], Y[i])

    np.testing.assert_allclose(np.asarray(inc.L), np.asarray(batch.L),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(inc.alpha), np.asarray(batch.alpha),
                               atol=1e-8)
    Xq = jnp.asarray(rng.uniform(size=(7, 2)))
    mu_b, var_b = gp_mod.query(batch, Xq)
    mu_i, var_i = gp_mod.query(inc, Xq)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_b), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_b), atol=1e-9)


def test_padding_invariance(rng):
    """Results don't depend on the padded capacity."""
    X, Y = make_data(rng, n=10)
    kern = Exp.create(dtype=F64)
    gp1 = gp_mod.fit(kern, NullMean(), X, Y, capacity=64)
    gp2 = gp_mod.fit(kern, NullMean(), X, Y, capacity=192)
    Xq = jnp.asarray(rng.uniform(size=(5, 2)))
    for a, b in zip(gp_mod.query(gp1, Xq), gp_mod.query(gp2, Xq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    np.testing.assert_allclose(float(gp_mod.log_lik(gp1)),
                               float(gp_mod.log_lik(gp2)), rtol=1e-12)


def test_grow_preserves_state(rng):
    X, Y = make_data(rng, n=10)
    kern = Exp.create(dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=64)
    gp2 = gp_mod.grow(gp, 128)
    Xq = jnp.asarray(rng.uniform(size=(5, 2)))
    for a, b in zip(gp_mod.query(gp, Xq), gp_mod.query(gp2, Xq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    # and adding a sample to the grown GP still matches a batch fit
    xn = jnp.asarray(rng.uniform(size=2))
    yn = jnp.asarray([0.3], dtype=F64)
    gp3 = gp_mod.add_sample(gp2, xn, yn)
    ref = gp_mod.fit(kern, NullMean(), jnp.vstack([X, xn[None]]),
                     jnp.vstack([Y, yn[None]]), capacity=128)
    mu_a, _ = gp_mod.query(gp3, Xq)
    mu_r, _ = gp_mod.query(ref, Xq)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_r), atol=1e-9)


@pytest.mark.parametrize("mean_cls", ["null", "constant", "data"])
def test_log_lik_grad_fd(mean_cls, rng):
    """Autodiff LML gradient vs finite differences (limbo check_grad)."""
    X, Y = make_data(rng, n=14, d=2)
    kern = SquaredExpARD.create(dim=2, optimize_noise=True, dtype=F64)
    mean = {"null": NullMean(), "constant": ConstantMean.create(0.2, dtype=F64),
            "data": DataMean.create(dtype=F64)}[mean_cls]
    n = jnp.asarray(14)

    def f(p):
        return gp_mod.log_marginal_likelihood(
            kern.with_params(p), mean,
            jnp.zeros((32, 2), dtype=F64).at[:14].set(X),
            jnp.zeros((32, 1), dtype=F64).at[:14].set(Y), n)

    p0 = kern.params + jnp.asarray(rng.normal(scale=0.2, size=kern.params_size))
    g = jax.grad(f)(p0)
    eps = 1e-6
    for j in range(p0.shape[0]):
        e = jnp.zeros_like(p0).at[j].set(eps)
        fd = (f(p0 + e) - f(p0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[j], fd, rtol=1e-4, atol=1e-6)


def test_loo_cv_grad_fd(rng):
    """LOO-CV gradient vs finite differences (test_gp.cpp:273-315)."""
    X, Y = make_data(rng, n=12, d=2)
    kern = SquaredExpARD.create(dim=2, dtype=F64)
    n = jnp.asarray(12)
    xp = jnp.zeros((32, 2), dtype=F64).at[:12].set(X)
    yp = jnp.zeros((32, 1), dtype=F64).at[:12].set(Y)

    def f(p):
        return gp_mod.log_loo_cv_fn(kern.with_params(p), NullMean(), xp, yp, n)

    p0 = kern.params
    g = jax.grad(f)(p0)
    eps = 1e-6
    for j in range(p0.shape[0]):
        e = jnp.zeros_like(p0).at[j].set(eps)
        fd = (f(p0 + e) - f(p0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[j], fd, rtol=1e-4, atol=1e-6)


def test_inv_kernel(rng):
    """K^{-1} from Cholesky matches direct inverse (test_gp.cpp:382)."""
    X, Y = make_data(rng, n=10)
    kern = Exp.create(dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=32)
    from limbo_tpu.utils.maths import masked_identity_gram
    K = masked_identity_gram(kern.gram_train(gp.x), gp.mask)
    Kinv = gp_mod.inv_kernel(gp)
    np.testing.assert_allclose(np.asarray(Kinv @ K), np.eye(32), atol=1e-8)


def test_hp_opt_improves_log_lik(rng):
    """KernelLFOpt improves the LML (limbo gp_auto test, test_gp.cpp:669)."""
    n = 40
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    Y = jnp.asarray(np.cos(6 * np.asarray(X)))
    kern = SquaredExpARD.create(dim=1, dtype=F64)
    gp0 = gp_mod.fit(kern, DataMean.create(dtype=F64), X, Y)
    ll0 = float(gp_mod.log_lik(gp0))
    opt = KernelLFOpt(optimizer=Rprop(iterations=150))
    gp1 = jax.jit(opt)(gp0, jax.random.PRNGKey(0))
    ll1 = float(gp_mod.log_lik(gp1))
    assert ll1 > ll0
    # predictions should be good after hp-opt
    Xq = jnp.linspace(0, 1, 50, dtype=F64)[:, None]
    mu, _ = gp_mod.query(gp1, Xq)
    np.testing.assert_allclose(np.asarray(mu[:, 0]),
                               np.cos(6 * np.asarray(Xq[:, 0])), atol=0.1)


def test_loo_opt_improves(rng):
    n = 30
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    Y = jnp.asarray(np.cos(6 * np.asarray(X)))
    kern = SquaredExpARD.create(dim=1, dtype=F64)
    gp0 = gp_mod.fit(kern, NullMean(), X, Y)
    loo0 = float(gp_mod.log_loo_cv(gp0))
    gp1 = jax.jit(KernelLooOpt(optimizer=Rprop(iterations=100)))(
        gp0, jax.random.PRNGKey(0))
    loo1 = float(gp_mod.log_loo_cv(gp1))
    assert loo1 > loo0


def test_multi_output_shared_kernel(rng):
    """dim_out > 1 with one shared kernel matrix (limbo convention)."""
    X, _ = make_data(rng, n=12)
    Y = jnp.asarray(rng.normal(size=(12, 3)))
    kern = Exp.create(noise=1e-8, l=0.2, dtype=F64)
    gp = gp_mod.fit(kern, NullMean(dim_out=3), X, Y)
    mu, var = gp_mod.query(gp, X)
    assert mu.shape == (12, 3)
    assert var.shape == (12,)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(Y), atol=1e-4)


def test_identical_samples_jitter(rng):
    """Duplicated samples stay numerically stable (test_gp.cpp:513)."""
    X = jnp.asarray([[0.5, 0.5]] * 5, dtype=F64)
    Y = jnp.asarray([[1.0]] * 5, dtype=F64)
    gp = gp_mod.fit(Exp.create(dtype=F64), NullMean(), X, Y)
    mu, var = gp_mod.query(gp, X)
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.isfinite(np.asarray(var)))


def test_query_cached_matches_solve(rng):
    X, Y = make_data(rng, n=20)
    kern = Exp.create(l=0.3, dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=32)
    cache = gp_mod.QueryCache.build(gp)
    Xq = jnp.asarray(rng.uniform(size=(9, 2)))
    mu1, v1 = gp_mod.query(gp, Xq)
    mu2, v2 = gp_mod.query_cached(gp, cache, Xq)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-10)


def test_query_cache_bf16_mirror(rng):
    """bf16 Kinv mirror (QueryCache.build(qdtype=bf16)): mean is untouched
    (f32 alpha path); variance is bit-equivalent to the f32 path with its
    operands truncated to bf16 — exactly what TPU default matmul precision
    does to the f32 path on hardware, so the mirror trades no accuracy on
    the TPU hot loop, only HBM bandwidth; and add_sample_cached keeps the
    mirror refreshed from the f32 master (no compounding drift)."""
    X, Y = make_data(rng, n=24)
    kern = Exp.create(l=0.3, dtype=jnp.float32)
    gp = gp_mod.fit(kern, NullMean(), X.astype(jnp.float32),
                    Y.astype(jnp.float32), capacity=32)
    cache32 = gp_mod.QueryCache.build(gp)
    cache16 = gp_mod.QueryCache.build(gp, qdtype=jnp.bfloat16)
    assert cache16.Kinv_q.dtype == jnp.bfloat16
    assert cache16.Kinv.dtype == jnp.float32
    Xq = jnp.asarray(rng.uniform(size=(16, 2)), dtype=jnp.float32)
    mu32, _ = gp_mod.query_cached(gp, cache32, Xq)
    mu16, v16 = gp_mod.query_cached(gp, cache16, Xq)
    np.testing.assert_allclose(np.asarray(mu16), np.asarray(mu32), atol=1e-6)
    # emulate the TPU default-precision f32 matmul (bf16-truncated inputs):
    # the mirror must match it (same rounding, f32 accumulation)
    trunc = gp_mod.QueryCache(
        Kinv=cache32.Kinv.astype(jnp.bfloat16).astype(jnp.float32))
    gp_t = gp  # ks truncation handled below via the same query
    mask = gp.mask
    ks = gp.kernel.gram(Xq, gp.x) * mask[None, :]
    ks16 = ks.astype(jnp.bfloat16).astype(jnp.float32)
    t = jnp.dot(ks16, trunc.Kinv)
    v_emul = jnp.maximum(gp_t.kernel.k_diag(Xq) - jnp.sum(t * ks, axis=1), 0.0)
    np.testing.assert_allclose(np.asarray(v16), np.asarray(v_emul),
                               atol=1e-5, rtol=1e-4)
    # on a better-conditioned GP the mirror variance stays within the bf16
    # input-rounding scale (~2^-9 through the quadratic form — the same
    # rounding TPU default matmul precision applies to the f32 path)
    kern_n = Exp.create(l=0.3, noise=0.1, dtype=jnp.float32)
    gp_n = gp_mod.fit(kern_n, NullMean(), X.astype(jnp.float32),
                      Y.astype(jnp.float32), capacity=32)
    c32 = gp_mod.QueryCache.build(gp_n)
    c16 = gp_mod.QueryCache.build(gp_n, qdtype=jnp.bfloat16)
    _, v32n = gp_mod.query_cached(gp_n, c32, Xq)
    _, v16n = gp_mod.query_cached(gp_n, c16, Xq)
    np.testing.assert_allclose(np.asarray(v16n), np.asarray(v32n), atol=5e-2)
    # chained cached adds keep the mirror in sync with the f32 master
    step = jax.jit(gp_mod.add_sample_cached)
    for _ in range(4):
        xn = jnp.asarray(rng.uniform(size=2), dtype=jnp.float32)
        yn = jnp.asarray(rng.normal(size=1), dtype=jnp.float32)
        gp, cache16 = step(gp, cache16, xn, yn)
    np.testing.assert_allclose(
        np.asarray(cache16.Kinv_q, dtype=np.float32),
        np.asarray(cache16.Kinv.astype(jnp.bfloat16), dtype=np.float32))


def test_query_cached_symmetric_vjp(rng):
    """The variance quadratic form's symmetry-aware custom VJP (gradient =
    2 ks Kinv, reusing the forward matmul) matches autodiff through an
    explicit ks @ Kinv @ ks^T to f32 roundoff, on both the f32 cache and
    the bf16 mirror."""
    X, Y = make_data(rng, n=24)
    kern = Exp.create(l=0.3, noise=0.1, dtype=jnp.float32)
    gp = gp_mod.fit(kern, NullMean(), X.astype(jnp.float32),
                    Y.astype(jnp.float32), capacity=32)
    cache = gp_mod.QueryCache.build(gp)
    x0 = jnp.asarray(rng.uniform(size=2), dtype=jnp.float32)

    def acq(x):
        mu, var = gp_mod.query_cached(gp, cache, x[None, :])
        return mu[0, 0] + 0.5 * jnp.sqrt(var[0] + 1e-8)

    def acq_ref(x):   # same math without the custom VJP
        Xq = x[None, :]
        ks = gp.kernel.gram(Xq, gp.x) * gp.mask[None, :]
        mu = jnp.dot(ks, gp.alpha) + gp.mean(Xq)
        q = jnp.sum(jnp.dot(ks, cache.Kinv) * ks, axis=1)
        var = jnp.maximum(gp.kernel.k_diag(Xq) - q, 0.0)
        return mu[0, 0] + 0.5 * jnp.sqrt(var[0] + 1e-8)

    g = jax.grad(acq)(x0)
    g_ref = jax.grad(acq_ref)(x0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # bf16 mirror: gradient stays within bf16 rounding of the f32 gradient
    c16 = gp_mod.QueryCache.build(gp, qdtype=jnp.bfloat16)

    def acq16(x):
        mu, var = gp_mod.query_cached(gp, c16, x[None, :])
        return mu[0, 0] + 0.5 * jnp.sqrt(var[0] + 1e-8)

    g16 = np.asarray(jax.grad(jax.jit(acq16))(x0), dtype=np.float64)
    gr = np.asarray(g_ref, dtype=np.float64)
    cos = g16 @ gr / (np.linalg.norm(g16) * np.linalg.norm(gr) + 1e-30)
    assert cos > 0.95, cos
    assert 0.5 < np.linalg.norm(g16) / np.linalg.norm(gr) < 2.0


def test_add_sample_cached_incremental(rng):
    """Chained Kinv block updates stay exact vs a fresh batch fit."""
    X, Y = make_data(rng, n=10)
    kern = Exp.create(l=0.3, dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=32)
    cache = gp_mod.QueryCache.build(gp)
    step = jax.jit(gp_mod.add_sample_cached)
    for k in range(6):
        xn = jnp.asarray(rng.uniform(size=2))
        yn = jnp.asarray(rng.normal(size=1))
        gp, cache = step(gp, cache, xn, yn)
    ref = gp_mod.fit(kern, NullMean(), gp.x[:16], gp.y[:16], capacity=32)
    Xq = jnp.asarray(rng.uniform(size=(7, 2)))
    mu_c, v_c = gp_mod.query_cached(gp, cache, Xq)
    mu_r, v_r = gp_mod.query(ref, Xq)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_r), atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_r), atol=1e-7)
    # L stays consistent too
    np.testing.assert_allclose(np.asarray(gp.L), np.asarray(ref.L), atol=1e-7)


def test_grow_then_cached_add(rng):
    """Capacity growth preserves the padded-identity invariant for the
    cached fast path too."""
    X, Y = make_data(rng, n=8)
    kern = Exp.create(l=0.3, dtype=F64)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=16)
    gp = gp_mod.grow(gp, 32)
    cache = gp_mod.QueryCache.build(gp)
    xn = jnp.asarray(rng.uniform(size=2))
    yn = jnp.asarray(rng.normal(size=1))
    gp2, cache2 = gp_mod.add_sample_cached(gp, cache, xn, yn)
    ref = gp_mod.fit(kern, NullMean(), jnp.vstack([X, xn[None]]),
                     jnp.vstack([Y, yn[None]]), capacity=32)
    Xq = jnp.asarray(rng.uniform(size=(5, 2)))
    mu_c, v_c = gp_mod.query_cached(gp2, cache2, Xq)
    mu_r, v_r = gp_mod.query(ref, Xq)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v_r), atol=1e-8)


def test_multi_output_bo_with_aggregator(rng):
    """dim_out > 1 + custom aggregator end to end through the BO loop."""
    from limbo_tpu.acqui import DistanceToTarget, UCB
    from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling
    from limbo_tpu.opt import RandomSweep

    def f(x):
        x = np.asarray(x)
        return np.array([x[0] - 0.2, x[1] - 0.8])

    bo = BOptimizer(acqui=UCB(1.0), init=RandomSampling(6),
                    stop=(MaxIterations(15),),
                    acqui_optimizer=RandomSweep(samples=256),
                    stats_enabled=False, dtype=F64)
    state = bo.optimize(f, dim_in=2, dim_out=2,
                        aggregator=DistanceToTarget([0.0, 0.0]),
                        key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(state.best_sample, [0.2, 0.8], atol=0.15)


def test_cached_kinv_drift_bounded():
    """f32 cached-K^{-1} block updates: posterior drift vs exact refresh
    stays bounded over a long add_sample_cached horizon (the BO fast path's
    correctness envelope; see scripts/drift_bench.py for the full-scale
    telemetry)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    n0, iters, d = 64, 100, 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n0, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n0, 1), dtype=dtype)
    kernel = SquaredExpARD.create(dim=d, dtype=dtype)
    mean = DataMean.create(dim_out=1, dtype=dtype)
    gp = gp_mod.fit(kernel, mean, X, Y, capacity=256)
    cache = gp_mod.QueryCache.build(gp)

    add = jax.jit(gp_mod.add_sample_cached)

    def run_horizon(gp, cache, refresh_period):
        k = jax.random.PRNGKey(1)
        for it in range(1, iters + 1):
            k, kx2 = jax.random.split(k)
            x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
            y_new = jnp.sin(3.0 * jnp.sum(x_new))[None]
            gp, cache = add(gp, cache, x_new, y_new)
            if refresh_period and it % refresh_period == 0:
                gp = gp_mod.recompute(gp)
                cache = gp_mod.QueryCache.build(gp)
        return gp, cache

    def deltas(gp, cache):
        Xq = jax.random.uniform(jax.random.PRNGKey(2), (128, d), dtype=dtype)
        mu_c, var_c = gp_mod.query_cached(gp, cache, Xq)
        gp_x = gp_mod.recompute(gp)
        cache_x = gp_mod.QueryCache.build(gp_x)
        mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
        return (float(jnp.max(jnp.abs(mu_c - mu_e))),
                float(jnp.max(jnp.abs(var_c - var_e))))

    # default (solve-based u): drift stays at f32 noise even UNREFRESHED
    # (the matmul-only fast_update path measured ~2e-2 on this horizon —
    # that variant is opt-in and pairs with a small refresh period)
    gp_raw, cache_raw = run_horizon(gp, cache, refresh_period=0)
    d_mu_raw, d_var_raw = deltas(gp_raw, cache_raw)
    assert d_mu_raw < 2e-3, d_mu_raw

    # the shipped policy (cache_refresh_period=64 in BOptimizer) also holds
    gp_p, cache_p = run_horizon(gp, cache, refresh_period=64)
    d_mu, d_var = deltas(gp_p, cache_p)
    assert d_mu < 2e-3, d_mu
    assert d_var < 5e-3, d_var


def test_query_cache_build_nondivisible_capacity():
    """Regression: the scan-fallback build silently produced a garbage
    inverse when capacity was not divisible by the panel block (ragged last
    dynamic_slice clamps and duplicates rows) — e.g. capacity 1280 with the
    default block 1024.  The panel width must divide N."""
    import jax
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (900, 3), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True))
    gp = gp_mod.fit(SquaredExpARD.create(dim=3, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=1280)                  # 1280 % 1024 != 0
    cache = gp_mod.QueryCache.build(gp, with_Linv=True)
    K = gp.kernel.gram_train_masked(gp.x, gp.n)
    eye = jnp.eye(gp.capacity, dtype=dtype)
    assert float(jnp.max(jnp.abs(cache.Kinv @ K - eye))) < 1e-2
    assert float(jnp.max(jnp.abs(cache.Linv @ gp.L - eye))) < 1e-3


def test_add_sample_cached_raw_mode_rejects_linv_cache():
    """fast_update=True would install drift-prone pivots into a maintained
    inverse Cholesky factor; the API refuses instead of corrupting it."""
    import jax
    import jax.numpy as jnp
    import pytest

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    X = jax.random.uniform(jax.random.PRNGKey(0), (16, 2), dtype=dtype)
    Y = jnp.sum(X, axis=1, keepdims=True)
    gp = gp_mod.fit(SquaredExpARD.create(dim=2, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=32)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True)
    with pytest.raises(ValueError, match="Linv"):
        gp_mod.add_sample_cached(gp, cache, jnp.asarray([0.5, 0.5], dtype),
                                 jnp.asarray([1.0], dtype), fast_update=True)


def test_cached_kinv_refined_mode_drift():
    """fast_update="refined" (matvec-only + one iterative-refinement step)
    matches the solve path's drift envelope — the bench.py production mode."""
    import functools

    import jax
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    d = 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (64, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (64, 1), dtype=dtype)
    gp = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=256)
    cache = gp_mod.QueryCache.build(gp, with_K=True)
    add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                    fast_update="refined"))
    k = jax.random.PRNGKey(1)
    for _ in range(100):
        k, kx2 = jax.random.split(k)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        gp, cache = add(gp, cache, x_new, jnp.sin(3.0 * jnp.sum(x_new))[None])

    Xq = jax.random.uniform(jax.random.PRNGKey(2), (128, d), dtype=dtype)
    mu_c, var_c = gp_mod.query_cached(gp, cache, Xq)
    gp_x = gp_mod.recompute(gp)
    cache_x = gp_mod.QueryCache.build(gp_x)
    mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
    assert float(jnp.max(jnp.abs(mu_c - mu_e))) < 2e-3
    assert float(jnp.max(jnp.abs(var_c - var_e))) < 5e-3
    # the maintained K stays exact (O(n) row/col appends)
    Kex = gp.kernel.gram_train_masked(gp.x, gp.n)
    assert float(jnp.max(jnp.abs(cache.K - Kex))) < 1e-5


def test_cached_kinv_linv_mode_drift():
    """fast_update="linv" (pivot from a maintained inverse Cholesky factor)
    matches the solve path's drift envelope with the lowest HBM traffic of
    the accurate modes — no K mirror, no refinement pass."""
    import functools

    import jax
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    d = 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (64, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (64, 1), dtype=dtype)
    gp = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=256)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True)
    add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                    fast_update="linv"))
    k = jax.random.PRNGKey(1)
    for _ in range(100):
        k, kx2 = jax.random.split(k)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        gp, cache = add(gp, cache, x_new, jnp.sin(3.0 * jnp.sum(x_new))[None])

    Xq = jax.random.uniform(jax.random.PRNGKey(2), (128, d), dtype=dtype)
    mu_c, var_c = gp_mod.query_cached(gp, cache, Xq)
    gp_x = gp_mod.recompute(gp)
    cache_x = gp_mod.QueryCache.build(gp_x)
    mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
    assert float(jnp.max(jnp.abs(mu_c - mu_e))) < 2e-3
    assert float(jnp.max(jnp.abs(var_c - var_e))) < 5e-3
    # the maintained Linv stays consistent with the maintained L
    eye = jnp.eye(gp.capacity, dtype=dtype)
    assert float(jnp.max(jnp.abs(cache.Linv @ gp.L - eye))) < 1e-3


def test_f32_lml_gradient_pathology_and_f64_fix():
    """Root cause of the round-1 hp-opt accuracy regressions: on BO-like
    clustered data with noise=1e-10 the f32 LML gradient goes NaN (Cholesky
    at the f32 jitter floor), which Rprop sanitizes into zero steps — the
    optimizer silently stalls.  The f64-lifted objective
    (KernelLFOpt(objective_dtype="float64")) stays finite; the reference
    never sees this because Eigen runs f64 throughout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    rng = np.random.default_rng(0)
    X1 = rng.uniform(size=(60, 2))
    X2 = np.clip(0.55 + 0.01 * rng.standard_normal((140, 2)), 0, 1)
    X = np.vstack([X1, X2]).astype(np.float32)
    Y = (np.sin(5 * X[:, :1]) * np.cos(3 * X[:, 1:2])).astype(np.float32)

    mean = DataMean.create(dim_out=1, dtype=jnp.float32)
    k32 = SquaredExpARD.create(dim=2, noise=1e-10, dtype=jnp.float32)
    n = jnp.asarray(len(X), jnp.int32)
    x32, y32 = jnp.asarray(X), jnp.asarray(Y)

    def lml32(p):
        return gp_mod.log_marginal_likelihood(
            k32.with_params(p), mean, x32, y32, n)

    def lml64(p):
        k64 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, k32)
        return gp_mod.log_marginal_likelihood(
            k64.with_params(p.astype(jnp.float64)), mean,
            x32.astype(jnp.float64), y32.astype(jnp.float64), n)

    p = jnp.asarray(np.array([-1.0, -1.0, 0.0], dtype=np.float32))
    g32 = np.asarray(jax.grad(lml32)(p), dtype=np.float64)
    g64 = np.asarray(jax.grad(lml64)(p))
    assert not np.all(np.isfinite(g32))   # the f32 pathology is real
    assert np.all(np.isfinite(g64))       # and the f64 lift fixes it

    # the TPU-native fix: a dtype-scaled conditioning ridge on the objective
    # (objective_jitter="auto") keeps the f32 gradient finite and pointing
    # the same way as the f64 oracle — without any emulated-f64 segment
    ridge = 32.0 * float(jnp.finfo(jnp.float32).eps) * X.shape[0]

    def lml32_ridge(p):
        return gp_mod.log_marginal_likelihood(
            k32.with_params(p), mean, x32, y32, n, extra_jitter=ridge)

    gr = np.asarray(jax.grad(lml32_ridge)(p), dtype=np.float64)
    assert np.all(np.isfinite(gr))
    cos = float(gr @ g64 / (np.linalg.norm(gr) * np.linalg.norm(g64)))
    assert cos > 0.9, f"ridge gradient disagrees with f64 oracle (cos={cos})"


def test_scale_aware_numerics_large_signal_variance():
    """hp-opt legitimately learns sigma^2 ~ var(y) (thousands on wide-range
    objectives).  Every floor in the library must scale with the kernel's
    output scale or the f32 pipeline NaNs: the refit Cholesky (fixed by
    train_diag_add + the recompute escalation retry) and the rank-1 append
    pivots (fixed by relative eps*kxx clamps).  Regression test for the
    round-2 hp-opt accuracy collapse (docs/BENCHMARKS.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    rng = np.random.default_rng(3)
    X1 = rng.uniform(size=(40, 2))
    X2 = np.clip(0.55 + 0.01 * rng.standard_normal((120, 2)), 0, 1)
    X = np.vstack([X1, X2]).astype(np.float32)
    Y = 50 * (np.sin(5 * X[:, :1]) * np.cos(3 * X[:, 1:2])).astype(np.float32)

    k = SquaredExpARD.create(dim=2, noise=1e-10, dtype=jnp.float32)
    # the pathological regime measured on SixHumpCamel: sigma^2 ~ 7000,
    # short-ish length scales, clustered samples
    k = k.with_params(jnp.asarray([-0.65, -1.3, 4.43], jnp.float32))
    g = gp_mod.fit(k, DataMean.create(dim_out=1, dtype=jnp.float32), X, Y,
                   capacity=256)
    assert bool(jnp.all(jnp.isfinite(g.L)))
    assert bool(jnp.all(jnp.isfinite(g.alpha)))

    # 60 clustered rank-1 appends on top must stay finite (old absolute
    # pivot floors overflowed L after ~40)
    key = jax.random.PRNGKey(0)
    add = jax.jit(gp_mod.add_sample)
    for i in range(60):
        key, kx = jax.random.split(key)
        x_new = 0.55 + 0.01 * jax.random.normal(kx, (2,), dtype=jnp.float32)
        y_new = 50 * jnp.sin(5 * x_new[:1]) * jnp.cos(3 * x_new[1:])
        g = add(g, x_new, y_new)
    assert bool(jnp.all(jnp.isfinite(g.L)))
    mu, var = gp_mod.query(g, jnp.asarray([[0.3, 0.7]], jnp.float32))
    assert bool(jnp.isfinite(mu[0, 0])) and bool(jnp.isfinite(var[0]))

    # escalation retry: an adversarial kernel state (huge sigma^2, long
    # ells -> numerically indefinite in f32) must still produce a finite,
    # usable factorization rather than NaNs
    k_bad = k.with_params(jnp.asarray([2.0, 2.0, 6.0], jnp.float32))
    g_bad = gp_mod.fit(k_bad, DataMean.create(dim_out=1, dtype=jnp.float32),
                       X, Y, capacity=256)
    assert bool(jnp.all(jnp.isfinite(g_bad.L)))
    assert bool(jnp.all(jnp.isfinite(g_bad.alpha)))


def test_cached_deferred_matches_linv():
    """fast_update="deferred" is the SAME math as "linv" with the N x N
    Kinv/mirror rewrite amortized: queries and alpha must agree step by
    step, including across flush boundaries (m=4 over 13 appends)."""
    import functools

    dtype = jnp.float32
    d = 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (24, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (24, 1), dtype=dtype)
    gp0 = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=dtype),
                     DataMean.create(dim_out=1, dtype=dtype), X, Y,
                     capacity=64)
    c_linv = gp_mod.QueryCache.build(gp0, with_Linv=True)
    c_def = gp_mod.QueryCache.build(gp0, with_Linv=True, defer_m=4)
    add_l = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                      fast_update="linv"))
    add_d = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                      fast_update="deferred"))
    gp_l, gp_d = gp0, gp0
    Xq = jax.random.uniform(jax.random.PRNGKey(2), (32, d), dtype=dtype)
    k = jax.random.PRNGKey(1)
    for step in range(13):
        k, kx2 = jax.random.split(k)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        y_new = jnp.sin(3.0 * jnp.sum(x_new))[None]
        gp_l, c_linv = add_l(gp_l, c_linv, x_new, y_new)
        gp_d, c_def = add_d(gp_d, c_def, x_new, y_new)
        mu_l, var_l = gp_mod.query_cached(gp_l, c_linv, Xq)
        mu_d, var_d = gp_mod.query_cached(gp_d, c_def, Xq)
        # f32 summation-order differences only (the flush re-derives from
        # one GEMM where linv materialized 4 sequential rank-1 passes)
        assert float(jnp.max(jnp.abs(mu_l - mu_d))) < 5e-4, step
        assert float(jnp.max(jnp.abs(var_l - var_d))) < 5e-4, step
        assert float(jnp.max(jnp.abs(gp_l.alpha - gp_d.alpha))) < 2e-3, step
    # maintained Linv identical in both modes
    assert float(jnp.max(jnp.abs(c_linv.Linv - c_def.Linv))) == 0.0
    # pending count bookkeeping: 13 appends with m=4 -> 1 pending
    assert int(gp_d.n - c_def.base_n) == 1


def test_cached_deferred_drift_and_gradient():
    """100-append f32 drift of the deferred mode matches the linv envelope,
    and gradient ascent through the corrected quadratic form (custom VJP)
    agrees with autodiff through the exact materialized cache."""
    import functools

    dtype = jnp.float32
    d = 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (64, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (64, 1), dtype=dtype)
    gp = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=256)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True, defer_m=8)
    add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                    fast_update="deferred"))
    k = jax.random.PRNGKey(1)
    for _ in range(100):
        k, kx2 = jax.random.split(k)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        gp, cache = add(gp, cache, x_new, jnp.sin(3.0 * jnp.sum(x_new))[None])

    Xq = jax.random.uniform(jax.random.PRNGKey(2), (128, d), dtype=dtype)
    mu_c, var_c = gp_mod.query_cached(gp, cache, Xq)
    gp_x = gp_mod.recompute(gp)
    cache_x = gp_mod.QueryCache.build(gp_x)
    mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
    assert float(jnp.max(jnp.abs(mu_c - mu_e))) < 2e-3
    assert float(jnp.max(jnp.abs(var_c - var_e))) < 5e-3

    # gradient through the pending-correction query (custom VJP) vs
    # autodiff through the exact rebuilt cache
    def v_def(x):
        return gp_mod.query_cached(gp, cache, x[None, :])[1][0]

    def v_exact(x):
        return gp_mod.query_cached(gp_x, cache_x, x[None, :])[1][0]

    x0 = Xq[0]
    g_def = jax.grad(v_def)(x0)
    g_exact = jax.grad(v_exact)(x0)
    assert float(jnp.max(jnp.abs(g_def - g_exact))) < 5e-3


def test_cached_deferred_guards():
    """Mode/cache consistency is enforced at trace time: deferred needs the
    Linv+P cache; immediate modes refuse a deferred cache; FunctionARD's
    x-dependent mean is rejected (alpha recurrence needs a constant-type
    mean)."""
    from limbo_tpu.means import FunctionARD

    dtype = jnp.float32
    X = jnp.linspace(0.0, 1.0, 8, dtype=dtype)[:, None]
    Y = jnp.sin(3.0 * X)
    kern = SquaredExpARD.create(dim=1, dtype=dtype)
    gp = gp_mod.fit(kern, DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=16)
    x_new = jnp.asarray([0.5], dtype=dtype)
    y_new = jnp.asarray([0.0], dtype=dtype)

    plain = gp_mod.QueryCache.build(gp, with_Linv=True)      # no defer_m
    with pytest.raises(ValueError):
        gp_mod.add_sample_cached(gp, plain, x_new, y_new,
                                 fast_update="deferred")
    deferred = gp_mod.QueryCache.build(gp, with_Linv=True, defer_m=4)
    with pytest.raises(ValueError):
        gp_mod.add_sample_cached(gp, deferred, x_new, y_new,
                                 fast_update="linv")
    fard = FunctionARD.create(NullMean(), dim_out=1, dtype=dtype)
    gp_f = gp_mod.fit(kern, fard, X, Y, capacity=16)
    cache_f = gp_mod.QueryCache.build(gp_f, with_Linv=True, defer_m=4)
    with pytest.raises(ValueError):
        gp_mod.add_sample_cached(gp_f, cache_f, x_new, y_new,
                                 fast_update="deferred")


def test_cached_deferred_lite_matches_full():
    """The lite cache (no f32 master; mirror updated in place at flushes)
    tracks the full deferred cache to mirror-dtype tolerance, with a third
    less N x N memory."""
    import functools

    dtype = jnp.float32
    d = 3
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (48, d), dtype=dtype)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (48, 1), dtype=dtype)
    gp0 = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=dtype),
                     DataMean.create(dim_out=1, dtype=dtype), X, Y,
                     capacity=128)
    # f32 "mirror" lite cache: must match the full deferred cache to f32
    # round-off (the lite flush adds one f32 rounding per window)
    c_full = gp_mod.QueryCache.build(gp0, with_Linv=True, defer_m=4)
    c_lite = gp_mod.QueryCache.build(gp0, with_Linv=True, defer_m=4,
                                     lite=True)
    assert c_lite.Kinv is None and c_lite.Kinv_q.dtype == dtype
    add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                    fast_update="deferred"))
    gp_f, gp_l = gp0, gp0
    Xq = jax.random.uniform(jax.random.PRNGKey(2), (32, d), dtype=dtype)
    k = jax.random.PRNGKey(1)
    for step in range(11):                  # crosses two flush boundaries
        k, kx2 = jax.random.split(k)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        y_new = jnp.sin(3.0 * jnp.sum(x_new))[None]
        gp_f, c_full = add(gp_f, c_full, x_new, y_new)
        gp_l, c_lite = add(gp_l, c_lite, x_new, y_new)
        mu_f, var_f = gp_mod.query_cached(gp_f, c_full, Xq)
        mu_l, var_l = gp_mod.query_cached(gp_l, c_lite, Xq)
        assert float(jnp.max(jnp.abs(mu_f - mu_l))) < 5e-4, step
        assert float(jnp.max(jnp.abs(var_f - var_l))) < 5e-4, step

    # bf16 lite mirror: still within the bf16 query tolerance of the exact
    # rebuilt posterior after 100 appends
    gp_b = gp0
    c_b = gp_mod.QueryCache.build(gp0, with_Linv=True, defer_m=8,
                                  lite=True, qdtype=jnp.bfloat16)
    assert c_b.Kinv_q.dtype == jnp.bfloat16
    kk = jax.random.PRNGKey(3)
    for _ in range(60):
        kk, kx2 = jax.random.split(kk)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        gp_b, c_b = add(gp_b, c_b, x_new,
                        jnp.sin(3.0 * jnp.sum(x_new))[None])
    # the real invariant: lite-bf16 state == full-deferred-bf16 state (same
    # trajectory); both carry the same bounded bf16 mirror quantization
    gp_fb = gp0
    c_fb = gp_mod.QueryCache.build(gp0, with_Linv=True, defer_m=8,
                                   qdtype=jnp.bfloat16)
    kk = jax.random.PRNGKey(3)
    for _ in range(60):
        kk, kx2 = jax.random.split(kk)
        x_new = jax.random.uniform(kx2, (d,), dtype=dtype)
        gp_fb, c_fb = add(gp_fb, c_fb, x_new,
                          jnp.sin(3.0 * jnp.sum(x_new))[None])
    assert float(jnp.max(jnp.abs(
        c_b.Kinv_q.astype(dtype) - c_fb.Kinv_q.astype(dtype)))) < 1e-4
    assert float(jnp.max(jnp.abs(c_b.ay - c_fb.ay))) < 1e-3
    gp_x = gp_mod.recompute(gp_b)
    cache_x = gp_mod.QueryCache.build(gp_x)
    mu_e, var_e = gp_mod.query_cached(gp_x, cache_x, Xq)
    mu_b, var_b = gp_mod.query_cached(gp_b, c_b, Xq)
    assert float(jnp.max(jnp.abs(mu_b - mu_e))) < 2e-3
    # variance through a bf16 mirror carries ~2^-9-relative quantization of
    # the quadratic form (bounded, non-compounding; see QueryCache.Kinv_q)
    assert float(jnp.max(jnp.abs(var_b - var_e))) < 1e-1

    with pytest.raises(ValueError):
        gp_mod.QueryCache.build(gp0, with_Linv=True, lite=True)  # no defer_m
