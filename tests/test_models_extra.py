"""MultiGP / SparsifiedGP / SPGP tests (mirrors test_gp.cpp:760-1146).

- MultiGP agrees with independent per-output GPs; per-output hp-opt works
- SparsifiedGP keeps <= max_points and stays close to the full GP
- SPGP trains (NLML decreases) and predicts reasonably
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import Exp, SquaredExpARD
from limbo_tpu.means import ConstantMean, DataMean, NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.models import multi_gp, sparse_gp, spgp
from limbo_tpu.models.hp_opt import KernelLFOpt
from limbo_tpu.opt import Rprop

F64 = jnp.float64


def test_multi_gp_matches_independent_gps(rng):
    X = jnp.asarray(rng.uniform(size=(15, 2)))
    Y = jnp.asarray(rng.normal(size=(15, 3)))
    kern = Exp.create(l=0.3, dtype=F64)
    m = multi_gp.fit(kern, NullMean(dim_out=3), X, Y, capacity=32)
    mu, var = multi_gp.query(m, X)
    assert mu.shape == (15, 3) and var.shape == (15, 3)
    for j in range(3):
        g = gp_mod.fit(kern, NullMean(), X, Y[:, j:j + 1], capacity=32)
        mu_j, var_j = gp_mod.query(g, X)
        np.testing.assert_allclose(np.asarray(mu[:, j]),
                                   np.asarray(mu_j[:, 0]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(var[:, j]),
                                   np.asarray(var_j), atol=1e-8)


def test_multi_gp_data_mean(rng):
    """Wrapper-level DataMean matches single GP with DataMean per output."""
    X = jnp.asarray(rng.uniform(size=(12, 2)))
    Y = jnp.asarray(rng.normal(size=(12, 2)) + 5.0)
    kern = Exp.create(l=0.3, dtype=F64)
    m = multi_gp.fit(kern, DataMean.create(dim_out=2, dtype=F64), X, Y,
                     capacity=32)
    mu, _ = multi_gp.query(m, X)
    for j in range(2):
        g = gp_mod.fit(kern, DataMean.create(dim_out=1, dtype=F64),
                       X, Y[:, j:j + 1], capacity=32)
        mu_j, _ = gp_mod.query(g, X)
        np.testing.assert_allclose(np.asarray(mu[:, j]),
                                   np.asarray(mu_j[:, 0]), atol=1e-8)


def test_multi_gp_add_sample(rng):
    X = jnp.asarray(rng.uniform(size=(10, 2)))
    Y = jnp.asarray(rng.normal(size=(10, 2)))
    kern = Exp.create(l=0.3, dtype=F64)
    mean = ConstantMean.create(0.5, dim_out=2, dtype=F64)
    m = multi_gp.fit(kern, mean, X, Y, capacity=32)
    xn = jnp.asarray(rng.uniform(size=2))
    yn = jnp.asarray(rng.normal(size=2))
    m2 = multi_gp.add_sample(m, xn, yn)
    ref = multi_gp.fit(kern, mean, jnp.vstack([X, xn[None]]),
                       jnp.vstack([Y, yn[None]]), capacity=32)
    Xq = jnp.asarray(rng.uniform(size=(6, 2)))
    mu_a, var_a = multi_gp.query(m2, Xq)
    mu_r, var_r = multi_gp.query(ref, Xq)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_r), atol=1e-8)


def test_multi_gp_parallel_hp_opt(rng):
    X = jnp.asarray(rng.uniform(size=(25, 1)))
    Y = jnp.concatenate([jnp.cos(6 * X), jnp.sin(4 * X)], axis=1)
    kern = SquaredExpARD.create(dim=1, dtype=F64)
    m = multi_gp.fit(kern, NullMean(dim_out=2), X, Y, capacity=32)
    ll0 = jax.vmap(gp_mod.log_lik)(m.gps)
    opt = multi_gp.ParallelLFOpt(hp_opt=KernelLFOpt(Rprop(iterations=80)))
    m2 = opt(m, jax.random.PRNGKey(0))
    ll1 = jax.vmap(gp_mod.log_lik)(m2.gps)
    assert np.all(np.asarray(ll1) >= np.asarray(ll0) - 1e-9)
    # per-output kernels have diverged (independent optimization)
    assert not np.allclose(np.asarray(m2.gps.kernel.log_ell[0]),
                           np.asarray(m2.gps.kernel.log_ell[1]))


def test_sparsified_gp_budget(rng):
    X = jnp.asarray(rng.uniform(size=(60, 2)))
    Y = jnp.asarray(np.sin(3 * np.asarray(X).sum(1, keepdims=True)))
    sgp = sparse_gp.fit(Exp.create(l=0.3, dtype=F64), NullMean(), X, Y,
                        max_points=30, capacity=64)
    assert int(sgp.gp.n) == 30
    # accuracy close to full GP away from removed dense regions
    full = gp_mod.fit(Exp.create(l=0.3, dtype=F64), NullMean(), X, Y)
    Xq = jnp.asarray(rng.uniform(size=(20, 2)))
    mu_s, _ = gp_mod.query(sgp.gp, Xq)
    mu_f, _ = gp_mod.query(full, Xq)
    # limbo's test allows 2e-2 deviation from the full GP (test_gp.cpp:815)
    assert float(jnp.max(jnp.abs(mu_s - mu_f))) < 0.15


def test_sparsified_gp_add_sample_triggers_resparsify(rng):
    X = jnp.asarray(rng.uniform(size=(20, 2)))
    Y = jnp.asarray(rng.normal(size=(20, 1)))
    sgp = sparse_gp.fit(Exp.create(l=0.3, dtype=F64), NullMean(), X, Y,
                        max_points=20, capacity=64)
    assert int(sgp.gp.n) == 20
    sgp2 = sparse_gp.add_sample(sgp, jnp.asarray(rng.uniform(size=2)),
                                jnp.asarray(rng.normal(size=1)))
    assert int(sgp2.gp.n) == 20   # re-sparsified back to budget


def test_sparsify_keeps_spread_points():
    """Removing densest first: a tight cluster collapses before spread points
    are touched."""
    X = jnp.asarray(np.vstack([
        np.array([[0.5, 0.5]]) + 1e-3 * np.random.default_rng(0).normal(size=(10, 2)),
        np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]),
    ]))
    Y = jnp.zeros((14, 1), dtype=F64)
    Xc, Yc, n = sparse_gp.sparsify(
        jnp.asarray(X, dtype=F64), Y, jnp.asarray(14), 5)
    kept = np.asarray(Xc[:5])
    # all 4 corners survive
    for corner in [[0, 0], [1, 0], [0, 1], [1, 1]]:
        assert np.min(np.abs(kept - np.asarray(corner)).sum(1)) < 1e-9


def test_spgp_trains_and_predicts(rng):
    n = 60
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    Y = jnp.asarray(np.cos(5 * np.asarray(X)) + 0.05 * rng.normal(size=(n, 1)))
    kern = SquaredExpARD.create(dim=1, noise=0.01, dtype=F64)
    sp = spgp.fit(kern, NullMean(), X, Y, m=10)
    nlml0 = float(spgp.neg_log_marginal_likelihood(
        sp.kernel, sp.mean, sp.xb, sp.x, sp.y, sp.n))
    sp2 = jax.jit(spgp.SPGPHpOpt(optimizer=Rprop(iterations=100)))(
        sp, jax.random.PRNGKey(1))
    nlml1 = float(spgp.neg_log_marginal_likelihood(
        sp2.kernel, sp2.mean, sp2.xb, sp2.x, sp2.y, sp2.n))
    assert nlml1 < nlml0
    Xq = jnp.linspace(0, 1, 40, dtype=F64)[:, None]
    mu, var = spgp.query(sp2, Xq)
    np.testing.assert_allclose(np.asarray(mu[:, 0]),
                               np.cos(5 * np.asarray(Xq[:, 0])), atol=0.2)
    assert np.all(np.asarray(var) >= 0)


def test_spgp_nlml_grad_finite(rng):
    n = 20
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    Y = jnp.asarray(rng.normal(size=(n, 1)))
    kern = SquaredExpARD.create(dim=2, dtype=F64)
    sp = spgp.fit(kern, NullMean(), X, Y, m=5)

    def f(xb):
        return spgp.neg_log_marginal_likelihood(
            sp.kernel, sp.mean, xb, sp.x, sp.y, sp.n)

    g = jax.grad(f)(sp.xb)
    assert np.all(np.isfinite(np.asarray(g)))
    # FD check on one coordinate
    eps = 1e-6
    e = jnp.zeros_like(sp.xb).at[0, 0].set(eps)
    fd = (f(sp.xb + e) - f(sp.xb - e)) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=1e-4, atol=1e-6)


def test_iterative_gp_matches_exact(rng):
    """CG-based GP agrees with the Cholesky GP (same kernel/noise)."""
    from limbo_tpu.models import iterative

    X = jnp.asarray(rng.uniform(size=(40, 2)))
    Y = jnp.asarray(np.sin(3 * np.asarray(X).sum(1, keepdims=True)))
    kern = Exp.create(l=0.3, dtype=F64)
    exact = gp_mod.fit(kern, NullMean(), X, Y, capacity=64)
    it = iterative.fit(kern, NullMean(), X, Y, capacity=64, block=16,
                       cg_tol=1e-10, cg_maxiter=500)
    Xq = jnp.asarray(rng.uniform(size=(10, 2)))
    mu_e, var_e = gp_mod.query(exact, Xq)
    mu_i, var_i = iterative.query(it, Xq)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_e),
                               atol=1e-6)


def test_iterative_gp_data_mean(rng):
    from limbo_tpu.models import iterative

    X = jnp.asarray(rng.uniform(size=(30, 1)))
    Y = jnp.asarray(5.0 + np.cos(4 * np.asarray(X)))
    kern = Exp.create(l=0.3, dtype=F64)
    exact = gp_mod.fit(kern, DataMean.create(dtype=F64), X, Y, capacity=64)
    it = iterative.fit(kern, DataMean.create(dtype=F64), X, Y, capacity=64,
                       block=32, cg_tol=1e-10, cg_maxiter=500)
    Xq = jnp.asarray(rng.uniform(size=(7, 1)))
    np.testing.assert_allclose(np.asarray(iterative.query(it, Xq)[0]),
                               np.asarray(gp_mod.query(exact, Xq)[0]),
                               atol=1e-6)
