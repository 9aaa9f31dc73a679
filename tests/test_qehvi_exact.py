"""Exact multi-point EHVI (ops/ehvi.py: ehvi_max_batch, qehvi_exact_max).

Capability parity: src/ehvi/ehvi_multi.cc:13,100 evaluates exact EHVI for a
whole population of Gaussian PDFs over one shared front sweep; here the
batched evaluator shares one box decomposition, and the joint q-EHVI extends
it to exact batch proposals (closed form for singleton subsets,
Gauss-Hermite over the true joint covariance for larger ones).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.ops.ehvi import (ehvi_max, ehvi_max_batch, qehvi_exact_max,
                                qehvi_mc_max)

F = jnp.float64


def front_2d():
    front = jnp.asarray([[0.2, 0.9], [0.5, 0.6], [0.8, 0.2]], F)
    ref = jnp.asarray([0.0, 0.0], F)
    return front, ref


def front_3d():
    front = jnp.asarray([[0.2, 0.9, 0.5], [0.5, 0.6, 0.7], [0.8, 0.2, 0.4]],
                        F)
    ref = jnp.asarray([0.0, 0.0, 0.0], F)
    return front, ref


def mc_oracle(key, mu, cov, front, ref, n_mc=400_000):
    """Joint-sampling MC oracle for q-EHVI: per objective m, draw the q
    candidate values jointly from N(mu[:, m], cov[m])."""
    q, p = mu.shape
    eps = jax.random.normal(key, (n_mc, p, q), dtype=F)
    Ls = jnp.linalg.cholesky(cov)                          # (p, q, q)
    draws = mu.T[None] + jnp.einsum("pqr,spr->spq", Ls, eps)  # (s, p, q)
    Y = jnp.swapaxes(draws, 1, 2)                          # (s, q, p)
    # qehvi_mc_max is exact per sample; chunk to bound memory
    vals = []
    for c in range(0, n_mc, 50_000):
        vals.append(qehvi_mc_max(Y[c:c + 50_000], front, ref))
    return float(jnp.mean(jnp.asarray(vals)))


@pytest.mark.parametrize("make_front", [front_2d, front_3d])
def test_batch_matches_single_point(make_front):
    front, ref = make_front()
    p = front.shape[1]
    key = jax.random.PRNGKey(0)
    mus = 0.3 + 0.6 * jax.random.uniform(key, (5, p), dtype=F)
    sigmas = jnp.full((5, p), 0.15, F)
    batched = ehvi_max_batch(mus, sigmas, front, ref)
    singles = jnp.stack([ehvi_max(mus[i], sigmas[i], front, ref)
                         for i in range(5)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(singles),
                               rtol=1e-12)


@pytest.mark.parametrize("make_front", [front_2d, front_3d])
def test_qehvi_q1_equals_single_point_exact(make_front):
    front, ref = make_front()
    p = front.shape[1]
    mu = jnp.full((1, p), 0.55, F)
    sigma = jnp.full((p,), 0.2, F)
    cov = (sigma ** 2)[:, None, None] * jnp.ones((p, 1, 1), F)
    exact_q1 = qehvi_exact_max(mu, cov, front, ref)
    single = ehvi_max(mu[0], sigma, front, ref)
    np.testing.assert_allclose(float(exact_q1), float(single), rtol=1e-12)


@pytest.mark.parametrize("rho", [0.0, 0.7, -0.5])
def test_qehvi_q2_2d_matches_mc_oracle(rho):
    front, ref = front_2d()
    mu = jnp.asarray([[0.55, 0.55], [0.75, 0.35]], F)
    s = jnp.asarray([[0.15, 0.2], [0.2, 0.15]], F)     # (q, p) stddevs
    cov = jnp.stack([
        jnp.asarray([[s[0, m] ** 2, rho * s[0, m] * s[1, m]],
                     [rho * s[0, m] * s[1, m], s[1, m] ** 2]], F)
        for m in range(2)])
    exact = float(qehvi_exact_max(mu, cov, front, ref, gh_nodes=32))
    oracle = mc_oracle(jax.random.PRNGKey(3), mu, cov, front, ref)
    assert exact > 0.0
    np.testing.assert_allclose(exact, oracle, rtol=2e-2)


def test_qehvi_q2_3d_matches_mc_oracle():
    front, ref = front_3d()
    mu = jnp.asarray([[0.6, 0.6, 0.6], [0.85, 0.3, 0.5]], F)
    s = 0.18 * jnp.ones((2, 3), F)
    rho = 0.4
    cov = jnp.stack([
        jnp.asarray([[s[0, m] ** 2, rho * s[0, m] * s[1, m]],
                     [rho * s[0, m] * s[1, m], s[1, m] ** 2]], F)
        for m in range(3)])
    exact = float(qehvi_exact_max(mu, cov, front, ref, gh_nodes=32))
    oracle = mc_oracle(jax.random.PRNGKey(5), mu, cov, front, ref,
                       n_mc=400_000)
    assert exact > 0.0
    np.testing.assert_allclose(exact, oracle, rtol=3e-2)


def test_qehvi_correlation_matters():
    """The exact evaluator must honor the joint covariance: perfectly
    correlated duplicates add (almost) nothing over one point; independent
    duplicates do."""
    front, ref = front_2d()
    mu = jnp.asarray([[0.55, 0.55], [0.55, 0.55]], F)
    s2 = 0.04
    eye = jnp.eye(2, dtype=F)
    cov_ind = jnp.stack([s2 * eye, s2 * eye])
    rho = 0.999
    c = jnp.asarray([[s2, rho * s2], [rho * s2, s2]], F)
    cov_cor = jnp.stack([c, c])
    single = float(ehvi_max(mu[0], jnp.sqrt(jnp.full((2,), s2, F)),
                            front, ref))
    v_ind = float(qehvi_exact_max(mu, cov_ind, front, ref, gh_nodes=32))
    v_cor = float(qehvi_exact_max(mu, cov_cor, front, ref, gh_nodes=32))
    assert v_ind > 1.15 * single          # two independent tries help
    assert abs(v_cor - single) < 0.05 * single  # clones don't


def test_qehvi_q3_superadditive_and_bounded():
    """q=3 sanity: batch EHVI at least the best singleton, at most the sum
    of singletons (union bound), and monotone in q."""
    front, ref = front_2d()
    mu = jnp.asarray([[0.55, 0.55], [0.75, 0.35], [0.3, 0.8]], F)
    s = jnp.full((3, 2), 0.15, F)
    cov = jnp.stack([jnp.diag(s[:, m] ** 2) for m in range(2)])
    singles = np.asarray(ehvi_max_batch(mu, s, front, ref))
    v3 = float(qehvi_exact_max(mu, cov, front, ref, gh_nodes=16))
    v2 = float(qehvi_exact_max(mu[:2], cov[:, :2, :2], front, ref,
                               gh_nodes=16))
    assert v3 >= v2 - 1e-9
    assert v3 >= singles.max() - 1e-9
    assert v3 <= singles.sum() + 1e-9


def test_ehvi_batch_loop_proposes_q_points():
    """End-to-end: the Ehvi loop in batch mode adds q points per iteration
    and still improves the front hypervolume on a toy biobjective."""
    from limbo_tpu.bo.multi import Ehvi
    from limbo_tpu.bo.stop import MaxIterations
    from limbo_tpu.opt.gradient import Rprop

    def f(x):
        # concave front: maximize both objectives on [0,1]
        t = float(np.clip(x[0], 0, 1))
        return np.asarray([np.sin(0.5 * np.pi * t),
                           np.cos(0.5 * np.pi * t)])

    loop = Ehvi(ref=(-0.1, -0.1), q=2, gh_nodes=8,
                inner_opt=Rprop(iterations=15),
                stop=(MaxIterations(3),), stats_enabled=False)
    Xp, Yp = loop.optimize(f, dim=2, key=jax.random.PRNGKey(0))
    assert len(loop.X) == 10 + 3 * 2           # init + q per iteration
    assert Yp.shape[1] == 2 and len(Yp) >= 1
