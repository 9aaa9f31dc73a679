"""Acquisition-function unit tests: closed forms vs independent computation.

(The reference exercises acquisitions only through BO integration tests;
these check the formulas directly, incl. EI vs Monte Carlo.)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.acqui import EI, GP_UCB, UCB, DistanceToTarget, FirstElem
from limbo_tpu.kernels import Exp
from limbo_tpu.means import NullMean
from limbo_tpu.models import gp as gp_mod

F64 = jnp.float64


def make_gp(rng, n=10):
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    Y = jnp.asarray(np.sin(6 * np.asarray(X)))
    return gp_mod.fit(Exp.create(l=0.2, dtype=F64), NullMean(), X, Y,
                      capacity=16)


def test_ucb_formula(rng):
    gp = make_gp(rng)
    x = jnp.asarray([0.37], dtype=F64)
    mu, var = gp_mod.query(gp, x[None, :])
    expected = float(mu[0, 0]) + 0.5 * math.sqrt(float(var[0]))
    got = float(UCB(alpha=0.5)(gp, x, FirstElem, 3))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_gp_ucb_beta(rng):
    """beta = sqrt(2 log(t^(D/2+2) pi^2 / (3 delta))) (gp_ucb.hpp:85-89)."""
    gp = make_gp(rng)
    x = jnp.asarray([0.42], dtype=F64)
    t, delta, D = 7, 0.1, 1
    mu, var = gp_mod.query(gp, x[None, :])
    beta = math.sqrt(2 * math.log(t ** (D / 2 + 2) * math.pi ** 2
                                  / (3 * delta)))
    expected = float(mu[0, 0]) + beta * math.sqrt(float(var[0]))
    got = float(GP_UCB(delta=delta)(gp, x, FirstElem, t))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_ei_matches_monte_carlo(rng):
    gp = make_gp(rng)
    x = jnp.asarray([0.53], dtype=F64)
    ei = EI(jitter=0.0)
    got = float(ei(gp, x, FirstElem, 0))
    mu, var = gp_mod.query(gp, x[None, :])
    f_max = float(ei.best_predicted(gp, FirstElem))
    draws = (float(mu[0, 0])
             + math.sqrt(float(var[0])) * rng.standard_normal(2_000_000))
    mc = np.maximum(draws - f_max, 0.0).mean()
    np.testing.assert_allclose(got, mc, rtol=0.02, atol=1e-5)


def test_ei_zero_variance_is_zero(rng):
    gp = make_gp(rng)
    # a training point has ~zero variance -> EI returns 0 (ei.hpp:95-97)
    x = gp.x[0]
    got = float(EI()(gp, x, FirstElem, 0))
    assert abs(got) < 1e-6


def test_ei_on_empty_gp_is_zero():
    gp = gp_mod.empty(Exp.create(dtype=F64), NullMean(), dim_in=1,
                      capacity=16, dtype=F64)
    got = float(EI()(gp, jnp.asarray([0.5], dtype=F64), FirstElem, 0))
    assert got == 0.0


def test_acquisitions_differentiable(rng):
    """Unlike limbo (assert(!gradient)), our acquisitions have gradients."""
    gp = make_gp(rng)
    for acq in [UCB(0.5), GP_UCB(), EI()]:
        g = jax.grad(lambda x: acq(gp, x, FirstElem, 3))(
            jnp.asarray([0.37], dtype=F64))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g[0])) > 0


def test_distance_to_target():
    agg = DistanceToTarget([1.0, 2.0])
    v = float(agg(jnp.asarray([1.0, 2.0])))
    np.testing.assert_allclose(v, -1e-6, atol=1e-5)
    assert float(agg(jnp.asarray([3.0, 2.0]))) < -1.9


def test_gp_ucb_finite_at_iteration_zero(rng):
    """limbo's beta formula NaNs at t=0 (log 0); ours floors beta at 0."""
    gp = make_gp(rng)
    v = float(GP_UCB()(gp, jnp.asarray([0.4], dtype=F64), FirstElem, 0))
    assert np.isfinite(v)
