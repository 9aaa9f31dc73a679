"""q-EI batch acquisition tests: q=1 reduces to EI (MC), batches improve on
singletons, joint proposal machinery is jit-safe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.acqui import EI, FirstElem
from limbo_tpu.acqui.qei import QEI, joint_posterior, propose_batch
from limbo_tpu.kernels import Exp
from limbo_tpu.means import NullMean
from limbo_tpu.models import gp as gp_mod

F64 = jnp.float64


def make_gp(rng, n=12):
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    Y = jnp.asarray(np.sin(6 * np.asarray(X)))
    return gp_mod.fit(Exp.create(l=0.2, dtype=F64), NullMean(), X, Y,
                      capacity=16)


def test_joint_posterior_diag_matches_query(rng):
    gp = make_gp(rng)
    Xb = jnp.asarray(rng.uniform(size=(4, 1)))
    mu_j, cov = joint_posterior(gp, Xb)
    mu_q, var_q = gp_mod.query(gp, Xb)
    np.testing.assert_allclose(np.asarray(mu_j), np.asarray(mu_q[:, 0]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(cov)),
                               np.asarray(var_q), atol=2e-6)
    # PSD
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert evals.min() > -1e-9


def test_q1_matches_ei(rng):
    gp = make_gp(rng)
    x = jnp.asarray([[0.47]], dtype=F64)
    base = jax.random.normal(jax.random.PRNGKey(0), (200_000, 1), dtype=F64)
    got = float(QEI()(gp, x, base, FirstElem))
    want = float(EI()(gp, x[0], FirstElem, 0))
    np.testing.assert_allclose(got, want, rtol=0.03, atol=1e-4)


def test_qei_batch_dominates_singleton(rng):
    """qEI of a diverse pair >= EI of either point (monotone in batch)."""
    gp = make_gp(rng)
    base2 = jax.random.normal(jax.random.PRNGKey(1), (50_000, 2), dtype=F64)
    base1 = base2[:, :1]
    xa, xb = jnp.asarray([[0.3]], dtype=F64), jnp.asarray([[0.8]], dtype=F64)
    pair = jnp.concatenate([xa, xb])
    q = QEI()
    v_pair = float(q(gp, pair, base2))
    v_a = float(q(gp, xa, base1))
    v_b = float(q(gp, xb, base1))
    assert v_pair >= max(v_a, v_b) - 1e-4


def test_propose_batch(rng):
    gp = make_gp(rng)
    Xb, val = jax.jit(lambda gp, k: propose_batch(gp, 3, k, restarts=6,
                                                  steps=15))(
        gp, jax.random.PRNGKey(2))
    assert Xb.shape == (3, 1)
    a = np.asarray(Xb)
    assert np.all(a >= 0) and np.all(a <= 1)
    assert float(val) >= 0


def test_boptimizer_batch_loop():
    """propose_batch is reachable from the BO driver (batch BO rounds)."""
    import jax
    import numpy as np

    from limbo_tpu.bo.init_designs import RandomSampling
    from limbo_tpu.bo.optimizer import BOptimizer
    from limbo_tpu.bo.stop import MaxIterations

    def f(x):
        return np.array([-np.sum((np.atleast_1d(x) - 0.4) ** 2)])

    bo = BOptimizer(init=RandomSampling(5), stop=(MaxIterations(4),),
                    stats_enabled=False)
    state = bo.optimize_batch(f, dim_in=1, q=3, key=jax.random.PRNGKey(0),
                              restarts=8, steps=15)
    assert int(state.gp.n) == 5 + 4 * 3
    assert state.best_value > -0.05
