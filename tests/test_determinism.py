"""Determinism: same seed -> same trajectory (the functional-purity
replacement for the reference's thread-safety-by-construction story,
SURVEY section 5: keep determinism tests instead of race detection)."""

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui import UCB
from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling
from limbo_tpu.opt import Cmaes, RandomRestarts, Rprop

F64 = jnp.float64


def quad(x):
    return np.array([-np.sum((np.asarray(x) - 0.4) ** 2)])


def run(seed):
    bo = BOptimizer(acqui=UCB(0.5), init=RandomSampling(5),
                    stop=(MaxIterations(8),),
                    acqui_optimizer=RandomRestarts(sub=Rprop(iterations=25),
                                                   repeats=4,
                                                   sweep_samples=64),
                    stats_enabled=False, dtype=F64)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(seed))
    n = int(state.gp.n)
    return np.asarray(state.gp.x[:n])


def test_same_seed_same_trajectory():
    a = run(123)
    b = run(123)
    np.testing.assert_array_equal(a, b)


def test_different_seed_differs():
    a = run(123)
    c = run(124)
    assert not np.array_equal(a, c)


def test_cmaes_deterministic():
    f = lambda x: -jnp.sum((x - 0.5) ** 2)
    opt = Cmaes(iterations=30)
    r1 = opt(f, jnp.full((2,), 0.2), jax.random.PRNGKey(7), True)
    r2 = opt(f, jnp.full((2,), 0.2), jax.random.PRNGKey(7), True)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
