"""f64 NumPy oracle (the regression suite's external baseline): gradient
correctness vs finite differences (the reference's signature test technique,
src/tests/test_gp.cpp:73-99) and sane accuracy."""

import numpy as np

from limbo_tpu.benchmarks import oracle
from limbo_tpu.benchmarks.oracle import _nll_and_grad


def test_oracle_lml_gradient_matches_fd(rng):
    X = rng.uniform(size=(40, 2))
    Y = np.sin(3 * X[:, :1]) + 0.01 * rng.standard_normal((40, 1))
    p = np.array([0.2, -0.3, 0.1, np.log(0.05)])
    _, g, _, _ = _nll_and_grad(p, X, Y, True)
    for j in range(len(p)):
        e = np.zeros_like(p)
        e[j] = 1e-6
        fd = (_nll_and_grad(p + e, X, Y, True)[0]
              - _nll_and_grad(p - e, X, Y, True)[0]) / 2e-6
        assert abs(fd - g[j]) < 1e-4 * max(1.0, abs(fd))


def test_oracle_fits_smooth_function(rng):
    X = rng.uniform(size=(80, 2))
    f = lambda Z: np.sin(3 * Z[:, :1]) * np.cos(2 * Z[:, 1:2])
    Y = f(X) + 0.01 * rng.standard_normal((80, 1))
    Xq = rng.uniform(size=(400, 2))
    mse, t_learn, t_query = oracle.fit_and_eval(X, Y, Xq, f(Xq))
    assert mse < 1e-3
    assert t_learn > 0 and t_query > 0


def test_oracle_matches_jax_gp(rng):
    """Same data, same model family: the f32 TPU-path GP and the f64 oracle
    must reach comparable predictive accuracy."""
    import jax
    import jax.numpy as jnp

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import NullMean
    from limbo_tpu.models import gp as gp_mod
    from limbo_tpu.models.hp_opt import KernelLFOpt
    from limbo_tpu.opt.gradient import Rprop

    X = rng.uniform(size=(60, 1))
    f = lambda Z: np.sin(5 * Z)
    Y = f(X) + 0.01 * rng.standard_normal((60, 1))
    Xq = rng.uniform(size=(300, 1))

    kern = SquaredExpARD.create(dim=1, optimize_noise=True, dtype=jnp.float64)
    gp = gp_mod.fit(kern, NullMean(), jnp.asarray(X), jnp.asarray(Y))
    gp = KernelLFOpt(optimizer=Rprop(iterations=50, eps_stop=1e-2))(
        gp, jax.random.PRNGKey(0))
    mu, _ = gp_mod.query(gp, jnp.asarray(Xq))
    mse_jax = float(np.mean((np.asarray(mu) - f(Xq)) ** 2))

    mse_oracle, _, _ = oracle.fit_and_eval(X, Y, Xq, f(Xq))
    assert mse_jax < 5e-3 and mse_oracle < 5e-3
    # within an order of magnitude of each other (both near the noise floor)
    assert mse_jax < max(10 * mse_oracle, 1e-3)


def test_sklearn_external_baseline(rng):
    """The measured third-party comparison point (≙ the reference's GPy
    runs, src/benchmarks/regression/gpy.py): sklearn GPR on the same data
    reaches the same accuracy class as the suite's GP."""
    import pytest

    pytest.importorskip("sklearn")
    from limbo_tpu.benchmarks import sklearn_baseline

    X = rng.uniform(size=(80, 2))
    f = lambda Z: np.sin(3 * Z[:, :1]) * np.cos(2 * Z[:, 1:2])
    Y = f(X) + 0.01 * rng.standard_normal((80, 1))
    Xq = rng.uniform(size=(400, 2))
    mse, t_learn, t_query = sklearn_baseline.fit_and_eval(X, Y, Xq, f(Xq))
    assert mse < 1e-2
    assert t_learn > 0 and t_query > 0
