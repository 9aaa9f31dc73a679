"""Kernel tests: formula parity with limbo + autodiff-vs-finite-difference.

Mirrors the reference test strategy (src/tests/test_kernel.cpp:158-196):
analytic gradients of k(x1, x2) w.r.t. log-space hyperparameters checked
against central finite differences to 1e-5 — here 'analytic' is JAX autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import Exp, MaternFiveHalves, MaternThreeHalves, SquaredExpARD


def make_kernels(dim):
    return {
        "exp": Exp.create(dtype=jnp.float64),
        "seard": SquaredExpARD.create(dim=dim, dtype=jnp.float64),
        "seard_rank2": SquaredExpARD.create(dim=dim, rank=min(2, dim), dtype=jnp.float64),
        "m32": MaternThreeHalves.create(dtype=jnp.float64),
        "m52": MaternFiveHalves.create(dtype=jnp.float64),
    }


@pytest.mark.parametrize("name", ["exp", "seard", "seard_rank2", "m32", "m52"])
@pytest.mark.parametrize("dim", [1, 3])
def test_kernel_grad_fd(name, dim, rng):
    """d k / d (log params) via autodiff matches finite differences."""
    kern = make_kernels(dim)[name]
    x1 = jnp.asarray(rng.uniform(size=dim))
    x2 = jnp.asarray(rng.uniform(size=dim))
    p0 = kern.params + jnp.asarray(rng.normal(scale=0.3, size=kern.params_size))

    def f(p):
        return kern.with_params(p)(x1, x2)

    g = jax.grad(f)(p0)
    eps = 1e-6
    for j in range(p0.shape[0]):
        e = jnp.zeros_like(p0).at[j].set(eps)
        fd = (f(p0 + e) - f(p0 - e)) / (2 * eps)
        np.testing.assert_allclose(g[j], fd, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("name", ["exp", "seard", "m32", "m52"])
def test_kernel_values(name, rng):
    """Spot-check closed forms against the limbo formulas."""
    dim = 2
    kern = make_kernels(dim)[name]
    x1 = jnp.asarray(rng.uniform(size=dim))
    x2 = jnp.asarray(rng.uniform(size=dim))
    d2 = float(jnp.sum((x1 - x2) ** 2))
    d = np.sqrt(d2)
    if name in ("exp", "seard"):
        expected = np.exp(-0.5 * d2)  # sigma_sq=1, l/ell=1
    elif name == "m32":
        t = np.sqrt(3) * d
        expected = (1 + t) * np.exp(-t)
    else:
        t = np.sqrt(5) * d
        expected = (1 + t + 5 * d2 / 3) * np.exp(-t)
    np.testing.assert_allclose(float(kern(x1, x2)), expected, rtol=1e-10)
    # k(x, x) == signal variance
    np.testing.assert_allclose(float(kern(x1, x1)), 1.0, rtol=1e-10)


@pytest.mark.parametrize("name", ["exp", "seard", "seard_rank2", "m32", "m52"])
def test_gram_matches_pairwise(name, rng):
    """Matmul-based gram equals the per-pair evaluation."""
    dim = 3
    kern = make_kernels(dim)[name]
    X1 = jnp.asarray(rng.uniform(size=(7, dim)))
    X2 = jnp.asarray(rng.uniform(size=(5, dim)))
    G = kern.gram(X1, X2)
    for i in range(7):
        for j in range(5):
            np.testing.assert_allclose(float(G[i, j]),
                                       float(kern(X1[i], X2[j])),
                                       rtol=1e-8, atol=1e-10)


def test_params_roundtrip(rng):
    """with_params(params) is the identity; noise appended when optimized."""
    for name, kern in make_kernels(3).items():
        p = kern.params
        k2 = kern.with_params(p)
        np.testing.assert_allclose(np.asarray(k2.params), np.asarray(p))
    kern = Exp.create(dtype=jnp.float64, optimize_noise=True)
    assert kern.params_size == 3
    p = kern.params.at[2].set(jnp.log(0.5))
    k2 = kern.with_params(p)
    np.testing.assert_allclose(float(k2.noise), 0.25, rtol=1e-10)


def test_noise_default():
    """limbo defaults::kernel::noise = 0.01 (variance)."""
    kern = Exp.create(dtype=jnp.float64)
    np.testing.assert_allclose(float(kern.noise), 0.01, rtol=1e-10)


def test_matern_grad_at_coincident_points():
    """safe_sqrt: gradients at x1 == x2 are finite (d=0 sqrt singularity)."""
    for kern in [MaternThreeHalves.create(dtype=jnp.float64),
                 MaternFiveHalves.create(dtype=jnp.float64)]:
        x = jnp.asarray([0.3, 0.7])

        def f(p):
            return kern.with_params(p)(x, x)

        g = jax.grad(f)(kern.params)
        assert np.all(np.isfinite(np.asarray(g)))

        gx = jax.grad(lambda a: kern(a, x))(x)
        assert np.all(np.isfinite(np.asarray(gx)))
