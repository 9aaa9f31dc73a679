"""Row-sharded blocked Cholesky / exact sharded GP vs the dense single-device
path, on the virtual 8-device CPU mesh.

The reference has no distributed factorization (limbo is single-host Eigen
LLT, model/gp.hpp:550-605); these tests pin the new component's exactness:
same factor, same alpha, same LML, same posterior moments as the dense GP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import ConstantMean, NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded_chol import (
    sharded_cholesky,
    sharded_fit,
    sharded_query,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device mesh")


def _spd(rng, n, dtype):
    M = rng.normal(size=(n, n))
    A = M @ M.T / n + 0.5 * np.eye(n)
    return jnp.asarray(A, dtype=dtype)


@pytest.mark.parametrize("dtype,atol", [(jnp.float64, 1e-10),
                                        (jnp.float32, 2e-4)])
def test_sharded_cholesky_matches_dense(rng, dtype, atol):
    mesh = make_mesh(8, axis_name="rows")
    A = _spd(rng, 512, dtype)
    L_sh = sharded_cholesky(mesh, A, block=64)
    L_ref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L_sh), np.asarray(L_ref),
                               atol=atol)


def test_sharded_cholesky_bad_geometry_raises(rng):
    mesh = make_mesh(8, axis_name="rows")
    A = _spd(rng, 100, jnp.float64)
    with pytest.raises(ValueError):
        sharded_cholesky(mesh, A, block=64)


def test_sharded_fit_matches_dense_gp(rng):
    """alpha, logdet, LML and the factor agree with the dense fit."""
    mesh = make_mesh(8, axis_name="rows")
    N, n, d = 256, 256, 3
    X = jnp.asarray(rng.uniform(size=(N, d)), dtype=jnp.float64)
    Y = jnp.sin(jnp.sum(3.0 * X, axis=1, keepdims=True))
    kern = SquaredExpARD.create(dim=d, dtype=jnp.float64)
    sgp = sharded_fit(mesh, kern, NullMean(), X, Y, block=32)
    dense = gp_mod.fit(kern, NullMean(), X, Y, capacity=N)
    np.testing.assert_allclose(np.asarray(sgp.alpha),
                               np.asarray(dense.alpha), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sgp.L), np.asarray(dense.L),
                               atol=1e-8)
    lml_ref = gp_mod.log_marginal_likelihood(kern, NullMean(), dense.x,
                                             dense.y, dense.n)
    np.testing.assert_allclose(float(sgp.lml), float(lml_ref), rtol=1e-10)


def test_sharded_fit_masked_padding(rng):
    """Padded rows (n < N) behave exactly like the dense masked GP."""
    mesh = make_mesh(8, axis_name="rows")
    N, n, d = 256, 177, 2
    Xn = rng.uniform(size=(n, d))
    Yn = np.cos(np.sum(Xn, axis=1, keepdims=True))
    Xpad = np.zeros((N, d))
    Xpad[:n] = Xn
    Ypad = np.zeros((N, 1))
    Ypad[:n] = Yn
    kern = SquaredExpARD.create(dim=d, dtype=jnp.float64)
    sgp = sharded_fit(mesh, kern, ConstantMean.create(value=0.1),
                      jnp.asarray(Xpad), jnp.asarray(Ypad),
                      n=jnp.asarray(n), block=32)
    dense = gp_mod.fit(kern, ConstantMean.create(value=0.1),
                       jnp.asarray(Xn), jnp.asarray(Yn), capacity=N)
    np.testing.assert_allclose(np.asarray(sgp.alpha),
                               np.asarray(dense.alpha), atol=1e-8)
    lml_ref = gp_mod.log_marginal_likelihood(
        dense.kernel, dense.mean, dense.x, dense.y, dense.n)
    np.testing.assert_allclose(float(sgp.lml), float(lml_ref), rtol=1e-9)


def test_sharded_query_matches_dense(rng):
    mesh = make_mesh(8, axis_name="rows")
    N, d, q = 256, 3, 17
    X = jnp.asarray(rng.uniform(size=(N, d)), dtype=jnp.float64)
    Y = jnp.sin(jnp.sum(2.0 * X, axis=1, keepdims=True))
    kern = SquaredExpARD.create(dim=d, dtype=jnp.float64)
    sgp = sharded_fit(mesh, kern, NullMean(), X, Y, block=32)
    dense = gp_mod.fit(kern, NullMean(), X, Y, capacity=N)
    Xq = jnp.asarray(rng.uniform(size=(q, d)), dtype=jnp.float64)
    mu_ref, var_ref = gp_mod.query(dense, Xq)
    mu, var = sharded_query(mesh, sgp, Xq)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               atol=1e-9)


def test_sharded_fit_f32(rng):
    """f32 path (the TPU dtype) stays within roundoff of the dense f32 GP."""
    mesh = make_mesh(8, axis_name="rows")
    N, d = 256, 2
    X = jnp.asarray(rng.uniform(size=(N, d)), dtype=jnp.float32)
    Y = jnp.sin(jnp.sum(X, axis=1, keepdims=True)).astype(jnp.float32)
    kern = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    sgp = sharded_fit(mesh, kern, NullMean(), X, Y, block=32)
    dense = gp_mod.fit(kern, NullMean(), X, Y, capacity=N)
    Xq = jnp.asarray(rng.uniform(size=(9, d)), dtype=jnp.float32)
    mu_ref, var_ref = gp_mod.query(dense, Xq)
    mu, var = sharded_query(mesh, sgp, Xq)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=3e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               atol=3e-4)
