"""Multi-objective primitive tests: Pareto filtering, hypervolume, EHVI.

EHVI exactness is checked against a brute-force Monte Carlo estimate
(the reference validates its C++ EHVI the same way: ehvi_montecarlo.cc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.ops import (
    ehvi_2d_max,
    ehvi_mc_max,
    hypervolume_2d,
    non_dominated_mask,
    pareto_set,
)

F64 = jnp.float64


def test_non_dominated_mask_simple():
    Y = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5],
                     [0.4, 0.4], [0.0, 0.0]], dtype=F64)
    nd = non_dominated_mask(Y)
    np.testing.assert_array_equal(np.asarray(nd),
                                  [True, True, True, False, False])


def test_non_dominated_with_mask():
    Y = jnp.asarray([[1.0, 0.0], [2.0, 2.0], [0.0, 1.0]], dtype=F64)
    mask = jnp.asarray([1.0, 0.0, 1.0])   # the dominating point is padding
    nd = non_dominated_mask(Y, mask)
    np.testing.assert_array_equal(np.asarray(nd), [True, False, True])


def test_pareto_set_compacts():
    Y = jnp.asarray([[0.4, 0.4], [1.0, 0.0], [0.5, 0.5]], dtype=F64)
    X = jnp.arange(3, dtype=F64)[:, None]
    Xc, Yc, keep = pareto_set(X, Y)
    assert int(keep.sum()) == 2
    np.testing.assert_array_equal(np.asarray(Xc[:2, 0]), [1.0, 2.0])


def test_hypervolume_2d_exact():
    # two points (1,2), (2,1) wrt ref (0,0): union area = 1*2 + (2-1)*1 = 3
    Y = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], dtype=F64)
    hv = hypervolume_2d(Y, jnp.asarray([0.0, 0.0], dtype=F64))
    np.testing.assert_allclose(float(hv), 3.0, rtol=1e-12)


def test_hypervolume_2d_masked_padding():
    Y = jnp.asarray([[1.0, 2.0], [2.0, 1.0], [5.0, 5.0]], dtype=F64)
    mask = jnp.asarray([1.0, 1.0, 0.0])
    hv = hypervolume_2d(Y, jnp.asarray([0.0, 0.0], dtype=F64), mask)
    np.testing.assert_allclose(float(hv), 3.0, rtol=1e-12)


def test_hypervolume_dominated_point_no_contribution():
    Y = jnp.asarray([[1.0, 2.0], [2.0, 1.0], [0.5, 0.5]], dtype=F64)
    hv = hypervolume_2d(Y, jnp.asarray([0.0, 0.0], dtype=F64))
    np.testing.assert_allclose(float(hv), 3.0, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ehvi_2d_matches_monte_carlo(seed):
    rng = np.random.default_rng(seed)
    front = jnp.asarray(np.sort(rng.uniform(1, 3, size=(4, 2)), axis=0),
                        dtype=F64)
    # make it an actual front: sort obj0 asc, obj1 desc
    f = np.asarray(front)
    f = f[np.argsort(f[:, 0])]
    f[:, 1] = np.sort(f[:, 1])[::-1]
    front = jnp.asarray(f)
    ref = jnp.asarray([0.0, 0.0], dtype=F64)
    mu = jnp.asarray(rng.uniform(0.5, 3.5, size=2))
    sigma = jnp.asarray(rng.uniform(0.2, 0.8, size=2))

    exact = float(ehvi_2d_max(mu, sigma, front, ref))
    mc = float(ehvi_mc_max(jax.random.PRNGKey(seed), mu, sigma, front, ref,
                           n_samples=200_000))
    np.testing.assert_allclose(exact, mc, rtol=0.05, atol=5e-3)


def test_ehvi_padding_invariance():
    front = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], dtype=F64)
    padded = jnp.asarray([[1.0, 2.0], [2.0, 1.0], [9., 9.], [9., 9.]],
                         dtype=F64)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    ref = jnp.asarray([0.0, 0.0], dtype=F64)
    mu = jnp.asarray([1.5, 1.5], dtype=F64)
    sigma = jnp.asarray([0.3, 0.3], dtype=F64)
    a = float(ehvi_2d_max(mu, sigma, front, ref))
    b = float(ehvi_2d_max(mu, sigma, padded, ref, front_mask=mask))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_ehvi_far_dominated_candidate_near_zero():
    front = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], dtype=F64)
    ref = jnp.asarray([0.0, 0.0], dtype=F64)
    mu = jnp.asarray([0.1, 0.1], dtype=F64)     # deep inside dominated region
    sigma = jnp.asarray([0.05, 0.05], dtype=F64)
    v = float(ehvi_2d_max(mu, sigma, front, ref))
    assert v < 1e-6


def test_ehvi_vmap_batch():
    front = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], dtype=F64)
    ref = jnp.asarray([0.0, 0.0], dtype=F64)
    mus = jnp.asarray([[1.5, 1.5], [2.5, 2.5], [0.2, 0.2]], dtype=F64)
    sig = jnp.full((3, 2), 0.3, dtype=F64)
    vals = jax.vmap(lambda m, s: ehvi_2d_max(m, s, front, ref))(mus, sig)
    assert vals.shape == (3,)
    assert float(vals[1]) > float(vals[0]) > float(vals[2])


def test_ehvi_jax_matches_native_cpp():
    """Device kernel and native host lib implement the same closed form."""
    from limbo_tpu.native import ehvi2d_host, hv_host

    rng = np.random.default_rng(3)
    f = np.sort(rng.uniform(1, 3, size=(5, 2)), axis=0)
    f[:, 1] = np.sort(f[:, 1])[::-1]
    front = jnp.asarray(f)
    ref = np.array([0.2, 0.1])
    mus = rng.uniform(0.5, 3.5, size=(6, 2))
    sigs = rng.uniform(0.1, 0.8, size=(6, 2))
    native = ehvi2d_host(mus, sigs, f, ref)
    jaxv = jax.vmap(lambda m, s: ehvi_2d_max(m, s, front,
                                             jnp.asarray(ref)))(
        jnp.asarray(mus), jnp.asarray(sigs))
    np.testing.assert_allclose(np.asarray(jaxv), native, rtol=1e-8, atol=1e-10)


def test_hypervolume_jax_matches_native_cpp():
    from limbo_tpu.native import hv_host

    rng = np.random.default_rng(4)
    Y = rng.uniform(0.5, 3, size=(10, 2))
    ref = np.array([0.0, 0.0])
    a = float(hypervolume_2d(jnp.asarray(Y), jnp.asarray(ref)))
    b = hv_host(Y, ref)
    np.testing.assert_allclose(a, b, rtol=1e-10)
