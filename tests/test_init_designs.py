"""Init design tests (mirrors src/tests/test_init_functions.cpp:107-227):
sample counts, grid membership, LHS stratification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.bo.init_designs import (
    LHS,
    GridSampling,
    NoInit,
    RandomSampling,
    RandomSamplingGrid,
)

F64 = jnp.float64
KEY = jax.random.PRNGKey(11)


def test_no_init():
    X = NoInit()(KEY, 3, dtype=F64)
    assert X.shape == (0, 3)


def test_random_sampling_count_and_bounds():
    X = RandomSampling(samples=17)(KEY, 4, dtype=F64)
    assert X.shape == (17, 4)
    a = np.asarray(X)
    assert np.all(a >= 0) and np.all(a <= 1)


def test_random_sampling_grid_membership():
    """Every coordinate lies exactly on the bins-grid
    (test_init_functions.cpp grid membership checks)."""
    bins = 5
    X = RandomSamplingGrid(samples=40, bins=bins)(KEY, 2, dtype=F64)
    a = np.asarray(X) * bins
    np.testing.assert_allclose(a, np.round(a), atol=1e-12)


def test_grid_sampling_full_cartesian():
    bins = 3
    X = GridSampling(bins=bins)(KEY, 2, dtype=F64)
    assert X.shape == ((bins + 1) ** 2, 2)
    # contains all corners
    a = np.asarray(X)
    for corner in [[0, 0], [0, 1], [1, 0], [1, 1]]:
        assert np.any(np.all(np.isclose(a, corner), axis=1))
    # unique points
    assert len(np.unique(np.round(a, 9), axis=0)) == (bins + 1) ** 2


def test_lhs_stratification():
    """Exactly one sample in each of the n strata per dimension
    (test_init_functions.cpp LHS checks)."""
    n = 12
    X = LHS(samples=n)(KEY, 3, dtype=F64)
    assert X.shape == (n, 3)
    strata = np.floor(np.asarray(X) * n).astype(int)
    for d in range(3):
        assert sorted(strata[:, d].tolist()) == list(range(n))


def test_designs_respect_key():
    X1 = RandomSampling(8)(jax.random.PRNGKey(1), 2, dtype=F64)
    X2 = RandomSampling(8)(jax.random.PRNGKey(1), 2, dtype=F64)
    X3 = RandomSampling(8)(jax.random.PRNGKey(2), 2, dtype=F64)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
    assert not np.array_equal(np.asarray(X1), np.asarray(X3))
