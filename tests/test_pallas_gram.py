"""Pallas fused gram kernel: interpret-mode correctness vs jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.ops.gram import (
    matern32_gram_ref,
    matern52_gram_ref,
    se_gram_ref,
)
from limbo_tpu.ops.gram_pallas import gram_pallas


@pytest.mark.parametrize("form,ref", [
    ("se", lambda a, b, s, il: se_gram_ref(a, b, s)),
    ("matern32", matern32_gram_ref),
    ("matern52", matern52_gram_ref),
], ids=["se", "matern32", "matern52"])
@pytest.mark.parametrize("shape", [(64, 64, 4), (300, 200, 8)])
def test_pallas_matches_reference(form, ref, shape, rng):
    n, m, d = shape
    X1 = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    X2 = jnp.asarray(rng.uniform(size=(m, d)), dtype=jnp.float32)
    sf2 = jnp.asarray(1.7, dtype=jnp.float32)
    inv_l = jnp.asarray(2.3, dtype=jnp.float32)
    got = gram_pallas(X1, X2, sf2, inv_l, form=form, interpret=True)
    want = ref(X1, X2, sf2, inv_l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
