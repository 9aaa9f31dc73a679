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


@pytest.mark.parametrize("form", ["se", "matern32", "matern52"])
@pytest.mark.parametrize("N,n", [(256, 200), (320, 320), (512, 130)])
def test_fused_train_gram_matches_reference(form, N, n, rng):
    """Fused covariance+diag+masked-identity tile kernel (interpret mode)
    vs the composed jnp reference, incl. non-tile-aligned valid counts."""
    from limbo_tpu.ops.gram import _TRAIN_REFS
    from limbo_tpu.ops.gram_pallas import gram_train_pallas

    X = jnp.asarray(rng.uniform(size=(N, 5)), dtype=jnp.float32)
    # zero the padded rows like the GP's capacity buffers do
    X = X.at[n:].set(0.0)
    sf2 = jnp.asarray(1.3, jnp.float32)
    inv_l = jnp.asarray(0.7, jnp.float32)
    dadd = jnp.asarray(0.01, jnp.float32)
    nf = jnp.asarray(n, jnp.float32)
    got = gram_train_pallas(X, sf2, inv_l, dadd, nf, form=form,
                            interpret=True)
    want = _TRAIN_REFS[form](X, sf2, inv_l, dadd, nf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # padded block is exactly the identity (chol-ready)
    pad = np.asarray(got)[n:, n:]
    np.testing.assert_array_equal(pad, np.eye(N - n, dtype=np.float32))


def test_gram_train_masked_method_matches_two_pass(rng):
    """KernelMixin.gram_train_masked == masked_identity_gram(gram_train(X))
    (+ extra_jitter) for every kernel family, values AND hp gradients."""
    from limbo_tpu.kernels import (Exp, MaternFiveHalves, MaternThreeHalves,
                                   SquaredExpARD)
    from limbo_tpu.utils.maths import masked_identity_gram

    N, n, d = 96, 70, 3
    X = jnp.asarray(rng.uniform(size=(N, d)), dtype=jnp.float32)
    X = X.at[n:].set(0.0)
    kernels = [
        Exp.create(l=0.4, noise=0.05),
        SquaredExpARD.create(dim=d),
        SquaredExpARD.create(dim=d, rank=2).replace(
            A=jnp.asarray(rng.normal(size=(d, 2)), jnp.float32)),
        MaternThreeHalves.create(l=0.6),
        MaternFiveHalves.create(l=0.6),
    ]
    mask = (jnp.arange(N) < n).astype(jnp.float32)
    for kern in kernels:
        for extra in (None, 1e-3):
            got = kern.gram_train_masked(X, jnp.asarray(n), extra_jitter=extra)
            K = kern.gram_train(X)
            if extra is not None:
                K = K + extra * jnp.eye(N, dtype=K.dtype)
            want = masked_identity_gram(K, mask)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=type(kern).__name__)

        # gradients wrt hyperparameters agree between the two forms
        def f_fused(p, kern=kern):
            return jnp.sum(kern.with_params(p).gram_train_masked(
                X, jnp.asarray(n)) ** 2)

        def f_two_pass(p, kern=kern):
            K = kern.with_params(p).gram_train(X)
            return jnp.sum(masked_identity_gram(K, mask) ** 2)

        g1 = jax.grad(f_fused)(kern.params)
        g2 = jax.grad(f_two_pass)(kern.params)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=type(kern).__name__)
