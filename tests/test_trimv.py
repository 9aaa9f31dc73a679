"""Triangular matvec kernel (ops/trimv.py): exactness vs dense matvec.

The kernel backs the "linv" cached-update pivot (models/gp.add_sample_cached)
— the hot O(N^2) step of the large-n BO iteration.  On CPU the Pallas path
runs in interpreter mode; the public `trimv` dispatch falls back to a dense
dot (exercised separately).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from limbo_tpu.ops.trimv import _pick_block, _trimv_pallas, trimv


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("n,block", [(512, 256), (768, 256), (1024, 512)])
def test_trimv_kernel_matches_dense(transpose, n, block):
    rng = np.random.default_rng(0)
    L = jnp.asarray(np.tril(rng.standard_normal((n, n))), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    y = _trimv_pallas(L, v, transpose, block)
    ref = (L.T if transpose else L) @ v
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(y - ref))) / scale < 1e-5


@pytest.mark.parametrize("transpose", [False, True])
def test_trimv_padded_identity_layout(transpose):
    """The GP cache's Linv layout: leading n x n inverse factor, identity
    padding beyond — the kernel must reproduce the dense product exactly
    (masked k has zeros in the padded region)."""
    rng = np.random.default_rng(1)
    n, N = 300, 512
    A = np.tril(rng.standard_normal((n, n))) + 5.0 * np.eye(n)
    Linv = np.eye(N, dtype=np.float32)
    Linv[:n, :n] = np.linalg.inv(A).astype(np.float32)
    v = np.zeros(N, dtype=np.float32)
    v[:n] = rng.standard_normal(n)
    y = _trimv_pallas(jnp.asarray(Linv), jnp.asarray(v), transpose, 256)
    ref = (Linv.T if transpose else Linv) @ v
    np.testing.assert_allclose(np.asarray(y), ref, rtol=0, atol=1e-4)


def test_trimv_dispatch_fallback():
    """Off-TPU / small-N / odd sizes take the dense fallback and agree."""
    rng = np.random.default_rng(2)
    for n in (100, 384):          # 100: no 256-block; 384: below floor
        L = jnp.asarray(np.tril(rng.standard_normal((n, n))),
                        dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        for tr in (False, True):
            y = trimv(L, v, transpose=tr)
            ref = (L.T if tr else L) @ v
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
    assert _pick_block(100) == 0
    assert _pick_block(10496) == 256
    assert _pick_block(10240) == 512


def test_trimv_in_linv_update_jit():
    """add_sample_cached's linv branch (which routes through trimv's
    dispatch) stays jittable and exact with a sub-floor capacity."""
    import functools

    from limbo_tpu.kernels import SquaredExpARD
    from limbo_tpu.means import DataMean
    from limbo_tpu.models import gp as gp_mod

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (32, 2), dtype=dtype)
    Y = jnp.sum(X, axis=1, keepdims=True)
    gp = gp_mod.fit(SquaredExpARD.create(dim=2, dtype=dtype),
                    DataMean.create(dim_out=1, dtype=dtype), X, Y,
                    capacity=64)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True)
    add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                    fast_update="linv"))
    x_new = jnp.asarray([0.5, 0.5], dtype=dtype)
    gp2, cache2 = add(gp, cache, x_new, jnp.asarray([1.0], dtype=dtype))
    eye = jnp.eye(gp2.capacity, dtype=dtype)
    assert float(jnp.max(jnp.abs(cache2.Linv @ gp2.L - eye))) < 1e-4
