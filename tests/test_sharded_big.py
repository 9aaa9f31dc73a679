"""Beyond-one-chip BO path (parallel/sharded_big.py): row-sharded factor +
column-sharded K^{-1} panels + distributed-solve appends, validated against
the single-device GP/QueryCache on the 8-virtual-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded_big import (make_big_bo_iter,
                                            sharded_cache_from_fit)
from limbo_tpu.parallel.sharded_chol import sharded_fit

F32 = jnp.float32
N_CAP = 64          # 8 devices x block 8
BLOCK = 8
D = 3


def make_data(n=40):
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    X = jax.random.uniform(kx, (n, D), dtype=F32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=F32)
    return X, Y


def pad(X, Y):
    Xp = jnp.zeros((N_CAP, D), F32).at[: X.shape[0]].set(X)
    Yp = jnp.zeros((N_CAP, 1), F32).at[: Y.shape[0]].set(Y)
    return Xp, Yp


def make_big(mesh, defer_m=4, qdtype=None, n=40):
    X, Y = make_data(n)
    Xp, Yp = pad(X, Y)
    kernel = SquaredExpARD.create(dim=D, dtype=F32)
    mean = DataMean.create(dim_out=1, dtype=F32)
    sgp = sharded_fit(mesh, kernel, mean, Xp, Yp, n=jnp.asarray(n),
                      block=BLOCK, axis="rows")
    big = sharded_cache_from_fit(mesh, sgp, qdtype=qdtype, defer_m=defer_m)
    # single-device reference
    gp = gp_mod.fit(kernel, mean, X, Y, capacity=N_CAP)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True, qdtype=qdtype,
                                    defer_m=defer_m)
    return big, gp, cache


def test_big_cache_matches_single_device():
    mesh = make_mesh(8, axis_name="rows")
    big, gp, cache = make_big(mesh)
    # the assembled column panels equal the single-device K^{-1} to f32
    # solve round-off (relative to the inverse's scale: the two paths
    # compute it by different-but-equivalent triangular solve orders)
    scale = float(np.max(np.abs(np.asarray(cache.Kinv))))
    np.testing.assert_allclose(np.asarray(big.Kq), np.asarray(cache.Kinv),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(big.ay), np.asarray(cache.ay),
                               atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(big.alpha), np.asarray(gp.alpha),
                               atol=5e-5 * scale)


def test_big_query_matches_single_device():
    from jax.sharding import PartitionSpec as P

    from limbo_tpu.parallel.sharded_big import (_BigLocalView, _specs,
                                                big_query)

    mesh = make_mesh(8, axis_name="rows")
    big, gp, cache = make_big(mesh)
    Xq = jax.random.uniform(jax.random.PRNGKey(2), (16, D), dtype=F32)
    mu_r, var_r = gp_mod.query_cached(gp, cache, Xq)

    def body(big, Xq):
        return big_query(_BigLocalView(gp=big, axis=big.axis), Xq)

    mu_s, var_s = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(_specs(big), P()), out_specs=(P(), P())))(big, Xq)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               atol=1e-4)


def test_big_bo_iter_matches_single_device():
    """Full big iterations (distributed-pivot appends crossing a flush):
    the big path's proposals are fed into a single-device deferred
    reference, so the two states stay comparable (proposals themselves can
    diverge by f32 reduction order near flat acquisitions — comparing two
    independent chaotic trajectories would be meaningless)."""
    from limbo_tpu.acqui.acqui import UCB
    from limbo_tpu.opt.compose import RandomRestarts
    from limbo_tpu.opt.gradient import Rprop

    mesh = make_mesh(8, axis_name="rows")
    big, gp_r, cache_r = make_big(mesh, defer_m=4)
    opt = RandomRestarts(sub=Rprop(iterations=10), repeats=4,
                         sweep_samples=32)
    acqui = UCB(alpha=0.5)

    def f(x):
        return jnp.sin(3.0 * jnp.sum(x))[None]

    iter_fn = jax.jit(make_big_bo_iter(mesh, f, acqui, opt))
    ref_add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                        fast_update="deferred"))

    key = jax.random.PRNGKey(7)
    for it in range(6):                       # crosses the m=4 flush
        key, k = jax.random.split(key)
        big, x_s, y_s = iter_fn(big, k, jnp.asarray(it))
        assert np.all(np.isfinite(np.asarray(x_s)))
        gp_r, cache_r = ref_add(gp_r, cache_r, x_s, y_s)
    assert int(big.n) == int(gp_r.n)
    assert int(big.base_n) == int(cache_r.base_n)
    # the maintained sharded factor row-assembles to the single-device L
    np.testing.assert_allclose(np.asarray(big.L), np.asarray(gp_r.L),
                               atol=2e-4)
    scale = float(np.max(np.abs(np.asarray(cache_r.Kinv))))
    np.testing.assert_allclose(np.asarray(big.Kq), np.asarray(cache_r.Kinv),
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(big.alpha),
                               np.asarray(gp_r.alpha), atol=1e-4 * scale)


def test_big_bo_iter_bf16_panels():
    """Low-precision (bf16) K^{-1} panels: flushes REBUILD the panels from
    the maintained factor (an in-place bf16 add would absorb the
    correction — same failure mode as the single-device lite cache) and
    re-derive ay/u_ones exactly.  State stays at bf16-quantization distance
    from the exact single-device posterior across a flush."""
    import functools

    from limbo_tpu.acqui.acqui import UCB
    from limbo_tpu.opt.compose import RandomRestarts
    from limbo_tpu.opt.gradient import Rprop

    mesh = make_mesh(8, axis_name="rows")
    big, gp_r, cache_r = make_big(mesh, defer_m=4, qdtype=jnp.bfloat16)
    opt = RandomRestarts(sub=Rprop(iterations=8), repeats=3,
                         sweep_samples=16)
    acqui = UCB(alpha=0.5)

    def f(x):
        return jnp.sin(3.0 * jnp.sum(x))[None]

    iter_fn = jax.jit(make_big_bo_iter(mesh, f, acqui, opt))
    ref_add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                        fast_update="deferred"))
    key = jax.random.PRNGKey(7)
    for it in range(5):                       # crosses the m=4 flush
        key, k = jax.random.split(key)
        big, x_s, y_s = iter_fn(big, k, jnp.asarray(it))
        assert np.all(np.isfinite(np.asarray(x_s)))
        gp_r, cache_r = ref_add(gp_r, cache_r, x_s, y_s)
    assert int(big.base_n) == int(cache_r.base_n)   # both flushed once
    # panels match the exact f32 master to bf16 quantization
    scale = float(np.max(np.abs(np.asarray(cache_r.Kinv))))
    np.testing.assert_allclose(
        np.asarray(big.Kq.astype(jnp.float32)), np.asarray(cache_r.Kinv),
        atol=2.5e-3 * scale)   # 2^-9 + solve round-off
    # ay/alpha re-derived exactly at the flush (not from the quantized
    # mirror): they track the f32 reference, not bf16
    np.testing.assert_allclose(np.asarray(big.alpha),
                               np.asarray(gp_r.alpha), atol=1e-4 * scale)
