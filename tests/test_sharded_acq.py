"""Column-sharded cached acquisition (parallel/sharded_acq.py).

The large-n multi-chip path: K^{-1} (and the bf16 mirror) column-sharded
over the mesh, acquisition replicated, deferred appends flushing local
panels.  Verified against the single-device query_cached / deferred add on
the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded_acq import (ShardColsGPView,
                                            cache_specs,
                                            make_sharded_bo_iter,
                                            shard_cache_cols,
                                            sharded_query_cached)

F32 = jnp.float32


def make_gp(n=48, d=3, capacity=64, defer_m=0, qdtype=None):
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=F32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True)) \
        + 0.1 * jax.random.normal(ky, (n, 1), dtype=F32)
    gp = gp_mod.fit(SquaredExpARD.create(dim=d, dtype=F32),
                    DataMean.create(dim_out=1, dtype=F32), X, Y,
                    capacity=capacity)
    cache = gp_mod.QueryCache.build(gp, with_Linv=True, qdtype=qdtype,
                                    defer_m=defer_m)
    return gp, cache


@pytest.mark.parametrize("defer_m", [0, 8])
def test_sharded_query_matches_single_device(defer_m):
    mesh = make_mesh(8, axis_name="cols")
    gp, cache = make_gp(defer_m=defer_m)
    Xq = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), dtype=F32)
    mu_ref, var_ref = gp_mod.query_cached(gp, cache, Xq)

    cspec = cache_specs("cols", cache)

    def body(gp, cache, Xq):
        view = ShardColsGPView(gp=gp, cache=cache, axis="cols")
        return sharded_query_cached(view, Xq)

    sharded = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(), cspec, P()), out_specs=(P(), P())))
    cache_s = shard_cache_cols(mesh, cache)
    mu_s, var_s = sharded(gp, cache_s, Xq)
    # f32 reduction-order noise only (shard_map matmuls tile differently)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_ref),
                               atol=1e-4)


def test_sharded_query_gradient_matches():
    """The symmetric-VJP backward (all_gather of the saved partials) agrees
    with the single-device custom VJP."""
    mesh = make_mesh(8, axis_name="cols")
    gp, cache = make_gp()
    x0 = jax.random.uniform(jax.random.PRNGKey(3), (3,), dtype=F32)

    def v_ref(x):
        return gp_mod.query_cached(gp, cache, x[None, :])[1][0]

    g_ref = jax.grad(v_ref)(x0)

    cspec = cache_specs("cols", cache)

    def body(gp, cache, x):
        view = ShardColsGPView(gp=gp, cache=cache, axis="cols")

        def v(xx):
            return sharded_query_cached(view, xx[None, :])[1][0]

        return jax.grad(v)(x)

    sharded = jax.jit(jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(), cspec, P()), out_specs=P()))
    g_s = sharded(gp, shard_cache_cols(mesh, cache), x0)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_ref), atol=1e-5)


def test_sharded_bo_iter_matches_single_device():
    """Full sharded BO iterations (replicated ascent + sharded deferred
    append, crossing a flush boundary) track the single-device deferred
    trajectory."""
    from limbo_tpu.acqui.acqui import UCB
    from limbo_tpu.opt.compose import RandomRestarts
    from limbo_tpu.opt.gradient import Rprop

    mesh = make_mesh(8, axis_name="cols")
    qd = jnp.bfloat16
    gp, cache = make_gp(defer_m=4, qdtype=qd)
    gp_r, cache_r = make_gp(defer_m=4, qdtype=qd)
    opt = RandomRestarts(sub=Rprop(iterations=10), repeats=4,
                         sweep_samples=32)
    acqui = UCB(alpha=0.5)

    def f(x):
        return jnp.sin(3.0 * jnp.sum(x))[None]

    iter_fn = jax.jit(make_sharded_bo_iter(mesh, f, acqui, opt))

    # single-device reference iteration (same key sequence)
    from limbo_tpu.acqui.acqui import FirstElem

    @jax.jit
    def ref_iter(gp, cache, key, it):
        view = gp_mod.CachedGPView(gp, cache)

        def acq_fn(x):
            return acqui(view, x, FirstElem, it)

        start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
        res = opt(acq_fn, start, key, True)
        y = f(res.x).astype(gp.x.dtype)
        gp, cache = gp_mod.add_sample_cached(gp, cache, res.x, y,
                                             fast_update="deferred")
        return gp, cache, res.x, y

    cache_s = shard_cache_cols(mesh, cache)
    key = jax.random.PRNGKey(7)
    for it in range(6):                      # crosses the m=4 flush
        key, k = jax.random.split(key)
        gp, cache_s, x_s, y_s = iter_fn(gp, cache_s, k,
                                        jnp.asarray(it))
        gp_r, cache_r, x_r, y_r = ref_iter(gp_r, cache_r, k,
                                           jnp.asarray(it))
        # bf16 mirror quantization enters the ascent identically in both
        # paths; trajectories match to f32 reduction-order noise
        np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_r),
                                   atol=5e-3)
    assert int(gp.n) == int(gp_r.n)
    # cache panels reassemble to the single-device cache
    np.testing.assert_allclose(np.asarray(cache_s.Kinv),
                               np.asarray(cache_r.Kinv), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_s.ay),
                               np.asarray(cache_r.ay), atol=1e-3)
    # final posteriors agree
    Xq = jax.random.uniform(jax.random.PRNGKey(9), (16, 3), dtype=F32)
    mu_r, var_r = gp_mod.query_cached(gp_r, cache_r, Xq)
    cspec = cache_specs("cols", cache)

    def qbody(gp, cache, Xq):
        view = ShardColsGPView(gp=gp, cache=cache, axis="cols")
        return sharded_query_cached(view, Xq)

    mu_s, var_s = jax.jit(jax.shard_map(
        qbody, mesh=mesh, check_vma=False,
        in_specs=(P(), cspec, P()), out_specs=(P(), P())))(gp, cache_s, Xq)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               atol=2e-3)
