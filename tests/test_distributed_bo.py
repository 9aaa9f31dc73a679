"""DistributedBOptimizer (bo/distributed.py): the BOptimizer surface over
the beyond-one-chip sharded path, end-to-end on the 8-virtual-device mesh,
validated against the single-device deferred-cache reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui.acqui import UCB
from limbo_tpu.bo.distributed import DistributedBOptimizer
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.kernels import MaternFiveHalves
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.parallel.mesh import make_mesh

F32 = jnp.float32


def make_dbo(mesh, **kw):
    kw.setdefault("kernel", MaternFiveHalves.create(dtype=F32))
    kw.setdefault("mean", DataMean.create(dim_out=1, dtype=F32))
    kw.setdefault("acqui", UCB(alpha=0.5))
    kw.setdefault("acqui_optimizer",
                  RandomRestarts(sub=Rprop(iterations=8), repeats=3,
                                 sweep_samples=16))
    kw.setdefault("init", RandomSampling(20))
    kw.setdefault("stop", (MaxIterations(6),))
    kw.setdefault("stats_enabled", False)
    return DistributedBOptimizer(mesh, block=8, defer_m=4, **kw)


def f_host(x):
    return np.sin(3.0 * float(np.sum(x)))


def test_distributed_bo_matches_single_device():
    """ask/tell on the mesh; every proposal is fed to a single-device
    deferred-cache GP, and the sharded state must track it (same factor,
    same alpha) across iterations incl. a defer_m=4 flush."""
    mesh = make_mesh(8, axis_name="rows")
    dbo = make_dbo(mesh)
    state = dbo.init_state(2, key=jax.random.PRNGKey(0))
    X0, Y0 = [], []
    while state.pending_init:
        x = dbo.ask(state)
        y = f_host(x)
        X0.append(np.asarray(x)), Y0.append(np.atleast_1d(y))
        dbo.tell(state, x, y)
    cap = state.gp.capacity
    gp_r = gp_mod.fit(dbo.kernel, dbo.mean,
                      jnp.asarray(np.stack(X0), F32),
                      jnp.asarray(np.stack(Y0), F32), capacity=cap)
    cache_r = gp_mod.QueryCache.build(gp_r, with_Linv=True, defer_m=4)
    ref_add = jax.jit(functools.partial(gp_mod.add_sample_cached,
                                        fast_update="deferred"))
    for _ in range(6):
        x = dbo.ask(state)
        y = f_host(x)
        dbo.tell(state, x, y)
        gp_r, cache_r = ref_add(gp_r, cache_r, jnp.asarray(x, F32),
                                jnp.asarray(y, F32)[None])
    assert int(state.gp.n) == int(gp_r.n) == 26
    np.testing.assert_allclose(np.asarray(state.gp.L), np.asarray(gp_r.L),
                               atol=2e-4)
    scale = float(np.max(np.abs(np.asarray(gp_r.alpha)))) + 1e-12
    np.testing.assert_allclose(np.asarray(state.gp.alpha),
                               np.asarray(gp_r.alpha), atol=1e-3 * scale)
    assert state.best_value >= min(np.ravel(Y0).max(), state.best_value)


def test_distributed_optimize_with_stats(tmp_path):
    """optimize() end-to-end: stop criterion honored, stats written to the
    res_dir, best tracked."""
    from limbo_tpu.bo.stats import BestAggregatedObservations

    mesh = make_mesh(8, axis_name="rows")
    dbo = make_dbo(mesh, stats=(BestAggregatedObservations(),),
                   stats_enabled=True, res_base_dir=str(tmp_path),
                   stop=(MaxIterations(3),))
    state = dbo.optimize(f_host, dim_in=2, key=jax.random.PRNGKey(1))
    assert state.iteration == 3
    assert int(state.gp.n) == 20 + 3
    files = list(tmp_path.glob("*/best_aggregated_observations.dat"))
    assert len(files) == 1
    assert len(files[0].read_text().strip().splitlines()) == 3
