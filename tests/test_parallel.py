"""Multi-device tests on the virtual 8-device CPU mesh.

The reference has no distributed tests (SURVEY.md section 4); these cover the
new first-class distribution layer: sharded restart fan-out, row-sharded
posterior algebra, and the full dry-run training step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import Exp
from limbo_tpu.means import NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt import Rprop
from limbo_tpu.parallel import (
    make_mesh,
    row_sharded_posterior_mean,
    sharded_restart_opt,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def test_sharded_restart_opt_matches_global_opt():
    mesh = make_mesh(8)
    f = lambda x: -jnp.sum((x - 0.5) ** 2)
    res = sharded_restart_opt(mesh, Rprop(iterations=60), f,
                              jnp.zeros(2), jax.random.PRNGKey(0), True,
                              restarts_per_device=2)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-2)


def test_row_sharded_posterior_mean_matches_single_device(rng):
    mesh = make_mesh(8)
    X = jnp.asarray(rng.uniform(size=(32, 2)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(32, 1)), dtype=jnp.float32)
    kern = Exp.create(l=0.3)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=64)
    Xq = jnp.asarray(rng.uniform(size=(8, 2)), dtype=jnp.float32)
    mu_ref, _ = gp_mod.query(gp, Xq)
    mu_sh = row_sharded_posterior_mean(
        mesh, gp.kernel, gp.x * gp.mask[:, None], gp.alpha,
        gp.mean(Xq), Xq)
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu_ref),
                               atol=1e-4)


def test_dryrun_multichip():
    from limbo_tpu.parallel.dryrun import run_dryrun

    run_dryrun(len(jax.devices()))


def test_sharded_cg_matches_exact(rng):
    """Row-sharded CG alpha == dense Cholesky alpha."""
    from limbo_tpu.parallel.distributed_gp import sharded_cg_fit_alpha

    mesh = make_mesh(8)
    n, N = 30, 32
    X = jnp.asarray(rng.uniform(size=(n, 2)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(n, 1)), dtype=jnp.float32)
    kern = Exp.create(l=0.3)
    gp = gp_mod.fit(kern, NullMean(), X, Y, capacity=N)
    mask = gp.mask
    centered = gp.y * mask[:, None]
    alpha = sharded_cg_fit_alpha(mesh, kern, gp.x, mask, centered,
                                 tol=1e-6, maxiter=400)
    # f32 CG: compare through predictions rather than raw alpha
    Xq = jnp.asarray(rng.uniform(size=(8, 2)), dtype=jnp.float32)
    ks = kern.gram(Xq, gp.x) * mask[None, :]
    np.testing.assert_allclose(np.asarray(ks @ alpha),
                               np.asarray(ks @ gp.alpha), atol=1e-3)


def test_mesh_sharded_cmaes_finds_optimum():
    """CMA-ES with its population sharded over the mesh (the multi-chip
    set_mt_feval) still converges; lambda is rounded up to the axis size."""
    from limbo_tpu.opt import Cmaes

    mesh = make_mesh(8)
    f = lambda x: -jnp.sum((x - 0.25) ** 2)
    opt = Cmaes(iterations=80, mesh=mesh)
    res = opt(f, jnp.full((2,), 0.5, dtype=jnp.float32),
              jax.random.PRNGKey(3), bounded=True)
    np.testing.assert_allclose(np.asarray(res.x), [0.25, 0.25], atol=1e-2)


def test_mesh_sharded_cmaes_restarts():
    """Sequential-scan restarts compose with the sharded population eval."""
    from limbo_tpu.opt import Cmaes

    mesh = make_mesh(8)
    f = lambda x: -jnp.sum((x - 0.8) ** 2)
    opt = Cmaes(iterations=60, restarts=2, mesh=mesh)
    res = opt(f, jnp.full((2,), 0.1, dtype=jnp.float32),
              jax.random.PRNGKey(7), bounded=True)
    np.testing.assert_allclose(np.asarray(res.x), [0.8, 0.8], atol=1e-2)


def test_mesh_sharded_nsga2_front_quality():
    """NSGA-II with sharded population eval covers the mop2-style front
    (population rounds up to a mesh-axis multiple)."""
    from limbo_tpu.opt import Nsga2

    mesh = make_mesh(8)

    def mop(x):
        f1 = -jnp.sum((x - 0.2) ** 2)
        f2 = -jnp.sum((x - 0.8) ** 2)
        return jnp.stack([f1, f2])

    opt = Nsga2(pop_size=30, generations=30, mesh=mesh)  # rounds to 32
    X, Y = opt(mop, 2, jax.random.PRNGKey(1))
    assert X.shape[0] == 32 and Y.shape == (32, 2)
    # best f1 and best f2 on the front approach their ideals (0)
    assert float(jnp.max(Y[:, 0])) > -1e-2
    assert float(jnp.max(Y[:, 1])) > -1e-2


def test_sharded_restart_weak_scaling_consistency():
    """Weak scaling semantics: doubling the mesh doubles total restarts and
    the global argmax matches an equivalent single-device run (correctness
    of the ICI collective pattern; virtual CPU mesh, so no speed claims)."""
    f = lambda x: -jnp.sum((x - 0.637) ** 2)
    results = {}
    for n_dev in (2, 4, 8):
        mesh = make_mesh(n_dev)
        res = sharded_restart_opt(mesh, Rprop(iterations=40), f,
                                  jnp.zeros(3), jax.random.PRNGKey(5), True,
                                  restarts_per_device=2)
        results[n_dev] = np.asarray(res.x)
        np.testing.assert_allclose(results[n_dev], [0.637] * 3, atol=1e-2)
