"""Multi-chip dry-run: jit the full training/acquisition step over a mesh.

Exercised by the driver via __graft_entry__.dryrun_multichip(n) with N virtual
CPU devices, and by tests on the 8-device CPU mesh.  This is the framework's
"full training step": hyperparameter gradient update on the LML (the GP's
training), sharded acquisition fan-out with a global argmax collective, a
row-sharded (tensor-parallel) posterior-mean evaluation, and the rank-1
dataset update — one jitted program over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from limbo_tpu.acqui.acqui import UCB, FirstElem
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded import (
    row_sharded_posterior_mean,
    sharded_restart_opt,
)


def run_dryrun(n_devices: int) -> None:
    mesh = make_mesh(n_devices, axis_name="restarts")
    axis = "restarts"

    n, d, q = 32, 3, 16
    key = jax.random.PRNGKey(0)
    kx, ky, kq, kstep = jax.random.split(key, 4)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.sin(jnp.sum(X, axis=1, keepdims=True)) \
        + 0.05 * jax.random.normal(ky, (n, 1), dtype=jnp.float32)
    Xq = jax.random.uniform(kq, (q, d), dtype=jnp.float32)

    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
    mean = DataMean.create(dim_out=1, dtype=jnp.float32)
    gp = gp_mod.fit(kernel, mean, X, Y, capacity=64)

    acqui = UCB(alpha=0.5)
    sub_opt = Rprop(iterations=10)

    def train_step(gp, Xq, key):
        # (1) hyperparameter gradient step on the marginal likelihood
        def lml(p):
            return gp_mod.log_marginal_likelihood(
                gp.kernel.with_params(p), gp.mean, gp.x, gp.y, gp.n)

        g = jax.grad(lml)(gp.kernel.params)
        new_params = gp.kernel.params + 1e-2 * g
        gp = gp_mod.recompute(gp.replace(kernel=gp.kernel.with_params(new_params)))

        # (2) acquisition fan-out sharded over the mesh + global argmax
        def acq_fn(x):
            return acqui(gp, x, FirstElem, 1)

        start = jnp.full((gp.dim_in,), 0.5, dtype=jnp.float32)
        res = sharded_restart_opt(mesh, sub_opt, acq_fn, start, key,
                                  bounded=True, restarts_per_device=2,
                                  axis=axis)

        # (3) row-sharded posterior mean over the candidate batch (tp-style)
        mean_q = gp.mean(Xq)
        mu_q = row_sharded_posterior_mean(
            mesh, gp.kernel, gp.x * gp.mask[:, None],
            gp.alpha, mean_q, Xq, axis=axis)

        # (4) evaluate (synthetic objective on-device) + rank-1 update
        y_new = jnp.sin(jnp.sum(res.x))[None]
        gp = gp_mod.add_sample(gp, res.x, y_new)
        return gp, res, mu_q

    repl = NamedSharding(mesh, P())
    gp = jax.device_put(gp, repl)
    Xq = jax.device_put(Xq, repl)
    step = jax.jit(train_step)
    gp2, res, mu_q = step(gp, Xq, kstep)
    jax.block_until_ready((gp2.L, res.x, mu_q))
    assert int(gp2.n) == n + 1
    assert mu_q.shape == (q, 1)
    assert bool(jnp.all(jnp.isfinite(mu_q)))

    # ---- sharded blocked Cholesky: exact GP fit + query with the factor
    # row-sharded over the mesh (parallel/sharded_chol.py) ----
    from limbo_tpu.parallel.sharded_chol import sharded_fit, sharded_query

    Ns = 8 * n_devices
    Xs = jax.random.uniform(kx, (Ns, d), dtype=jnp.float32)
    Ys = jnp.cos(jnp.sum(Xs, axis=1, keepdims=True))
    sgp = sharded_fit(mesh, kernel, DataMean.create(dim_out=1,
                                                    dtype=jnp.float32),
                      Xs, Ys, block=8, axis=axis)
    mu_s, var_s = sharded_query(mesh, sgp, Xq)
    jax.block_until_ready((mu_s, var_s))
    assert bool(jnp.all(jnp.isfinite(mu_s)))
    assert bool(jnp.all(var_s >= 0.0))

    # ---- column-sharded cached acquisition + deferred append: the large-n
    # BO iteration with K^{-1} panels sharded over the mesh
    # (parallel/sharded_acq.py) ----
    from limbo_tpu.opt.compose import RandomRestarts
    from limbo_tpu.parallel.sharded_acq import (make_sharded_bo_iter,
                                                shard_cache_cols)

    mesh_c = make_mesh(n_devices, axis_name="cols")
    gp_c = gp_mod.fit(kernel, DataMean.create(dim_out=1, dtype=jnp.float32),
                      X, Y, capacity=8 * n_devices)
    cache_c = shard_cache_cols(
        mesh_c,
        jax.jit(lambda g: gp_mod.QueryCache.build(
            g, with_Linv=True, qdtype=jnp.bfloat16, defer_m=4))(gp_c))
    iter_c = jax.jit(make_sharded_bo_iter(
        mesh_c, lambda x: jnp.sin(jnp.sum(x))[None], acqui,
        RandomRestarts(sub=Rprop(iterations=5), repeats=4,
                       sweep_samples=16)))
    gp_c, cache_c, x_c, y_c = iter_c(gp_c, cache_c, kstep, jnp.asarray(0))
    jax.block_until_ready((gp_c.L, cache_c.Kinv, x_c))
    assert int(gp_c.n) == n + 1
    assert bool(jnp.all(jnp.isfinite(x_c)))

    # ---- beyond-one-chip BO (parallel/sharded_big.py): row-sharded factor
    # -> column-sharded K^{-1} panels -> one full BO iteration with the
    # distributed-solve append, under one shard_map.  This is the flagship
    # large-n composition; the driver artifact must exercise it. ----
    from limbo_tpu.parallel.sharded_big import (make_big_bo_iter,
                                                sharded_cache_from_fit)

    blk_b = 4
    Nb = blk_b * n_devices
    mesh_b = make_mesh(n_devices, axis_name="rows")
    nb_fit = min(n, Nb - 2)
    Xb = jnp.zeros((Nb, d), jnp.float32).at[:nb_fit].set(X[:nb_fit])
    Yb = jnp.zeros((Nb, 1), jnp.float32).at[:nb_fit].set(Y[:nb_fit])
    sgp_b = sharded_fit(mesh_b, kernel,
                        DataMean.create(dim_out=1, dtype=jnp.float32),
                        Xb, Yb, n=jnp.asarray(nb_fit), block=blk_b,
                        axis="rows")
    big = sharded_cache_from_fit(mesh_b, sgp_b, defer_m=4)
    iter_b = jax.jit(make_big_bo_iter(
        mesh_b, lambda x: jnp.sin(jnp.sum(x))[None], acqui,
        RandomRestarts(sub=Rprop(iterations=5), repeats=4,
                       sweep_samples=16)))
    big, x_b, y_b = iter_b(big, kstep, jnp.asarray(0))
    jax.block_until_ready((big.L, big.Kq, x_b))
    assert int(big.n) == nb_fit + 1
    assert bool(jnp.all(jnp.isfinite(x_b)))
    assert bool(jnp.all(jnp.isfinite(big.Kq)))

    # ---- 2-D mesh (restarts x rows): candidate fan-out on one axis with
    # row-sharded posterior means + psum on the other, in ONE program ----
    if n_devices >= 4 and n_devices % 2 == 0:
        run_dryrun_2d(gp, n_devices)


def run_dryrun_2d(gp, n_devices: int) -> None:
    from limbo_tpu.parallel.mesh import make_mesh_2d

    mesh2 = make_mesh_2d(n_devices // 2, 2)
    N = gp.capacity
    R = 4 * (n_devices // 2)                      # candidates, restart axis
    key = jax.random.PRNGKey(7)
    cands = jax.random.uniform(key, (R, gp.dim_in), dtype=gp.x.dtype)
    x_rows = gp.x * gp.mask[:, None]
    kernel = gp.kernel

    def shard_fn(cands_s, x_s, a_s):
        def mu_one(c):
            ks = kernel.gram(c[None, :], x_s)                 # (1, N/rows)
            part = jnp.dot(ks, a_s, preferred_element_type=ks.dtype)
            return jax.lax.psum(part, "rows")[0, 0]           # ICI reduce

        vals = jax.vmap(mu_one)(cands_s)                      # local restarts
        i = jnp.argmax(vals)
        vs = jax.lax.all_gather(vals[i], "restarts")          # DCN-axis argmax
        xs = jax.lax.all_gather(cands_s[i], "restarts")
        j = jnp.argmax(vs)
        return xs[j], vs[j]

    shard = jax.shard_map(shard_fn, mesh=mesh2, check_vma=False,
                          in_specs=(P("restarts"), P("rows"), P("rows")),
                          out_specs=(P(), P()))
    best_x, best_v = jax.jit(shard)(cands, x_rows, gp.alpha)
    jax.block_until_ready((best_x, best_v))
    # cross-check against the unsharded computation (shard_fn omits the
    # constant prior-mean term, so compare after adding it back)
    mu_all, _ = gp_mod.query(gp, cands)
    i_ref = int(jnp.argmax(mu_all[:, 0]))
    mean_off = float(gp.mean(cands[:1])[0, 0])
    assert abs(float(best_v) + mean_off - float(mu_all[i_ref, 0])) < 1e-4 * (
        1.0 + abs(float(mu_all[i_ref, 0])))
