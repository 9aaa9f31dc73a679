"""Sharded compute paths: acquisition fan-out and row-sharded GP algebra.

These are the TPU-native replacements for limbo's intra-process parallelism
(TBB par::loop / par::max, tools/parallel.hpp:139-168) scaled past one chip:

* `sharded_restart_opt` — N optimizer restarts sharded over the mesh's
  "restarts" axis; each device runs a vmapped shard, then a global
  argmax rides ICI collectives (replaces tools::par::max over TBB threads).

* `RowShardedGP` helpers — kernel cross-covariance and matvec with the
  training rows sharded over the "rows" axis and psum reductions: the
  tensor-parallel path for large-n posterior means over huge candidate
  batches.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from limbo_tpu.opt.base import OptResult


def sharded_restart_opt(mesh: Mesh, sub_opt, fun: Callable, init: jax.Array,
                        key: jax.Array, bounded: bool,
                        restarts_per_device: int = 4,
                        axis: str = "restarts") -> OptResult:
    """Run (n_devices * restarts_per_device) restarts of `sub_opt` on `fun`,
    sharded across the mesh; return the global best.

    The per-device shard is an ordinary vmap; cross-device reduction is an
    all-gather of the (tiny) per-device winners followed by argmax — one
    latency-bound ICI hop, negligible next to the optimizer compute.
    """
    n_dev = mesh.shape[axis]
    total = n_dev * restarts_per_device
    d = init.shape[0]
    k_init, k_run = jax.random.split(key)
    inits = jax.random.uniform(k_init, (total, d), dtype=init.dtype)
    inits = inits.at[0].set(init)
    keys = jax.random.split(k_run, total)

    def shard_fn(inits_s, keys_s):
        res = jax.vmap(lambda x0, k: sub_opt(fun, x0, k, bounded))(
            inits_s, keys_s)
        # local winner
        i = jnp.argmax(res.value)
        local_x, local_v = res.x[i], res.value[i]
        # global winner via all_gather over the mesh axis
        xs = jax.lax.all_gather(local_x, axis)       # (n_dev, d)
        vs = jax.lax.all_gather(local_v, axis)       # (n_dev,)
        j = jnp.argmax(vs)
        return xs[j], vs[j]

    shard = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                          in_specs=(P(axis), P(axis)),
                          out_specs=(P(), P()))
    x, v = shard(inits, keys)
    return OptResult(x=x, value=v)


def make_sharded_pop_eval(mesh: Mesh, fun: Callable,
                          axis: Optional[str] = None) -> Callable:
    """Population evaluation sharded over the mesh.

    Returns an eval function (P, d) -> stacked outputs with the population
    axis sharded across devices — the multi-chip form of libcmaes's
    `set_mt_feval(true)` (opt/cmaes.hpp:272) and sferes2's TBB-parallel
    evaluator (bo_multi.hpp:184): each device vmaps `fun` over its slice of
    the population, and the all-gather back to the global view rides ICI.
    P must be a multiple of the mesh axis size.
    """
    ax = axis if axis is not None else mesh.axis_names[0]

    def eval_fn(X: jax.Array) -> jax.Array:
        if X.shape[0] % mesh.shape[ax] != 0:
            raise ValueError(
                f"population {X.shape[0]} not divisible by mesh axis "
                f"'{ax}' size {mesh.shape[ax]}")

        def shard_fn(X_s):
            return jax.vmap(fun)(X_s)

        return jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                             in_specs=(P(ax),), out_specs=P(ax))(X)

    return eval_fn


def row_sharded_posterior_mean(mesh: Mesh, kernel, x_rows: jax.Array,
                               alpha_rows: jax.Array, mean_q: jax.Array,
                               Xq: jax.Array,
                               axis: Optional[str] = None) -> jax.Array:
    """Posterior mean over a candidate batch with training rows sharded.

    mu(Xq) = K(Xq, X) @ alpha + m(Xq); with X and alpha row-sharded each
    device computes its partial (q, p) product and a psum combines them —
    the classic tensor-parallel matmul-with-reduction.

    x_rows: (N, d) sharded on axis 0; alpha_rows: (N, p) sharded on axis 0;
    mean_q: (q, p) replicated; Xq: (q, d) replicated.
    """
    if axis is None:
        axis = mesh.axis_names[0]

    def shard_fn(x_s, a_s, Xq_s, mq_s):
        ks = kernel.gram(Xq_s, x_s)                          # (q, N/n_dev)
        partial_mu = jnp.dot(ks, a_s, preferred_element_type=ks.dtype)
        return jax.lax.psum(partial_mu, axis) + mq_s

    shard = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                          in_specs=(P(axis, None), P(axis, None), P(), P()),
                          out_specs=P())
    return shard(x_rows, alpha_rows, Xq, mean_q)
