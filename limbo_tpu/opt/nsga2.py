"""NSGA-II as a fully-batched JAX evolutionary loop.

Reference capability: limbo's multi-objective layer drives sferes2's NSGA-II
(experimental/bayes_opt/bo_multi.hpp:184 update_pareto_model runs
sferes::ea::Nsga2 over the GP means with TBB-parallel evaluation).  This is a
from-scratch NSGA-II (Deb et al. 2002: fast non-dominated sorting, crowding
distance, binary tournament, SBX crossover, polynomial mutation) where the
population is a batch axis: every generation is one fused device program —
evaluation, ranking (a dominance-matrix peel), crowding, and variation are
all tensor ops, no per-individual control flow.

Convention: MAXIMIZATION of all objectives, search space [0,1]^d.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.ops.pareto import dominance_matrix

BIG = 1e30


def _ranks(Y: jax.Array) -> jax.Array:
    """Fast non-dominated sorting via iterative peeling (rank 0 = front)."""
    P = Y.shape[0]
    dom = dominance_matrix(Y)                      # dom[i, j]: j dominates i

    def body(carry, r):
        remaining, rank = carry
        blocked = jnp.any(dom & remaining[None, :], axis=1)
        nd = (~blocked) & remaining
        rank = jnp.where(nd, r, rank)
        remaining = remaining & (~nd)
        return (remaining, rank), None

    (_, rank), _ = jax.lax.scan(
        body, (jnp.ones(P, dtype=bool), jnp.zeros(P, dtype=jnp.int32)),
        jnp.arange(P, dtype=jnp.int32))
    return rank


def _crowding(Y: jax.Array, rank: jax.Array) -> jax.Array:
    """Crowding distance computed per front, vectorized per objective."""
    P, M = Y.shape
    crowd = jnp.zeros(P, dtype=Y.dtype)
    for m in range(M):
        # sort within fronts: key = rank * big + value
        key = rank.astype(Y.dtype) * BIG + Y[:, m]
        order = jnp.argsort(key)
        y_s = Y[order, m]
        r_s = rank[order]
        span = jnp.maximum(
            jax.ops.segment_max(Y[:, m], rank, num_segments=P)
            - jax.ops.segment_min(Y[:, m], rank, num_segments=P), 1e-12)
        gap = jnp.concatenate([jnp.full((1,), BIG, Y.dtype),
                               y_s[2:] - y_s[:-2],
                               jnp.full((1,), BIG, Y.dtype)]) \
            if P > 2 else jnp.full((P,), BIG, Y.dtype)
        # boundary within each front (neighbor has different rank) -> BIG
        prev_r = jnp.concatenate([jnp.full((1,), -1, rank.dtype), r_s[:-1]])
        next_r = jnp.concatenate([r_s[1:], jnp.full((1,), -1, rank.dtype)])
        boundary = (prev_r != r_s) | (next_r != r_s)
        d = jnp.where(boundary, BIG, gap / span[r_s])
        crowd = crowd.at[order].add(jnp.minimum(d, BIG))
    return crowd


def _tournament(key, rank, crowd, n: int):
    """Binary tournament on (rank asc, crowd desc); returns n winner indices."""
    P = rank.shape[0]
    i = jax.random.randint(key, (2, n), 0, P)
    a, b = i[0], i[1]
    a_better = (rank[a] < rank[b]) | ((rank[a] == rank[b])
                                      & (crowd[a] > crowd[b]))
    return jnp.where(a_better, a, b)


def _sbx(key, X1, X2, eta: float = 15.0):
    """Simulated binary crossover (per-gene)."""
    u = jax.random.uniform(key, X1.shape, dtype=X1.dtype)
    beta = jnp.where(u <= 0.5,
                     (2 * u) ** (1.0 / (eta + 1)),
                     (1.0 / (2 * (1 - u))) ** (1.0 / (eta + 1)))
    c1 = 0.5 * ((1 + beta) * X1 + (1 - beta) * X2)
    return jnp.clip(c1, 0.0, 1.0)


def _poly_mutation(key, X, eta: float = 20.0, rate: float = None):
    d = X.shape[-1]
    rate = rate if rate is not None else 1.0 / d
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, X.shape, dtype=X.dtype)
    do = jax.random.uniform(k2, X.shape, dtype=X.dtype) < rate
    delta = jnp.where(u < 0.5,
                      (2 * u) ** (1.0 / (eta + 1)) - 1.0,
                      1.0 - (2 * (1 - u)) ** (1.0 / (eta + 1)))
    return jnp.clip(X + jnp.where(do, delta, 0.0), 0.0, 1.0)


@struct.dataclass
class Nsga2:
    """Batched NSGA-II.  Call with a vmappable multi-objective function."""

    pop_size: int = struct.field(pytree_node=False, default=100)
    generations: int = struct.field(pytree_node=False, default=50)
    eta_c: float = struct.field(pytree_node=False, default=15.0)
    eta_m: float = struct.field(pytree_node=False, default=20.0)
    # optional device mesh: population evaluation shards over `mesh_axis`
    # (the multi-chip form of sferes2's TBB-parallel evaluator; pop_size is
    # rounded up to a multiple of the axis size).
    mesh: object = struct.field(pytree_node=False, default=None)
    mesh_axis: str = struct.field(pytree_node=False, default=None)

    def __call__(self, fun: Callable, dim: int, key,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
        """fun: (d,) -> (M,) objectives to maximize.  Returns the final
        population (X (P, d), Y (P, M)); the caller extracts fronts via
        ops.pareto.  jit-safe."""
        P = self.pop_size
        if self.mesh is not None:
            from limbo_tpu.parallel.sharded import make_sharded_pop_eval

            ax = (self.mesh_axis if self.mesh_axis is not None
                  else self.mesh.axis_names[0])
            P = -(-P // self.mesh.shape[ax]) * self.mesh.shape[ax]
            pop_eval = make_sharded_pop_eval(self.mesh, fun,
                                             axis=self.mesh_axis)
        else:
            pop_eval = jax.vmap(fun)
        k_init, k_loop = jax.random.split(key)
        X = jax.random.uniform(k_init, (P, dim), dtype=dtype)
        Y = pop_eval(X)

        def gen(carry, k):
            X, Y = carry
            rank = _ranks(Y)
            crowd = _crowding(Y, rank)
            k_sel, k_cx, k_mut = jax.random.split(k, 3)
            parents = _tournament(k_sel, rank, crowd, 2 * P)
            child = _sbx(k_cx, X[parents[:P]], X[parents[P:]], self.eta_c)
            child = _poly_mutation(k_mut, child, self.eta_m)
            Yc = pop_eval(child)
            # environmental selection over the 2P union
            Xu = jnp.concatenate([X, child])
            Yu = jnp.concatenate([Y, Yc])
            rank_u = _ranks(Yu)
            crowd_u = _crowding(Yu, rank_u)
            # order by (rank asc, crowd desc), keep best P
            score = rank_u.astype(Yu.dtype) * BIG - jnp.minimum(crowd_u, BIG / 2)
            order = jnp.argsort(score)[:P]
            return (Xu[order], Yu[order]), None

        keys = jax.random.split(k_loop, self.generations)
        (X, Y), _ = jax.lax.scan(gen, (X, Y), keys)
        return X, Y
