"""MultiGP: one independent GP per output dimension.

Reference: src/limbo/model/multi_gp.hpp:61 — a wrapper holding one GP per
output (each may have different kernel hyperparameters), with the mean
function applied at the wrapper level and TBB-parallel per-output compute
(multi_gp.hpp:124) / hyperparameter optimization
(multi_gp/parallel_lf_opt.hpp:57).

TPU-first: the sub-GPs are ONE stacked pytree (every array leaf gains a
leading (p,) axis) and all operations are `vmap`s of the single-GP functions
— per-output parallelism compiles to batched kernels on one chip and shards
across chips by the stack axis, replacing TBB threads.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.means.means import NullMean, prepare_mean
from limbo_tpu.models import gp as gp_mod


@struct.dataclass
class MultiGP:
    """Stacked per-output GPs + a wrapper-level mean function.

    gps: a GP pytree whose array leaves have leading axis p (the output dim);
         each sub-GP is single-output with a NullMean (the wrapper subtracts
         its own mean, matching limbo's design).
    mean: wrapper mean function (q, d) -> (q, p).
    """

    gps: gp_mod.GP
    mean: object

    @property
    def dim_in(self) -> int:
        return self.gps.x.shape[2]

    @property
    def dim_out(self) -> int:
        return self.gps.x.shape[0]

    @property
    def capacity(self) -> int:
        return self.gps.x.shape[1]

    @property
    def n(self) -> jax.Array:
        return self.gps.n[0]

    @property
    def nb_samples(self) -> jax.Array:
        return self.gps.n[0]


def _stack_kernels(kernel, p: int):
    """Broadcast one kernel's params to a (p,)-stacked kernel pytree."""
    return jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (p,) + jnp.shape(leaf)), kernel)


def empty(kernel, mean, dim_in: int, dim_out: int,
          capacity: int = gp_mod.DEFAULT_CAPACITY, dtype=jnp.float32) -> MultiGP:
    """dim_out empty sub-GPs sharing the kernel *structure* (params may then
    diverge under per-output hp-opt)."""
    kernels = _stack_kernels(kernel, dim_out)
    sub = jax.vmap(
        lambda k: gp_mod.empty(k, NullMean(dim_out=1), dim_in, 1, capacity,
                               dtype=dtype))(kernels)
    return MultiGP(gps=sub, mean=mean)


def fit(kernel, mean, X: jax.Array, Y: jax.Array,
        capacity: Optional[int] = None) -> MultiGP:
    """Fit all outputs in one vmapped batch (limbo multi_gp.hpp:124 compute).

    X: (n, d); Y: (n, p).
    """
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    n, d = X.shape
    p = Y.shape[1]
    N = capacity if capacity is not None else gp_mod._round_capacity(n)
    mask = (jnp.arange(N) < n).astype(X.dtype)
    ypad = jnp.zeros((N, p), dtype=X.dtype).at[:n].set(Y)
    mean = prepare_mean(mean, ypad, mask)
    xpad = jnp.zeros((N, d), dtype=X.dtype).at[:n].set(X)
    centered = (ypad - mean(xpad)) * mask[:, None]        # (N, p)
    kernels = _stack_kernels(kernel, p)

    def fit_one(k, yc):
        g = gp_mod.GP(kernel=k, mean=NullMean(dim_out=1),
                      x=xpad, y=yc[:, None],
                      n=jnp.asarray(n, jnp.int32),
                      L=jnp.eye(N, dtype=X.dtype),
                      alpha=jnp.zeros((N, 1), dtype=X.dtype))
        return gp_mod.recompute(g, update_obs_mean=False)

    sub = jax.vmap(fit_one)(kernels, centered.T)
    return MultiGP(gps=sub, mean=mean)


def recompute(m: MultiGP, update_obs_mean: bool = True) -> MultiGP:
    """Recompute every sub-GP after hyperparameter/mean changes
    (limbo multi_gp.hpp recompute:254)."""
    if update_obs_mean:
        # rebuild wrapper mean from raw observations, then re-center sub-ys
        Y = observations_padded(m)
        mask = m.gps.mask[0]
        mean = prepare_mean(m.mean, Y, mask)
        centered = (Y - mean(m.gps.x[0])) * mask[:, None]
        sub = m.gps.replace(y=centered.T[:, :, None])
        sub = jax.vmap(lambda g: gp_mod.recompute(g, update_obs_mean=False))(sub)
        return MultiGP(gps=sub, mean=mean)
    sub = jax.vmap(lambda g: gp_mod.recompute(g, update_obs_mean=False))(m.gps)
    return m.replace(gps=sub)


def observations_padded(m: MultiGP) -> jax.Array:
    """Raw (N, p) observations reconstructed from centered sub-ys + mean."""
    mask = m.gps.mask[0]
    centered = m.gps.y[:, :, 0].T                          # (N, p)
    return (centered + m.mean(m.gps.x[0]) * mask[:, None]) * mask[:, None]


def add_sample(m: MultiGP, x_new: jax.Array, y_new: jax.Array) -> MultiGP:
    """Rank-1 update of every sub-GP (vmapped limbo multi_gp add_sample).

    NOTE on means: limbo recenters against the (data-dependent) wrapper mean
    only on recompute; for exact parity with our batch `fit`, a DataMean
    wrapper requires recompute() after adds.  For fixed means (Null/Constant)
    the incremental update is exact.
    """
    y_new = jnp.atleast_1d(y_new)
    mean_at = m.mean(x_new[None, :])[0]                    # (p,)
    centered = (y_new - mean_at)                           # (p,)
    sub = jax.vmap(lambda g, yc: gp_mod.add_sample(g, x_new, yc[None]))(
        m.gps, centered)
    return m.replace(gps=sub)


def query(m: MultiGP, Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(mu (q, p), sigma_sq (q, p)) — per-output variances, matching limbo
    MultiGP::sigma returning one value per output (multi_gp.hpp:222)."""
    Xq = jnp.atleast_2d(Xq)
    mus, vars_ = jax.vmap(lambda g: gp_mod.query(g, Xq))(m.gps)
    mu = mus[:, :, 0].T + m.mean(Xq)                       # (q, p)
    return mu, vars_.T                                     # (q, p)


@struct.dataclass
class ParallelLFOpt:
    """Per-output hyperparameter optimization, vmapped
    (limbo multi_gp/parallel_lf_opt.hpp:57 runs one hp-opt per sub-GP in a
    TBB loop; here it is one batched program)."""

    hp_opt: object   # a single-GP strategy, e.g. KernelLFOpt

    def __call__(self, m: MultiGP, key=None) -> MultiGP:
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, m.dim_out)
        sub = jax.vmap(self.hp_opt)(m.gps, keys)
        return m.replace(gps=sub)
