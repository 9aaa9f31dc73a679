"""Column-sharded cached acquisition + deferred update over the mesh.

At large n the BO iteration is HBM-bandwidth-bound: every ascent step reads
the full n x n K^{-1} (mirror) once (docs/BENCHMARKS.md "HLO audit" — the
single-chip acquisition phase sits at the achievable-bandwidth floor).  The
multi-chip answer is to shard that read: K^{-1} (and its bf16 query mirror)
lives column-sharded over the mesh, each device contracts its (N, N/D)
panel, and one psum of the per-candidate partial quadratic forms (q floats)
plus one all_gather of the (q, N/D) partial products in the backward pass
ride ICI.  The ascent itself is replicated — its per-step compute is
negligible next to the panel read, and replication keeps every device's RNG
and trajectory bitwise identical, so no divergence handling is needed.

This is the scaling story for the dominant phase of the reference's hot
loop (boptimizer.hpp:150-167 at large n): acquisition bandwidth scales with
device count, while the deferred update's flush GEMM and ay/u_ones refresh
shard over the same axis.

No reference counterpart: limbo is single-process shared-memory
(SURVEY.md section 2.4); this module is part of the new first-class
distribution layer.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from limbo_tpu.kernels.base import effective_jitter
from limbo_tpu.means.means import (ConstantMean, DataMean, NullMean,
                                   prepare_mean)
from limbo_tpu.models import gp as gp_mod

# ---------------------------------------------------------------------------
# sharded symmetric quadratic form (the hot read)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sharded_sym_quad(axis: str, ks: jax.Array,
                      Kq_local: jax.Array) -> jax.Array:
    """diag(ks Kinv ks^T) with Kinv column-sharded over `axis`.

    Runs INSIDE shard_map: ks is the full replicated (q, N) cross-covariance,
    Kq_local the device's (N, N/D) column panel.  Forward: one local panel
    contraction + a psum of (q,) partial sums.  Backward (symmetric-VJP
    trick, see gp._sym_quad_diag): d/dks = 2 (ks Kinv) = 2 concat_d(t_d) —
    one all_gather of the saved (q, N/D) partials instead of a second panel
    read.
    """
    t_loc, s_loc = _sq_partials(axis, ks, Kq_local)
    return jax.lax.psum(s_loc, axis)


def _sq_partials(axis, ks, Kq_local):
    nloc = Kq_local.shape[1]
    off = jax.lax.axis_index(axis) * nloc
    t_loc = jnp.dot(ks.astype(Kq_local.dtype), Kq_local,
                    preferred_element_type=ks.dtype)          # (q, N/D)
    zero = jnp.zeros((), dtype=off.dtype)
    ks_loc = jax.lax.dynamic_slice(ks, (zero, off), (ks.shape[0], nloc))
    return t_loc, jnp.sum(t_loc * ks_loc, axis=1)


def _sharded_sym_quad_fwd(axis, ks, Kq_local):
    t_loc, s_loc = _sq_partials(axis, ks, Kq_local)
    return jax.lax.psum(s_loc, axis), (t_loc, Kq_local)


def _sharded_sym_quad_bwd(axis, res, g):
    t_loc, Kq_local = res
    t_full = jax.lax.all_gather(t_loc, axis, axis=1, tiled=True)  # (q, N)
    return (2.0 * g)[:, None] * t_full, jnp.zeros_like(Kq_local)


_sharded_sym_quad.defvjp(_sharded_sym_quad_fwd, _sharded_sym_quad_bwd)


# ---------------------------------------------------------------------------
# the sharded cached-GP view (duck-typed model for the acquisition layer)
# ---------------------------------------------------------------------------

class GPSurfaceFwd:
    """Property-forwarding mixin: the read-only GP surface the acquisition
    layer reads (kernel/mean/x/y/n/mask/capacity/dims), delegated to a
    `gp` field.  Shared by every per-device view so the surface is defined
    once (adding a field = one edit, not one per view class)."""

    @property
    def kernel(self):
        return self.gp.kernel

    @property
    def mean(self):
        return self.gp.mean

    @property
    def x(self):
        return self.gp.x

    @property
    def y(self):
        return self.gp.y

    @property
    def n(self):
        return self.gp.n

    @property
    def mask(self):
        return self.gp.mask

    @property
    def capacity(self):
        return self.gp.capacity

    @property
    def dim_in(self):
        return self.gp.dim_in

    @property
    def dim_out(self):
        return self.gp.dim_out


@struct.dataclass
class ShardColsGPView(GPSurfaceFwd):
    """Per-device view of (GP, QueryCache) with K^{-1} column-sharded.

    Valid only inside a shard_map over `axis`; models.dispatch.query_any
    routes it through sharded_query_cached, so the whole acquisition layer
    (UCB/GP-UCB/EI, RandomRestarts, Rprop ascent) works unchanged on it.
    """

    gp: gp_mod.GP                      # replicated
    cache: gp_mod.QueryCache           # Kinv/Kinv_q hold LOCAL column panels
    axis: str = struct.field(pytree_node=False, default="cols")

    def query_posterior(self, Xq: jax.Array):
        """Model-protocol hook read by models.dispatch.query_any — keeps
        the dispatch free of type-name strings (renames fail at the call
        site, not silently at dispatch)."""
        return sharded_query_cached(self, Xq)


def sharded_query_cached(view: ShardColsGPView, Xq: jax.Array):
    """query_cached with the variance quadratic form column-sharded.

    The mean path (alpha matvec, N x p bytes) and the pending-pivot
    correction (N x m, m ~ 32) are replicated — negligible next to the
    N x N/D panel each device reads.
    """
    gp = view.gp
    cache = view.cache
    Xq = jnp.atleast_2d(Xq).astype(gp.x.dtype)
    mask = gp.mask
    ks = gp.kernel.gram(Xq, gp.x) * mask[None, :]                 # (q, N)
    mu = jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype) + gp.mean(Xq)
    Kq = cache.Kinv_q if cache.Kinv_q is not None else cache.Kinv
    quad = _sharded_sym_quad(view.axis, ks, Kq)
    if cache.P is not None:
        # deferred-update pending correction (replicated; see gp.QueryCache)
        idx = jnp.arange(gp.capacity)
        pend = ((idx >= cache.base_n) & (idx < gp.n)).astype(ks.dtype)
        quad = (quad
                + jnp.sum(jnp.dot(ks, cache.P,
                                  preferred_element_type=ks.dtype) ** 2,
                          axis=1)
                - jnp.sum(ks * ks * pend[None, :], axis=1))
    var = gp.kernel.k_diag(Xq) - quad
    return mu, jnp.maximum(var, 0.0)


# ---------------------------------------------------------------------------
# sharded deferred append
# ---------------------------------------------------------------------------

def sharded_add_deferred(view: ShardColsGPView, x_new: jax.Array,
                         y_new: jax.Array):
    """The deferred cached append with Kinv/mirror column panels.

    Identical math to gp._add_sample_deferred; the only sharded pieces are
    the flush — (P P^T)[:, cols_d] = P @ P[cols_d]^T is a local
    (N, m)@(m, N/D) GEMM — and the ay/u_ones refresh, whose Kinv @ rhs
    contraction psums over the column panels.
    """
    gp, cache, axis = view.gp, view.cache, view.axis
    if cache.Linv is None or cache.P is None:
        raise ValueError("sharded deferred updates need "
                         "QueryCache.build(with_Linv=True, defer_m > 0)")
    if cache.Kinv is None:
        raise ValueError("sharded deferred updates need the f32 K^{-1} "
                         "master (lite caches are not supported on this "
                         "path — see parallel.sharded_big)")
    if not isinstance(gp.mean, (NullMean, ConstantMean, DataMean)):
        raise ValueError("deferred updates support constant-type means only")
    from limbo_tpu.ops.trimv import trimv

    i = gp.n
    mask = gp.mask
    dtype = gp.x.dtype
    N = gp.capacity
    x_new = jnp.asarray(x_new, dtype=dtype)
    y_new = jnp.asarray(y_new, dtype=dtype)
    k_vec = gp.kernel.gram(x_new[None, :], gp.x)[0] * mask
    diag_add = gp.kernel.train_diag_add(x_new[None, :])[0]
    kappa = gp.kernel.k_diag(x_new[None, :])[0] + diag_add
    # noise-aware Schur floor (see gp.add_sample_cached)
    s_floor = jnp.maximum(diag_add, effective_jitter(dtype) * kappa)
    e_i = (jnp.arange(N) == i).astype(dtype)

    l = trimv(cache.Linv, k_vec) * mask
    u = trimv(cache.Linv, l, transpose=True) * mask
    s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
    d = jnp.sqrt(s)
    v = u - e_i
    L = gp.L.at[i].set(l * mask + d * e_i)
    Linv = cache.Linv.at[i].set(-(u / d) * mask + (1.0 / d) * e_i)

    x = gp.x.at[i].set(x_new)
    y = gp.y.at[i].set(y_new)
    gp2 = gp.replace(x=x, y=y, n=i + 1, L=L)
    mask2 = gp2.mask
    ym = y * mask2[:, None]
    ay = cache.ay + v[:, None] * (jnp.dot(v, ym) / s)[None, :]
    u_ones = cache.u_ones + v * (jnp.dot(v, mask2) / s)
    m = cache.P.shape[1]
    count = i - cache.base_n
    Pbuf = jax.lax.dynamic_update_slice(cache.P, (v / d)[:, None],
                                        (jnp.asarray(0, count.dtype), count))
    nloc = cache.Kinv.shape[1]
    off = jax.lax.axis_index(axis) * nloc
    cols = off + jnp.arange(nloc)

    def flush(_):
        pend_loc = ((cols >= cache.base_n) & (cols <= i)).astype(dtype)
        zero = jnp.zeros((), dtype=off.dtype)
        P_rows = jax.lax.dynamic_slice(Pbuf, (off, zero), (nloc, m))
        Kinv_loc = (cache.Kinv
                    + jnp.dot(Pbuf, P_rows.T, preferred_element_type=dtype)
                    - jnp.where(jnp.arange(N)[:, None] == cols[None, :],
                                pend_loc[None, :], 0.0))
        rhs = jnp.concatenate([ym, mask2[:, None]], axis=1)
        rhs_loc = jax.lax.dynamic_slice(rhs, (off, zero),
                                        (nloc, rhs.shape[1]))
        a = jax.lax.psum(
            jnp.dot(Kinv_loc, rhs_loc, preferred_element_type=dtype), axis)
        mirror = (Kinv_loc.astype(cache.Kinv_q.dtype)
                  if cache.Kinv_q is not None else None)
        return (Kinv_loc, mirror, jnp.zeros_like(Pbuf),
                (i + 1).astype(cache.base_n.dtype), a[:, :-1], a[:, -1])

    def keep(_):
        return (cache.Kinv, cache.Kinv_q, Pbuf, cache.base_n, ay, u_ones)

    Kinv, Kinv_q, Pbuf, base_n, ay, u_ones = jax.lax.cond(
        count + 1 >= m, flush, keep, None)

    mean = prepare_mean(gp2.mean, y, mask2)
    mu_bar = mean(x_new[None, :])[0]
    alpha = ay - u_ones[:, None] * mu_bar[None, :].astype(dtype)
    new_cache = gp_mod.QueryCache(Kinv=Kinv, K=None, Linv=Linv,
                                  Kinv_q=Kinv_q, P=Pbuf, base_n=base_n,
                                  ay=ay, u_ones=u_ones)
    return view.replace(gp=gp2.replace(mean=mean, alpha=alpha),
                        cache=new_cache)


# ---------------------------------------------------------------------------
# placement + drivers
# ---------------------------------------------------------------------------

def cache_specs(axis: str, cache: gp_mod.QueryCache) -> gp_mod.QueryCache:
    """PartitionSpec tree for a QueryCache: Kinv/Kinv_q column panels over
    `axis`, everything else replicated."""
    col = P(None, axis)
    return gp_mod.QueryCache(
        Kinv=col,
        K=col if cache.K is not None else None,
        Linv=P() if cache.Linv is not None else None,
        Kinv_q=col if cache.Kinv_q is not None else None,
        P=P() if cache.P is not None else None,
        base_n=P() if cache.base_n is not None else None,
        ay=P() if cache.ay is not None else None,
        u_ones=P() if cache.u_ones is not None else None)


def shard_cache_cols(mesh: Mesh, cache: gp_mod.QueryCache,
                     axis: Optional[str] = None) -> gp_mod.QueryCache:
    """Place a QueryCache on the mesh with K^{-1}/mirror column-sharded."""
    ax = axis if axis is not None else mesh.axis_names[0]
    n_dev = mesh.shape[ax]
    if cache.Kinv is None:
        raise ValueError(
            "lite caches (Kinv=None) cannot be column-sharded here — use "
            "parallel.sharded_big (which shards the factor too) or build "
            "the cache without lite=True")
    if cache.Kinv.shape[1] % n_dev != 0:
        raise ValueError(
            f"capacity {cache.Kinv.shape[1]} not divisible by mesh axis "
            f"{n_dev} (pad the capacity)")
    specs = cache_specs(ax, cache)
    return jax.tree.map(
        lambda v, sp: (None if v is None
                       else jax.device_put(v, NamedSharding(mesh, sp))),
        cache, specs,
        is_leaf=lambda v: v is None)


def make_sharded_bo_iter(mesh: Mesh, f: Callable, acqui, acqui_optimizer,
                         aggregator=None, bounded: bool = True,
                         axis: Optional[str] = None) -> Callable:
    """One full large-n BO iteration under one shard_map: replicated
    acquisition maximization reading column panels of K^{-1}, a JAX-traceable
    objective evaluation, and the sharded deferred append.

    Returns iter_fn(gp, cache, key, iteration) -> (gp, cache, x, y); jit it
    with donated gp/cache for in-place panel updates.  `cache` must be built
    with with_Linv=True and defer_m > 0 and placed by shard_cache_cols.
    """
    from limbo_tpu.acqui.acqui import EI, FirstElem
    agg = aggregator if aggregator is not None else FirstElem
    ax = axis if axis is not None else mesh.axis_names[0]

    def body(gp, cache, key, iteration):
        view = ShardColsGPView(gp=gp, cache=cache, axis=ax)
        f_max = (acqui.best_predicted(view, agg)
                 if isinstance(acqui, EI) else None)

        def acq_fn(xc):
            if isinstance(acqui, EI):
                return acqui(view, xc, agg, iteration, f_max=f_max)
            return acqui(view, xc, agg, iteration)

        start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
        res = acqui_optimizer(acq_fn, start, key, bounded)
        y = f(res.x).astype(gp.x.dtype)
        view = sharded_add_deferred(view, res.x, y)
        return view.gp, view.cache, res.x, y

    def run(gp, cache, key, iteration):
        cspec = cache_specs(ax, cache)
        return jax.shard_map(
            body, mesh=mesh, check_vma=False,
            in_specs=(P(), cspec, P(), P()),
            out_specs=(P(), cspec, P(), P()))(gp, cache, key, iteration)

    return run
