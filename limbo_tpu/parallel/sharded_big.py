"""Cached-K^{-1} BO at n beyond one chip's HBM.

Composes the two sharded layers into one end-to-end large-n BO path in
which NO N x N buffer ever materializes on a single device:

  * fit: `parallel.sharded_chol.sharded_fit` — row-sharded blocked Cholesky
    (exact factor, LML, alpha);
  * cache build: K^{-1} column panels solved straight from the row-sharded
    factor (`sharded_cache_from_fit`) — panel p is one distributed
    two-triangular-solve with the identity columns as right-hand sides,
    kept only by its owner;
  * iterate: `make_big_bo_iter` — the column-sharded acquisition of
    `parallel.sharded_acq` plus a distributed append: the pivot
    u = K^{-1} k comes from the SAME distributed solves against the
    maintained row-sharded factor (solve-grade accuracy), the new Cholesky
    row is an O(N) owner-local write, and the K^{-1} panels take the
    deferred rank-m flush locally.

Memory per device: L (N^2/D) + Kinv panel (N^2/D in the mirror dtype) +
O(N) vectors, with build/flush transients bounded by the solve strip width
(3 x N x strip words, strip <= 2048) — an 8-device v5e slice holds
n ~ 100k where one chip tops out near 32k (see docs/BENCHMARKS.md).

No reference counterpart (limbo is single-process shared-memory,
SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from limbo_tpu.kernels.base import effective_jitter
from limbo_tpu.means.means import (ConstantMean, DataMean, NullMean,
                                   prepare_mean)
from limbo_tpu.parallel.sharded_acq import GPSurfaceFwd, _sharded_sym_quad
from limbo_tpu.parallel.sharded_chol import ShardedGP, _owner_extract


@struct.dataclass
class BigGP:
    """GP state for n past one chip: the factor row-sharded, the K^{-1}
    query panels column-sharded, O(N) vectors replicated.

    Duck-types the GP surface the acquisition layer reads (kernel, mean,
    x, y, n, mask, capacity, dims); posterior queries run through the
    column-sharded quadratic form + the pending-pivot window (deferred
    update, always on here).
    """

    kernel: object
    mean: object
    x: jax.Array            # (N, d) replicated
    y: jax.Array            # (N, p) replicated
    n: jax.Array            # () int32
    L: jax.Array            # (N, N) row-sharded (P(axis, None))
    L11invs: jax.Array      # (nb, B, B) replicated diagonal-block inverses
    alpha: jax.Array        # (N, p) replicated
    Kq: jax.Array           # (N, N) column-sharded K^{-1} mirror (P(None, axis))
    P: jax.Array            # (N, m) replicated pending scaled pivots
    base_n: jax.Array       # () int32 — n at the last flush
    ay: jax.Array           # (N, p) replicated — K^{-1} (y masked)
    u_ones: jax.Array       # (N,) replicated — K^{-1} mask
    block: int = struct.field(pytree_node=False, default=256)
    axis: str = struct.field(pytree_node=False, default="rows")

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dim_in(self) -> int:
        return self.x.shape[1]

    @property
    def dim_out(self) -> int:
        return self.y.shape[1]

    @property
    def mask(self) -> jax.Array:
        return (jnp.arange(self.capacity) < self.n).astype(self.x.dtype)


def _specs(big: BigGP) -> BigGP:
    """PartitionSpec (prefix) tree for a BigGP — static fields must match
    the value's statics for the treedefs to agree."""
    axis = big.axis
    return BigGP(kernel=P(), mean=P(), x=P(), y=P(), n=P(),
                 L=P(axis, None), L11invs=P(), alpha=P(),
                 Kq=P(None, axis), P=P(), base_n=P(), ay=P(), u_ones=P(),
                 block=big.block, axis=axis)


def _dist_cho_solve(L_loc, L11invs, C, row0, rows_loc: int, N: int,
                    block: int, axis: str) -> jax.Array:
    """a = K^{-1} C against the row-sharded factor (C replicated (N, q)).

    Forward right-looking then backward left-looking substitution; per step
    one local (rows_loc, B) x (B, q) GEMM and one (B, q) psum.  Same
    primitives as sharded_chol._factor_loop's solve, standalone.
    """
    nb = N // block
    dtype = L_loc.dtype
    q = C.shape[1]
    grow = row0 + jnp.arange(rows_loc)
    r_loc = jax.lax.dynamic_slice(C, (row0, jnp.zeros_like(row0)),
                                  (rows_loc, q))
    w = jnp.zeros((N, q), dtype)
    for k in range(nb):
        j0 = k * block
        rk = _owner_extract(r_loc, row0, rows_loc, j0, block, q, axis)
        wk = jnp.dot(L11invs[k], rk, preferred_element_type=dtype)
        w = jax.lax.dynamic_update_slice(w, wk, (j0, 0))
        r_loc = r_loc - jnp.dot(L_loc[:, j0:j0 + block], wk,
                                preferred_element_type=dtype)
    a = jnp.zeros((N, q), dtype)
    for k in reversed(range(nb)):
        j0 = k * block
        j1 = j0 + block
        Lcol_tail = jnp.where(grow[:, None] >= j1, L_loc[:, j0:j1],
                              jnp.zeros((rows_loc, block), dtype))
        a_loc = jax.lax.dynamic_slice(a, (row0, jnp.zeros_like(row0)),
                                      (rows_loc, q))
        s = jax.lax.psum(jnp.dot(Lcol_tail.T, a_loc,
                                 preferred_element_type=dtype), axis)
        ak = jnp.dot(L11invs[k].T, w[j0:j1] - s,
                     preferred_element_type=dtype)
        a = jax.lax.dynamic_update_slice(a, ak, (j0, 0))
    return a


def _build_panels(L_loc, L11invs, row0, rows_loc: int, N: int, block: int,
                  axis: str, nloc: int, qd, strip: int = 2048) -> jax.Array:
    """This device's (N, N/D) column panel of K^{-1}, solved from the
    row-sharded factor in column STRIPS of width <= `strip` — the identity
    RHS and the solve's w/a temporaries are (N, strip), so the build's
    transient footprint is a small multiple of the strip width instead of
    another full panel (3 x N x strip words vs 3 x N x N/D).

    All devices cooperate on every strip (the distributed solve needs the
    whole factor); only the strip's owner keeps the result.
    """
    from limbo_tpu.models.gp import _panel_width

    me = jax.lax.axis_index(axis)
    n_dev = N // nloc
    w_s = _panel_width(nloc, strip)
    dtype = L_loc.dtype
    Kq_loc = jnp.zeros((N, nloc), qd)
    for pnl in range(n_dev):
        for s0 in range(0, nloc, w_s):
            cols = pnl * nloc + s0 + jnp.arange(w_s)
            E = (jnp.arange(N)[:, None] == cols[None, :]).astype(dtype)
            a = _dist_cho_solve(L_loc, L11invs, E, row0, rows_loc, N,
                                block, axis)
            cur = jax.lax.dynamic_slice(Kq_loc, (0, s0), (N, w_s))
            Kq_loc = jax.lax.dynamic_update_slice(
                Kq_loc, jnp.where(me == pnl, a.astype(qd), cur), (0, s0))
    return Kq_loc


def sharded_cache_from_fit(mesh: Mesh, sgp: ShardedGP,
                           qdtype=None, defer_m: int = 64) -> BigGP:
    """Build the column-sharded K^{-1} mirror straight from the row-sharded
    factor: panel p = K^{-1} E_p by one distributed two-triangular solve,
    all devices cooperating, owner p keeping the result.

    Total communication over the build is O(N^2) words (D panels x nb psums
    of (B, N/D)) — the once-per-refresh price of never materializing K^{-1}
    on one device.
    """
    axis = sgp.axis
    n_dev = mesh.shape[axis]
    N = sgp.capacity
    block = sgp.block
    rows_loc = N // n_dev
    nloc = N // n_dev
    qd = qdtype if qdtype is not None else sgp.x.dtype

    def body(L_loc, L11invs, yx):
        row0 = jax.lax.axis_index(axis) * rows_loc
        Kq_loc = _build_panels(L_loc, L11invs, row0, rows_loc, N, block,
                               axis, nloc, qd)
        # ay/u_ones from one more distributed solve (exact)
        av = _dist_cho_solve(L_loc, L11invs, yx, row0, rows_loc, N,
                             block, axis)
        return Kq_loc, av

    mask = sgp.mask
    rhs = jnp.concatenate([sgp.y * mask[:, None], mask[:, None]], axis=1)
    shard = jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(None, axis), P()))
    Kq, av = shard(sgp.L, sgp.L11invs, rhs)
    return BigGP(kernel=sgp.kernel, mean=sgp.mean, x=sgp.x, y=sgp.y,
                 n=sgp.n, L=sgp.L, L11invs=sgp.L11invs, alpha=sgp.alpha,
                 Kq=Kq, P=jnp.zeros((N, defer_m), sgp.x.dtype),
                 base_n=sgp.n.astype(jnp.int32),
                 ay=av[:, :-1], u_ones=av[:, -1],
                 block=sgp.block, axis=sgp.axis)


# ---------------------------------------------------------------------------
# per-device views (inside shard_map)
# ---------------------------------------------------------------------------

@struct.dataclass
class _BigLocalView(GPSurfaceFwd):
    """Duck-typed (gp, cache)-like pair for the acquisition layer, built
    from a BigGP's per-device shards inside shard_map (the GP surface
    forwards through the shared GPSurfaceFwd mixin)."""

    gp: BigGP              # leaves are LOCAL shards here
    axis: str = struct.field(pytree_node=False, default="rows")

    def query_posterior(self, Xq: jax.Array):
        """Model-protocol hook read by models.dispatch.query_any."""
        return big_query(self, Xq)


def big_query(view: _BigLocalView, Xq: jax.Array):
    """Posterior (mu, var) through the column-sharded mirror + pending
    pivots (the sharded_acq quadratic form against BigGP state)."""
    big = view.gp
    Xq = jnp.atleast_2d(Xq).astype(big.x.dtype)
    mask = big.mask
    ks = big.kernel.gram(Xq, big.x) * mask[None, :]
    mu = (jnp.dot(ks, big.alpha, preferred_element_type=ks.dtype)
          + big.mean(Xq))
    quad = _sharded_sym_quad(view.axis, ks, big.Kq)
    idx = jnp.arange(big.capacity)
    pend = ((idx >= big.base_n) & (idx < big.n)).astype(ks.dtype)
    quad = (quad
            + jnp.sum(jnp.dot(ks, big.P,
                              preferred_element_type=ks.dtype) ** 2, axis=1)
            - jnp.sum(ks * ks * pend[None, :], axis=1))
    var = big.kernel.k_diag(Xq) - quad
    return mu, jnp.maximum(var, 0.0)


def _big_add(big: BigGP, x_new: jax.Array, y_new: jax.Array,
             axis: str) -> BigGP:
    """Distributed append: pivot by two distributed triangular solves
    against the row-sharded factor, O(N) owner-local row write, deferred
    rank-m panel flush.  Runs INSIDE shard_map."""
    if not isinstance(big.mean, (NullMean, ConstantMean, DataMean)):
        raise ValueError("big appends support constant-type means only")
    N = big.capacity
    block = big.block
    rows_loc = big.L.shape[0]
    nloc = big.Kq.shape[1]
    dtype = big.x.dtype
    i = big.n
    mask = big.mask
    x_new = jnp.asarray(x_new, dtype=dtype)
    y_new = jnp.asarray(y_new, dtype=dtype)
    k_vec = big.kernel.gram(x_new[None, :], big.x)[0] * mask
    diag_add = big.kernel.train_diag_add(x_new[None, :])[0]
    kappa = big.kernel.k_diag(x_new[None, :])[0] + diag_add
    # noise-aware Schur floor (see gp.add_sample_cached)
    s_floor = jnp.maximum(diag_add, effective_jitter(dtype) * kappa)
    e_i = (jnp.arange(N) == i).astype(dtype)
    row0 = jax.lax.axis_index(axis) * rows_loc

    # --- pivot: l = L^{-1} k (forward only), u = L^{-T} l (backward) -----
    nb = N // block
    grow = row0 + jnp.arange(rows_loc)
    r_loc = jax.lax.dynamic_slice(k_vec[:, None],
                                  (row0, jnp.zeros_like(row0)),
                                  (rows_loc, 1))
    l = jnp.zeros((N,), dtype)
    for k in range(nb):
        j0 = k * block
        rk = _owner_extract(r_loc, row0, rows_loc, j0, block, 1, axis)
        wk = jnp.dot(big.L11invs[k], rk, preferred_element_type=dtype)
        l = jax.lax.dynamic_update_slice(l, wk[:, 0], (j0,))
        r_loc = r_loc - jnp.dot(big.L[:, j0:j0 + block], wk,
                                preferred_element_type=dtype)
    u = jnp.zeros((N,), dtype)
    for k in reversed(range(nb)):
        j0 = k * block
        j1 = j0 + block
        Lcol_tail = jnp.where(grow[:, None] >= j1, big.L[:, j0:j1],
                              jnp.zeros((rows_loc, block), dtype))
        u_loc = jax.lax.dynamic_slice(u[:, None],
                                      (row0, jnp.zeros_like(row0)),
                                      (rows_loc, 1))
        s_ = jax.lax.psum(jnp.dot(Lcol_tail.T, u_loc,
                                  preferred_element_type=dtype), axis)
        ak = jnp.dot(big.L11invs[k].T, l[j0:j1, None] - s_,
                     preferred_element_type=dtype)
        u = jax.lax.dynamic_update_slice(u, ak[:, 0], (j0,))
    l = l * mask
    u = u * mask
    s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
    d = jnp.sqrt(s)
    v = u - e_i

    # --- O(N) owner-local row write into the sharded factor -------------
    new_row = l * mask + d * e_i
    idx_loc = jnp.clip(i - row0, 0, rows_loc - 1)
    own = (row0 <= i) & (i < row0 + rows_loc)
    cur = jax.lax.dynamic_slice(big.L, (idx_loc, jnp.zeros_like(idx_loc)),
                                (1, N))
    L_new = jax.lax.dynamic_update_slice(
        big.L, jnp.where(own, new_row[None, :], cur),
        (idx_loc, jnp.zeros_like(idx_loc)))

    # --- refresh the diagonal-block inverse containing row i ------------
    kb = i // block
    j0b = kb * block
    # extract the updated (B, B) diagonal block (owner psum), re-invert
    cols0 = jnp.zeros_like(j0b)
    blk_rows_idx = jnp.clip(j0b - row0, 0, rows_loc - block)
    blk_cand = jax.lax.dynamic_slice(
        jax.lax.dynamic_slice(L_new, (cols0, j0b), (rows_loc, block)),
        (blk_rows_idx, cols0), (block, block))
    own_blk = (row0 <= j0b) & (j0b + block <= row0 + rows_loc)
    blk = jax.lax.psum(jnp.where(own_blk, blk_cand,
                                 jnp.zeros_like(blk_cand)), axis)
    inv_blk = jax.lax.linalg.triangular_solve(
        blk, jnp.eye(block, dtype=dtype), left_side=True, lower=True)
    L11invs_new = jax.lax.dynamic_update_slice(
        big.L11invs, inv_blk[None], (kb, cols0, cols0))

    # --- O(N) bordered recurrences + deferred panel bookkeeping ----------
    x = big.x.at[i].set(x_new)
    y = big.y.at[i].set(y_new)
    n_new = i + 1
    mask2 = (jnp.arange(N) < n_new).astype(dtype)
    ym = y * mask2[:, None]
    ay = big.ay + v[:, None] * (jnp.dot(v, ym) / s)[None, :]
    u_ones = big.u_ones + v * (jnp.dot(v, mask2) / s)
    m = big.P.shape[1]
    count = i - big.base_n
    Pbuf = jax.lax.dynamic_update_slice(big.P, (v / d)[:, None],
                                        (jnp.asarray(0, count.dtype), count))
    off = jax.lax.axis_index(axis) * nloc
    cols = off + jnp.arange(nloc)

    def flush(_):
        rhs = jnp.concatenate([ym, mask2[:, None]], axis=1)
        zero = jnp.zeros((), off.dtype)
        if big.Kq.dtype != dtype:
            # low-precision panels: an in-place add is INVALID (the
            # correction's entries sit below the mirror's quantization
            # step and are silently absorbed — same measured failure as
            # the single-device lite cache).  Rebuild this device's panel
            # exactly from the just-updated row-sharded factor, and
            # re-derive ay/u_ones by an exact distributed solve.  Size
            # defer_m large: this flush costs a full cache build.
            Kq_loc = _build_panels(L_new, L11invs_new, row0, rows_loc, N,
                                   block, axis, nloc, big.Kq.dtype)
            av = _dist_cho_solve(L_new, L11invs_new, rhs, row0, rows_loc,
                                 N, block, axis)
            return (Kq_loc, jnp.zeros_like(Pbuf),
                    (i + 1).astype(big.base_n.dtype),
                    av[:, :-1], av[:, -1])
        pend_loc = ((cols >= big.base_n) & (cols <= i)).astype(dtype)
        P_rows = jax.lax.dynamic_slice(Pbuf, (off, zero), (nloc, m))
        corr = (jnp.dot(Pbuf, P_rows.T, preferred_element_type=dtype)
                - jnp.where(jnp.arange(N)[:, None] == cols[None, :],
                            pend_loc[None, :], 0.0))
        Kq_loc = big.Kq + corr
        rhs_loc = jax.lax.dynamic_slice(rhs, (off, zero),
                                        (nloc, rhs.shape[1]))
        a = jax.lax.psum(
            jnp.dot(Kq_loc, rhs_loc, preferred_element_type=dtype), axis)
        return (Kq_loc, jnp.zeros_like(Pbuf),
                (i + 1).astype(big.base_n.dtype), a[:, :-1], a[:, -1])

    def keep(_):
        return (big.Kq, Pbuf, big.base_n, ay, u_ones)

    Kq, Pbuf, base_n, ay, u_ones = jax.lax.cond(count + 1 >= m, flush,
                                                keep, None)
    mean = prepare_mean(big.mean, y, mask2)
    mu_bar = mean(x_new[None, :])[0]
    alpha = ay - u_ones[:, None] * mu_bar[None, :].astype(dtype)
    return big.replace(mean=mean, x=x, y=y, n=n_new, L=L_new,
                       L11invs=L11invs_new, alpha=alpha, Kq=Kq, P=Pbuf,
                       base_n=base_n, ay=ay, u_ones=u_ones)


def _acq_closure(big: BigGP, acqui, agg, iteration):
    """Per-device acquisition callable over the local BigGP view (shared by
    the fused iterate and the propose-only step)."""
    from limbo_tpu.acqui.acqui import EI

    view = _BigLocalView(gp=big, axis=big.axis)
    f_max = (acqui.best_predicted(view, agg)
             if isinstance(acqui, EI) else None)

    def acq_fn(xc):
        if isinstance(acqui, EI):
            return acqui(view, xc, agg, iteration, f_max=f_max)
        return acqui(view, xc, agg, iteration)

    return acq_fn


def make_big_propose(mesh: Mesh, acqui, acqui_optimizer, aggregator=None,
                     bounded: bool = True) -> Callable:
    """Acquisition-only step for HOST-evaluated objectives:
    propose(big, key, iteration) -> (x, acq_value).  Pairs with
    make_big_add for the ask/tell flow (bo.distributed.DistributedBOptimizer);
    use make_big_bo_iter when the objective is jittable on-device."""
    from limbo_tpu.acqui.acqui import FirstElem
    agg = aggregator if aggregator is not None else FirstElem

    def body(big, key, iteration):
        acq_fn = _acq_closure(big, acqui, agg, iteration)
        start = jnp.full((big.dim_in,), 0.5, dtype=big.x.dtype)
        res = acqui_optimizer(acq_fn, start, key, bounded)
        return res.x, res.value

    def run(big, key, iteration):
        spec = _specs(big)
        return jax.shard_map(
            body, mesh=mesh, check_vma=False,
            in_specs=(spec, P(), P()), out_specs=(P(), P()))(
                big, key, iteration)

    return run


def make_big_add(mesh: Mesh) -> Callable:
    """Distributed append: add(big, x, y) -> big (jit with donate_argnums=0
    so the factor/panel updates happen in place)."""

    def body(big, x_new, y_new):
        return _big_add(big, x_new, y_new, big.axis)

    def run(big, x_new, y_new):
        spec = _specs(big)
        return jax.shard_map(
            body, mesh=mesh, check_vma=False,
            in_specs=(spec, P(), P()), out_specs=spec)(big, x_new, y_new)

    return run


def make_big_bo_iter(mesh: Mesh, f: Callable, acqui, acqui_optimizer,
                     aggregator=None, bounded: bool = True) -> Callable:
    """One BO iteration at beyond-one-chip n, under one shard_map:
    column-sharded acquisition + distributed-solve append.

    iter_fn(big, key, iteration) -> (big, x, y); jit with donate_argnums=0
    for in-place panel updates.
    """
    from limbo_tpu.acqui.acqui import FirstElem
    agg = aggregator if aggregator is not None else FirstElem

    def body(big, key, iteration):
        acq_fn = _acq_closure(big, acqui, agg, iteration)
        start = jnp.full((big.dim_in,), 0.5, dtype=big.x.dtype)
        res = acqui_optimizer(acq_fn, start, key, bounded)
        y = f(res.x).astype(big.x.dtype)
        big = _big_add(big, res.x, y, big.axis)
        return big, res.x, y

    def run(big, key, iteration):
        spec = _specs(big)
        return jax.shard_map(
            body, mesh=mesh, check_vma=False,
            in_specs=(spec, P(), P()),
            out_specs=(spec, P(), P()))(big, key, iteration)

    return run
