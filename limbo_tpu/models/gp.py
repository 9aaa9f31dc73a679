"""Exact Gaussian-process regression, TPU-first.

Covers the capability surface of limbo's model::GP (src/limbo/model/gp.hpp:78):
fit, incremental rank-1 Cholesky updates, posterior query (mu, sigma^2),
log-marginal-likelihood and LOO-CV objectives, hyperparameter optimization
hooks, and serialization — redesigned around XLA's compilation model:

* **Padded fixed-capacity buffers.**  The dataset lives in (capacity, d)
  arrays with a scalar valid-count ``n``; the padded block of the kernel
  matrix is the identity (see utils.maths.masked_identity_gram).  Every
  operation is jit-compiled once per capacity, not once per dataset size —
  limbo's `add_sample` grows std::vectors (gp.hpp:126), which under XLA would
  mean a recompile per BO iteration.

* **Batched everything.**  Kernel matrices are matmul-based (MXU); queries
  take (q, d) batches; the whole GP state is a pytree, so `vmap` over GPs
  gives MultiGP for free and `lax.scan` over `add_sample` gives a fully
  on-device BO loop.

* **Autodiff replaces hand-derived gradients.**  limbo ships ~300 lines of
  manual log-lik/LOO gradients (gp.hpp:285-402); here the objectives are
  differentiable scalars and `jax.grad` does the rest.  The hand formulas
  survive only in tests as oracles.

Multi-output convention follows limbo: one shared kernel matrix for all
``p`` output dimensions, observations (n, p), alpha (n, p).  The log-lik
uses limbo's exact multi-output generalization (gp.hpp:267-281): the data
term is summed over outputs but logdet and the 2*pi constant are counted
once — a deliberate parity choice.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular

from limbo_tpu.kernels.base import JITTER, effective_jitter
from limbo_tpu.means.means import prepare_mean
from limbo_tpu.ops.chol import cholesky as chol_dispatch
from limbo_tpu.ops.chol import tri_inv as tri_inv_dispatch
from limbo_tpu.ops.chol import use_blocked_tri

DEFAULT_CAPACITY = 256


def _round_capacity(n: int) -> int:
    """Round up to a multiple of 64 (>= 2 sublane tiles) for friendly layouts."""
    return max(64, -(-n // 64) * 64)


@struct.dataclass
class GP:
    """Padded exact-GP state (pytree).

    Fields:
      kernel, mean: hyperparameter-carrying pytree dataclasses.
      x: (N, d) padded sample buffer.       y: (N, p) padded observations.
      n: scalar int32, number of valid samples.
      L: (N, N) lower Cholesky factor of the masked training covariance
         (identity on the padded block).
      alpha: (N, p) = K^{-1} (y - m(x)), zero on the padded block.
    """

    kernel: object
    mean: object
    x: jax.Array
    y: jax.Array
    n: jax.Array
    L: jax.Array
    alpha: jax.Array

    # -- static shape info ----------------------------------------------------

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

    @property
    def nb_samples(self) -> jax.Array:
        return self.n

    # -- convenience wrappers -------------------------------------------------

    def query(self, Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return query(self, Xq)

    def mu(self, Xq: jax.Array) -> jax.Array:
        return query(self, Xq)[0]

    def sigma_sq(self, Xq: jax.Array) -> jax.Array:
        return query(self, Xq)[1]


# ---------------------------------------------------------------------------
# construction / (re)computation
# ---------------------------------------------------------------------------

def empty(kernel, mean, dim_in: int, dim_out: int = 1,
          capacity: int = DEFAULT_CAPACITY, dtype=jnp.float32) -> GP:
    """A GP with no samples (query returns the prior; limbo gp.hpp:159-171)."""
    N = capacity
    return GP(
        kernel=kernel,
        mean=mean,
        x=jnp.zeros((N, dim_in), dtype=dtype),
        y=jnp.zeros((N, dim_out), dtype=dtype),
        n=jnp.asarray(0, dtype=jnp.int32),
        L=jnp.eye(N, dtype=dtype),
        alpha=jnp.zeros((N, dim_out), dtype=dtype),
    )


def fit(kernel, mean, X: jax.Array, Y: jax.Array,
        capacity: Optional[int] = None) -> GP:
    """Full GP fit (limbo GP::compute, gp.hpp:88): pad, factorize, solve.

    X: (n, d), Y: (n, p).  capacity defaults to n rounded up to 64.
    """
    X = jnp.atleast_2d(X)
    Y = jnp.atleast_2d(Y)
    n, d = X.shape
    p = Y.shape[1]
    N = capacity if capacity is not None else _round_capacity(n)
    assert N >= n, f"capacity {N} < n {n}"
    dtype = X.dtype
    xpad = jnp.zeros((N, d), dtype=dtype).at[:n].set(X)
    ypad = jnp.zeros((N, p), dtype=dtype).at[:n].set(Y.astype(dtype))
    gp = GP(kernel=kernel, mean=mean, x=xpad, y=ypad,
            n=jnp.asarray(n, dtype=jnp.int32),
            L=jnp.eye(N, dtype=dtype), alpha=jnp.zeros((N, p), dtype=dtype))
    return recompute(gp)


def recompute(gp: GP, update_obs_mean: bool = True) -> GP:
    """Re-factorize from stored data (limbo GP::recompute, gp.hpp:241).

    Called after hyperparameters change.  jit-safe: all masked, static shapes.
    """
    mask = gp.mask
    mean = prepare_mean(gp.mean, gp.y, mask) if update_obs_mean else gp.mean
    K = gp.kernel.gram_train_masked(gp.x, gp.n)   # one fused pass on TPU
    L = chol_dispatch(K)       # blocked-GEMM + Pallas panels at large n (ops/chol.py)
    # Jitter-escalation retry: if the factorization still went indefinite
    # (extreme hyperparameters mid hp-opt), refactor once with a 1000x
    # scale-aware ridge rather than poisoning every downstream query with
    # NaNs (the reference never hits this: Eigen LLT in f64 has ~9 more
    # digits of headroom, gp.hpp:550-571).  lax.cond pays the second
    # Cholesky only when triggered.
    bad = jnp.logical_not(jnp.all(jnp.isfinite(L)))
    # The ridge follows the f32 ACCUMULATION-error model, not a fixed
    # multiple: each Cholesky pivot subtracts an O(n)-term inner product
    # whose rounding grows like eps * n * max|K| — at n ~ 32k that is
    # ~4e-3, where the old 1000*eps*max|diag| (~1e-4) ridge could not
    # recover a mid-factorization breakdown (observed: NaN factor at
    # n=32768, d=8, noise=0.01).  The ridge only applies when the first
    # factorization already failed, i.e. when accuracy at this scale is
    # already lost — it makes that loss explicit and PSD.  (Same model as
    # KernelLFOpt's objective_jitter="auto", 32*eps*N*max(1, var y).)
    esc = (32.0 * effective_jitter(K.dtype) * K.shape[0]
           * jnp.max(jnp.abs(jnp.diagonal(K))))
    L = jax.lax.cond(
        bad,
        lambda: chol_dispatch(
            K + esc * jnp.eye(K.shape[0], dtype=K.dtype)),
        lambda: L)
    centered = (gp.y - mean(gp.x)) * mask[:, None]
    alpha = _cho_solve(L, centered)
    return gp.replace(mean=mean, L=L, alpha=alpha)


def _cho_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    z = solve_triangular(L, B, lower=True)
    return solve_triangular(L.T, z, lower=False)


# ---------------------------------------------------------------------------
# incremental update (rank-1 Cholesky)
# ---------------------------------------------------------------------------

def add_sample(gp: GP, x_new: jax.Array, y_new: jax.Array) -> GP:
    """O(N^2) incremental update (limbo GP::add_sample +
    _compute_incremental_kernel, gp.hpp:126,573-603).

    Appends one (d,), (p,) sample at index n.  The new Cholesky row is
    l = L^{-1} k_new (one triangular solve); the padded-identity structure of
    L makes this exact with full-capacity solves — padded entries of k are
    zero, so padded entries of l are zero.  alpha is then re-solved in O(N^2 p)
    (limbo _compute_alpha, gp.hpp:605).  Works from n=0 (L=I) with no special
    case, and is jit/scan-safe.
    """
    i = gp.n
    mask = gp.mask
    dtype = gp.x.dtype
    x_new = jnp.asarray(x_new, dtype=dtype)
    y_new = jnp.asarray(y_new, dtype=dtype)

    k_vec = gp.kernel.gram(x_new[None, :], gp.x)[0] * mask          # (N,)
    l = solve_triangular(gp.L, k_vec, lower=True)                   # (N,)
    kxx = (gp.kernel.k_diag(x_new[None, :])[0]
           + gp.kernel.train_diag_add(x_new[None, :])[0])
    # PSD-consistency guard: for a true PSD system |l|^2 <= kxx; in f32 the
    # triangular solve can overshoot (amplified cancellation once samples
    # cluster and the learned signal variance is large, sigma^2 ~ 1e3-1e4 on
    # wide-range objectives).  An absolute pivot clamp alone lets L's
    # conditioning compound multiplicatively across clustered appends until
    # entries overflow; rescaling the row to restore the invariant bounds
    # every entry of L by sqrt(max kxx) permanently, with a relative
    # eps_eff * kxx pivot floor.  (Near-duplicate samples carry almost no
    # information, so shrinking their off-diagonal mass is the honest,
    # jitter-like resolution — limbo leans on f64 Eigen headroom instead,
    # gp.hpp:573-603.)
    ll = jnp.dot(l, l)
    floor = jnp.maximum(gp.kernel.train_diag_add(x_new[None, :])[0],
                        effective_jitter(dtype) * kxx)
    ll_clamped = jnp.minimum(ll, kxx - floor)
    l = l * jnp.sqrt(ll_clamped / jnp.maximum(ll, jnp.finfo(dtype).tiny))
    d = jnp.sqrt(kxx - ll_clamped)

    N = gp.capacity
    e_i = (jnp.arange(N) == i).astype(dtype)
    new_row = l * mask + d * e_i
    L = gp.L.at[i].set(new_row)
    # keep the rest of row/col i consistent: row i had identity (e_i) before;
    # we've overwritten it.  Columns below row i are untouched (they are
    # still identity rows), which is exactly the block structure we need.
    x = gp.x.at[i].set(x_new)
    y = gp.y.at[i].set(y_new)
    n = i + 1

    gp2 = gp.replace(x=x, y=y, n=n, L=L)
    mean = prepare_mean(gp2.mean, y, gp2.mask)
    centered = (y - mean(x)) * gp2.mask[:, None]
    alpha = _cho_solve(L, centered)
    # Degenerate-append fallback: even with the PSD rescale above, a long
    # run of clustered appends can drive cond(L) past what f32 solves
    # tolerate (alpha overflows to inf).  When that happens, rebuild the
    # factorization from the stored data — recompute has its own
    # jitter-escalation guard, and batch Cholesky accumulates error
    # additively where the incremental solve amplifies it multiplicatively.
    # lax.cond pays the O(N^3) rebuild only when the append went bad.
    ok = jnp.logical_and(jnp.all(jnp.isfinite(alpha)),
                         jnp.all(jnp.isfinite(new_row)))
    return jax.lax.cond(
        ok,
        lambda: gp2.replace(mean=mean, alpha=alpha),
        lambda: recompute(gp2))


def grow(gp: GP, new_capacity: int) -> GP:
    """Enlarge the padded buffers (host-level; triggers one recompile).

    The padded-identity invariant means L/alpha just extend with an identity /
    zero block — no refactorization.
    """
    N0, N1 = gp.capacity, new_capacity
    assert N1 >= N0
    d, p = gp.dim_in, gp.dim_out
    dtype = gp.x.dtype
    x = jnp.zeros((N1, d), dtype=dtype).at[:N0].set(gp.x)
    y = jnp.zeros((N1, p), dtype=dtype).at[:N0].set(gp.y)
    L = jnp.eye(N1, dtype=dtype).at[:N0, :N0].set(gp.L)
    alpha = jnp.zeros((N1, p), dtype=dtype).at[:N0].set(gp.alpha)
    return gp.replace(x=x, y=y, L=L, alpha=alpha)


# ---------------------------------------------------------------------------
# posterior query
# ---------------------------------------------------------------------------

def query(gp, Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched posterior moments (limbo GP::query/mu/sigma, gp.hpp:159-196).

    Xq: (q, d) -> (mu (q, p), sigma_sq (q,)).  sigma_sq is the latent
    (noise-free) predictive variance, clamped at 0 (gp.hpp:618-624).

    Accepts a CachedGPView to route through the matmul-only fast path.
    """
    if isinstance(gp, CachedGPView):
        return query_cached(gp.gp, gp.cache, Xq)
    Xq = jnp.atleast_2d(Xq).astype(gp.x.dtype)
    mask = gp.mask
    ks = gp.kernel.gram(Xq, gp.x) * mask[None, :]                    # (q, N)
    mu = jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype) + gp.mean(Xq)
    z = solve_triangular(gp.L, ks.T, lower=True)                     # (N, q)
    var = gp.kernel.k_diag(Xq) - jnp.sum(z * z, axis=0)
    var = jnp.maximum(var, 0.0)
    return mu, var


def _panel_width(N: int, cap: int = 1024) -> int:
    """Largest divisor of N not exceeding cap.  Panel widths must DIVIDE N:
    dynamic_slice clamps out-of-range starts, so a ragged last panel would
    silently duplicate earlier rows/columns into the tail (garbage
    results)."""
    return next(d for d in range(min(cap, N), 0, -1) if N % d == 0)


def _mirror_from_linv(Linv: jax.Array, qdtype) -> jax.Array:
    """(Linv^T Linv) cast to qdtype, emitted column-panel by column-panel
    so no f32 (N, N) intermediate ever materializes (each panel is one
    (N,N)@(N,w) GEMM; K^{-1} is symmetric, so panels are emitted TRANSPOSED
    and the stacked scan output reshapes straight to (N, N) with no
    full-size transpose temp).  This is what keeps the lite cache's peak
    N x N residency at L + Linv + mirror on a 16 GB chip at n=32k — both
    at build time and at low-precision flushes."""
    N = Linv.shape[0]
    w = _panel_width(N)
    f32 = Linv.dtype

    def body(_, i):
        cols = jax.lax.dynamic_slice(Linv, (0, i * w), (N, w))
        panel = jnp.dot(Linv.T, cols, preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)
        return None, panel.T.astype(qdtype)

    _, panels = jax.lax.scan(body, None, jnp.arange(N // w))
    return jnp.reshape(panels, (N, N))


@struct.dataclass
class QueryCache:
    """Precomputed K^{-1} for matmul-only queries (TPU fast path).

    Triangular solves serialize poorly on the MXU's systolic array; for
    query-heavy workloads (acquisition sweeps, dense posterior dumps) it pays
    to invert once per fit — O(N^3), same as the factorization — after which
    every query is two matmuls at full MXU throughput:
        var = k_diag - rowsum((ks @ Kinv) * ks).
    Mathematically identical to the solve path (gp.hpp:618 computes the same
    quadratic form); numerically within O(cond * eps) of it.
    """

    # The f32 master inverse.  None in the "lite" deferred cache, which
    # carries only the low-precision query mirror (Kinv_q): flushes then
    # update the mirror in place with the f32-computed rank-m correction
    # (one N x N pass instead of read+write f32 Kinv + mirror cast — and a
    # third of the memory at a given capacity, which is what pushes the
    # single-chip frontier past n=24k on a 16 GB part).  Each lite flush
    # adds one rounding of the mirror dtype (a random walk of ~2^-9
    # relative steps for bf16, sqrt(F) growth over F flushes); the periodic
    # exact rebuild (cache_refresh_period) bounds it.
    Kinv: Optional[jax.Array] = None
    # Optionally the (masked, noise+jitter) training covariance itself —
    # enables the "refined" cached update: one iterative-refinement step
    # u <- u + Kinv (k - K u) replaces two serialized triangular solves
    # (matvec-only, MXU/bandwidth-bound) while matching their accuracy.
    K: Optional[jax.Array] = None
    # Optionally the inverse Cholesky factor L^{-1} (lower triangular,
    # padded-identity) — enables the "linv" cached update: the pivot
    # u = K^{-1}k = Linv^T (Linv k) comes from two matvec passes at
    # solve-grade accuracy, and the bordered Linv row is -(u/d)^T — free
    # given u.  Cheapest update mode: no K mirror to maintain, no
    # iterative-refinement pass (see add_sample_cached).
    Linv: Optional[jax.Array] = None
    # Optional low-precision (bf16) mirror of Kinv used ONLY for the
    # variance quadratic form in query_cached. At large n the per-step
    # acquisition queries are HBM-bandwidth-bound on the n x n Kinv read
    # (e.g. 400 MB f32 at n=10k per ascent step); a bf16 mirror halves
    # that traffic and runs the (q,N)@(N,N) matmul at native MXU bf16
    # rate with f32 accumulation. The f32 Kinv stays the master copy:
    # updates and the posterior-mean path never touch the mirror, so
    # there is no compounding low-precision drift — only a bounded
    # per-query rounding of the variance (see query_cached).
    Kinv_q: Optional[jax.Array] = None
    # --- deferred-update fields (fast_update="deferred") ------------------
    # The bordered-inverse append is a rank-1 correction Kinv' = Kinv
    # + vv^T/s - e_i e_i^T whose pivot comes from the maintained Linv, never
    # from Kinv itself — so materializing it into the N x N buffer (and
    # re-casting the bf16 mirror) every append is pure HBM traffic with no
    # numerical role.  Deferred mode accumulates the scaled pivot columns
    # p_j = v_j/sqrt(s_j) in P and applies them as a rank-m correction at
    # query time, flushing into Kinv/Kinv_q with ONE (N,m)@(m,N) GEMM every
    # m appends.  Exactly the same math as "linv", amortized.
    P: Optional[jax.Array] = None          # (N, m) pending scaled pivots
    base_n: Optional[jax.Array] = None     # n at the last flush (int32)
    # alpha support: with Kinv stale we can no longer form
    # alpha = Kinv @ centered by one matvec; instead maintain
    #   ay     = Kinv_true @ (y * mask)        (N, p)
    #   u_ones = Kinv_true @ mask              (N,)
    # by the O(N) bordered recurrences (a' = a + v (v.c')/s) and recover
    # alpha = ay - u_ones mu_bar^T for constant-type means (Null/Constant/
    # Data — limbo's defaults; FunctionARD needs the dense path).
    ay: Optional[jax.Array] = None
    u_ones: Optional[jax.Array] = None

    @classmethod
    def build(cls, gp: GP, block: int = 1024,
              with_K: bool = False, with_Linv: bool = False,
              qdtype=None, defer_m: int = 0,
              lite: bool = False) -> "QueryCache":
        """Blocked inversion: Linv column-panels via scanned triangular
        solves, then Kinv = Linv^T Linv (one matmul).

        XLA's one-shot triangular solve with N right-hand sides materializes
        O(N) incremental panels (~16 GB of HLO temps at N=10240 — observed
        OOM on v5e); scanning fixed-width panels bounds the workspace while
        keeping all O(N^3) flops in MXU matmuls.

        At blocked-Cholesky sizes the triangular inverse goes through the
        GEMM-dominant `ops.chol.tri_inv_blocked` instead of XLA's
        triangular_solve panels (same workspace bound, much faster).
        """
        N = gp.capacity
        K = gp.kernel.gram_train_masked(gp.x, gp.n) if with_K else None
        if lite and not (defer_m > 0 and with_Linv):
            raise ValueError("lite caches need with_Linv=True and "
                             "defer_m > 0 (the mirror is updated via the "
                             "maintained Linv's deferred pivots)")

        def _finish(Kinv, Linv):
            defer = {}
            if defer_m > 0:
                mask = gp.mask
                rhs = jnp.concatenate([gp.y * mask[:, None],
                                       mask[:, None]], axis=1)
                a = jnp.dot(Kinv, rhs, preferred_element_type=gp.x.dtype)
                defer = dict(P=jnp.zeros((N, defer_m), dtype=gp.x.dtype),
                             base_n=gp.n.astype(jnp.int32),
                             ay=a[:, :-1], u_ones=a[:, -1])
            if lite:
                # no f32 master: the (possibly low-precision) mirror is the
                # only N x N query matrix; flushes update it in place
                return cls(Kinv=None, K=None, Linv=Linv,
                           Kinv_q=Kinv.astype(qdtype) if qdtype else Kinv,
                           **defer)
            return cls(Kinv=Kinv, K=K, Linv=Linv if with_Linv else None,
                       Kinv_q=Kinv.astype(qdtype) if qdtype else None,
                       **defer)

        if use_blocked_tri(N):
            Linv = tri_inv_dispatch(gp.L)
            if lite and qdtype is not None and qdtype != gp.x.dtype:
                # low-precision lite at large N: never materialize the f32
                # K^{-1} — see _mirror_from_linv; ay/u_ones derive from
                # Linv directly.
                mirror = _mirror_from_linv(Linv, qdtype)
                mask = gp.mask
                rhs = jnp.concatenate([gp.y * mask[:, None],
                                       mask[:, None]], axis=1)
                z = jnp.dot(Linv, rhs, preferred_element_type=gp.x.dtype)
                a = jnp.dot(Linv.T, z, preferred_element_type=gp.x.dtype)
                return cls(Kinv=None, K=None, Linv=Linv, Kinv_q=mirror,
                           P=jnp.zeros((N, defer_m), dtype=gp.x.dtype),
                           base_n=gp.n.astype(jnp.int32),
                           ay=a[:, :-1], u_ones=a[:, -1])
            Kinv = jnp.dot(Linv.T, Linv, preferred_element_type=gp.x.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            return _finish(Kinv, Linv)
        block = _panel_width(N, block)
        nb = N // block
        eye = jnp.eye(N, dtype=gp.x.dtype)

        def body(_, i):
            cols = jax.lax.dynamic_slice(eye, (0, i * block), (N, block))
            panel = solve_triangular(gp.L, cols, lower=True)     # (N, block)
            return None, panel.T                                  # (block, N)

        _, panels = jax.lax.scan(body, None, jnp.arange(nb))
        Linv = jnp.reshape(panels, (N, N))                       # rows = Linv^T? no:
        # panels[i] = (Linv @ cols_i)^T = rows i*block..(i+1)*block of Linv^T
        # so stacked panels give Linv^T with shape (N, N); Kinv = Linv^T @ Linv
        LinvT = Linv                                             # (N, N) = Linv^T
        Kinv = jnp.dot(LinvT, LinvT.T, preferred_element_type=gp.x.dtype)
        return _finish(Kinv, LinvT.T)


@jax.custom_vjp
def _sym_quad_diag(ks: jax.Array, Kinv: jax.Array) -> jax.Array:
    """diag(ks @ Kinv @ ks^T) for a SYMMETRIC Kinv.

    The custom VJP exploits symmetry: d/dks [ks Kinv ks^T]_ii = 2 (ks Kinv)_i
    = 2 t — reusing the forward matmul's result instead of autodiff's second
    (q,N)@(N,N) contraction.  On the acquisition-ascent hot path that removes
    an entire N x N HBM read (and its MXU pass) per gradient step.  Kinv is
    exactly symmetric here by construction: QueryCache.build forms it as
    Linv^T @ Linv (A @ A^T is bitwise symmetric — C[i,j] and C[j,i] sum the
    identical products in the identical k-order) and add_sample_cached's
    block updates add symmetric rank-1 terms.
    """
    t = jnp.dot(ks.astype(Kinv.dtype), Kinv,
                preferred_element_type=ks.dtype)                     # (q, N)
    return jnp.sum(t * ks, axis=1)


def _sym_quad_diag_fwd(ks, Kinv):
    t = jnp.dot(ks.astype(Kinv.dtype), Kinv,
                preferred_element_type=ks.dtype)
    return jnp.sum(t * ks, axis=1), (t, Kinv)


def _sym_quad_diag_bwd(res, g):
    t, Kinv = res
    # cotangent for Kinv is never consumed (the cache is a constant of the
    # ascent); the zeros are dead code XLA eliminates
    return (2.0 * g)[:, None] * t, jnp.zeros_like(Kinv)


_sym_quad_diag.defvjp(_sym_quad_diag_fwd, _sym_quad_diag_bwd)


@jax.custom_vjp
def _sym_quad_diag_corr(ks: jax.Array, Kinv: jax.Array, P: jax.Array,
                        pend: jax.Array) -> jax.Array:
    """diag(ks M ks^T) for M = Kinv + P P^T - diag(pend), all symmetric.

    The deferred-update query: Kinv is the stale (last-flush) inverse, P the
    (N, m) pending scaled pivots, pend the 0/1 vector marking pending
    columns (their stale identity diagonal must be cancelled).  Same
    symmetric-VJP trick as _sym_quad_diag: the gradient reuses the forward
    product t = ks M, so the ascent still reads the N x N buffer once per
    step; the correction adds only (q,N)@(N,m) work (m ~ 32, negligible).
    """
    t = _corr_t(ks, Kinv, P, pend)
    return jnp.sum(t * ks, axis=1)


def _corr_t(ks, Kinv, P, pend):
    t = jnp.dot(ks.astype(Kinv.dtype), Kinv,
                preferred_element_type=ks.dtype)                  # (q, N)
    t = t + jnp.dot(jnp.dot(ks, P, preferred_element_type=ks.dtype), P.T,
                    preferred_element_type=ks.dtype)
    return t - ks * pend[None, :].astype(ks.dtype)


def _sym_quad_diag_corr_fwd(ks, Kinv, P, pend):
    t = _corr_t(ks, Kinv, P, pend)
    return jnp.sum(t * ks, axis=1), (t, Kinv, P, pend)


def _sym_quad_diag_corr_bwd(res, g):
    t, Kinv, P, pend = res
    return ((2.0 * g)[:, None] * t, jnp.zeros_like(Kinv),
            jnp.zeros_like(P), jnp.zeros_like(pend))


_sym_quad_diag_corr.defvjp(_sym_quad_diag_corr_fwd, _sym_quad_diag_corr_bwd)


def query_cached(gp: GP, cache: QueryCache,
                 Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Matmul-only posterior query using a precomputed K^{-1}.

    When the cache carries a low-precision mirror (Kinv_q, see
    QueryCache.build(qdtype=...)), the variance quadratic form reads the
    mirror with f32 accumulation: absolute variance error is bounded by
    one bf16 rounding of Kinv (~2^-9 relative per element) through the
    form — measured ~1e-3 * prior_variance at n=10k (tests/test_gp.py::
    test_query_cache_bf16_mirror). The mean path always uses f32 alpha.
    The quadratic form carries a symmetry-aware custom VJP
    (_sym_quad_diag): gradient ascent through this query does one N x N
    contraction per step, not two.
    """
    Xq = jnp.atleast_2d(Xq).astype(gp.x.dtype)
    mask = gp.mask
    ks = gp.kernel.gram(Xq, gp.x) * mask[None, :]                    # (q, N)
    mu = jnp.dot(ks, gp.alpha, preferred_element_type=ks.dtype) + gp.mean(Xq)
    Kq = cache.Kinv_q if cache.Kinv_q is not None else cache.Kinv
    if cache.P is not None:
        idx = jnp.arange(gp.capacity)
        pend = ((idx >= cache.base_n) & (idx < gp.n)).astype(ks.dtype)
        quad = _sym_quad_diag_corr(ks, Kq, cache.P, pend)
    else:
        quad = _sym_quad_diag(ks, Kq)
    var = gp.kernel.k_diag(Xq) - quad
    return mu, jnp.maximum(var, 0.0)


@struct.dataclass
class CachedGPView:
    """Duck-typed GP whose queries go through the K^{-1} cache.

    Acquisition functions take this transparently (gp_mod.query dispatches),
    so the large-n matmul-only path plugs into the whole BO stack.
    """

    gp: GP
    cache: QueryCache

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


def add_sample_cached(gp: GP, cache: QueryCache, x_new: jax.Array,
                      y_new: jax.Array,
                      fast_update=False) -> Tuple[GP, QueryCache]:
    """add_sample + O(N^2) block-inverse update of the K^{-1} cache.

    Block inversion of the bordered matrix [[K, k], [k^T, kappa]]:
      s = kappa - k^T K^{-1} k,
      Kinv' = [[Kinv + (Kinv k)(Kinv k)^T / s, -(Kinv k)/s],
               [-(Kinv k)^T / s, 1/s]].
    With the padded-identity convention (Kinv has an identity block beyond
    n), installing the border at row/col i = n keeps the invariant exact;
    the install is scatter-free (one fused outer-product pass, see below).

    The pivot vector u = K^{-1}k is computed, by default, from the
    *maintained Cholesky factor* via two triangular solves — the drifted
    Kinv never feeds its own update, which measured ~100x lower posterior
    drift over 100-append f32 horizons (2e-4 vs 2e-2 max |d mu|, flat vs
    compounding; tests/test_gp.py::test_cached_kinv_drift_bounded).

    Four update modes (measured at n=10240 f32, docs/BENCHMARKS.md):
      * ``fast_update=False``  — u by two triangular solves on L: most
        accurate (~2e-4 drift over 100 appends), ~54 ms/iter (solves
        serialize).
      * ``fast_update="refined"`` — u = Kinv k polished by one iterative-
        refinement step against the cached K (requires
        QueryCache.build(with_K=True)): matvec-only, near-solve accuracy.
      * ``fast_update="linv"`` — u = Linv^T (Linv k) from a maintained
        inverse Cholesky factor (requires QueryCache.build(with_Linv=True)):
        solve-grade pivot from two matvec passes, and the Cholesky row
        l = Linv k and the bordered Linv row -(u/d)^T fall out for free —
        the lowest-HBM-traffic mode (no K mirror to maintain, no
        refinement pass).
      * ``fast_update=True``   — raw u = Kinv k: fastest per-pass,
        compounding drift — pair with a small cache_refresh_period.
    """
    i = gp.n
    mask = gp.mask
    dtype = gp.x.dtype
    x_new = jnp.asarray(x_new, dtype=dtype)
    y_new = jnp.asarray(y_new, dtype=dtype)

    k_vec = gp.kernel.gram(x_new[None, :], gp.x)[0] * mask           # (N,)
    diag_add = gp.kernel.train_diag_add(x_new[None, :])[0]
    kappa = gp.kernel.k_diag(x_new[None, :])[0] + diag_add
    # noise-aware Schur-complement floor: mathematically s >= the diagonal
    # noise+jitter of the NOISY kernel, and the cached pivot's computed s
    # carries the inverse-factor's forward error (~eps * cond(K)) — at
    # n >= 16k that error exceeds a tiny eps-scale floor, s goes negative,
    # and the 1/d border row then blows the maintained factor up
    # geometrically (observed: overflow within 5 appends at n=16384).
    # Clipping to [diag_add, kappa] keeps every bordered update PD with a
    # bounded growth factor 1/sqrt(diag_add).
    s_floor = jnp.maximum(diag_add, effective_jitter(dtype) * kappa)
    N = gp.capacity
    e_i = (jnp.arange(N) == i).astype(dtype)
    if fast_update == "deferred":
        return _add_sample_deferred(gp, cache, x_new, y_new, k_vec, kappa,
                                    e_i, s_floor)
    if cache.P is not None:
        raise ValueError(
            "this cache was built with defer_m > 0; immediate-update modes "
            "would leave its pending-pivot state inconsistent — use "
            "fast_update='deferred' or rebuild the cache without defer_m")
    Linv_new = cache.Linv
    if fast_update == "linv":
        if cache.Linv is None:
            raise ValueError("linv updates need QueryCache.build(with_Linv=True)")
        # l = L^{-1}k exactly (k is masked; Linv's padded rows are e_j, so l
        # is masked automatically); u = K^{-1}k = Linv^T l — solve-grade
        # accuracy from two matvec passes, no refinement needed.  The
        # triangular-aware Pallas matvec reads only the lower-triangle
        # blocks (ops/trimv.py; dense-dot fallback off-TPU / small N).
        from limbo_tpu.ops.trimv import trimv
        l = trimv(cache.Linv, k_vec) * mask
        u = trimv(cache.Linv, l, transpose=True) * mask
        s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
    elif fast_update == "refined":
        if cache.K is None:
            raise ValueError("refined updates need QueryCache.build(with_K=True)")
        u = jnp.dot(cache.Kinv, k_vec, preferred_element_type=dtype) * mask
        r = k_vec - jnp.dot(cache.K, u, preferred_element_type=dtype)
        u = (u + jnp.dot(cache.Kinv, r, preferred_element_type=dtype)) * mask
        s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
        l = jnp.dot(gp.L.T, u, preferred_element_type=dtype)
    elif fast_update:
        if cache.Linv is not None:
            # the raw-matmul pivot u = Kinv k carries compounding drift;
            # installing -(u/d) rows into a maintained inverse Cholesky
            # factor would silently corrupt the solve-grade invariant the
            # "linv" mode depends on.
            raise ValueError(
                "fast_update=True would write drift-prone pivots into the "
                "maintained Linv; use fast_update='linv' with this cache, "
                "or build it without with_Linv")
        u = jnp.dot(cache.Kinv, k_vec, preferred_element_type=dtype) * mask
        s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
        # rank-1 Cholesky append without a solve: u = K^{-1}k = L^{-T}L^{-1}k
        # implies l = L^{-1}k = L^T u (matvec), and l.l = k.u so d = sqrt(s).
        l = jnp.dot(gp.L.T, u, preferred_element_type=dtype)
    else:
        l = solve_triangular(gp.L, k_vec, lower=True)
        u = solve_triangular(gp.L.T, l, lower=False) * mask
        s = jnp.clip(kappa - jnp.dot(k_vec, u), s_floor, kappa)
    # Kinv' core block += u u^T / s ; border row/col = -u/s ; corner = 1/s.
    # Scatter-free: with u masked (u[i] = 0) and Kinv's padded-identity
    # row/col i, the bordered inverse is exactly
    #   Kinv' = Kinv + (u - e_i)(u - e_i)^T / s - e_i e_i^T
    # (expand: core block gets +uu^T/s, row/col i get -u/s, corner gets
    # 1 - 1 + 1/s).  One fused elementwise pass over the N x N buffer
    # instead of an add followed by three dynamic-update-slices — XLA can
    # fuse the outer-product sum with its consumers (the alpha matvec and
    # the bf16 mirror cast below) but cannot fuse through scatters.
    v = u - e_i
    Kinv = cache.Kinv + jnp.outer(v, v) / s - jnp.outer(e_i, e_i)

    d = jnp.sqrt(s)
    L = gp.L.at[i].set(l * mask + d * e_i)
    if Linv_new is not None:
        # bordered triangular inverse: L' = [[L, 0], [l^T, d]] gives
        # L'^{-1} = [[Linv, 0], [-(1/d) l^T Linv, 1/d]], and
        # l^T Linv = (Linv^T l)^T = u^T — the border row is free given the
        # pivot.  One in-place row write (u is masked, u[i] = 0).
        Linv_new = cache.Linv.at[i].set(-(u / d) * mask + (1.0 / d) * e_i)

    K_new = cache.K
    if K_new is not None:
        # same trick: K's row/col i is e_i (masked identity); border it with
        # k_row = k_vec + kappa e_i in one fused pass
        K_new = (cache.K + jnp.outer(e_i, k_vec) + jnp.outer(k_vec, e_i)
                 + (kappa - 1.0) * jnp.outer(e_i, e_i))

    x = gp.x.at[i].set(x_new)
    y = gp.y.at[i].set(y_new)
    gp2 = gp.replace(x=x, y=y, n=i + 1, L=L)
    mean = prepare_mean(gp2.mean, y, gp2.mask)
    centered = (y - mean(x)) * gp2.mask[:, None]
    # alpha via the cached inverse (O(N^2 p) matmul, no solves)
    alpha = jnp.dot(Kinv, centered, preferred_element_type=dtype)
    # refresh the low-precision query mirror from the f32 master (one
    # O(N^2) cast write; the mirror never feeds updates, so no compounding)
    Kinv_q = (Kinv.astype(cache.Kinv_q.dtype)
              if cache.Kinv_q is not None else None)
    return (gp2.replace(mean=mean, alpha=alpha),
            QueryCache(Kinv=Kinv, K=K_new, Linv=Linv_new, Kinv_q=Kinv_q))


def _add_sample_deferred(gp: GP, cache: QueryCache, x_new, y_new,
                         k_vec, kappa, e_i, s_floor) -> Tuple[GP, QueryCache]:
    """The "deferred" cached append: O(N) per step beyond the two pivot
    matvecs; the N x N Kinv/mirror rewrite amortizes to one GEMM per m
    appends.

    Identical math to fast_update="linv" (the pivot u = Linv^T (Linv k)
    comes from the maintained inverse Cholesky factor either way); the
    bordered-inverse correction vv^T/s - e_i e_i^T is just not materialized
    into the N x N buffers each step.  alpha = Kinv (y - mu_bar) is carried
    by the exact bordered recurrence a' = a + v (v . c')/s applied to
    ay = Kinv (y masked) and u_ones = Kinv mask — valid because Kinv's
    padded rows are identity and the appended entry contributes
    y_c e_i - e_i c'_i = 0 (see QueryCache field docs).  Constant-type
    means only (Null/Constant/Data): mu_bar is a per-output scalar there;
    FunctionARD's x-dependent mean needs the dense alpha matvec.
    """
    if cache.Linv is None or cache.P is None:
        raise ValueError(
            "deferred updates need QueryCache.build(with_Linv=True, "
            "defer_m > 0)")
    from limbo_tpu.means.means import ConstantMean, DataMean, NullMean
    if not isinstance(gp.mean, (NullMean, ConstantMean, DataMean)):
        raise ValueError(
            "fast_update='deferred' supports constant-type means only "
            "(NullMean/ConstantMean/DataMean); FunctionARD needs the dense "
            "alpha path — use fast_update='linv'")
    from limbo_tpu.ops.trimv import trimv

    i = gp.n
    mask = gp.mask
    dtype = gp.x.dtype
    N = gp.capacity
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
    # exact bordered recurrences (O(N p)); v is masked so padded rows stay 0
    ay = cache.ay + v[:, None] * (jnp.dot(v, ym) / s)[None, :]
    u_ones = cache.u_ones + v * (jnp.dot(v, mask2) / s)
    m = cache.P.shape[1]
    count = i - cache.base_n              # pivots pending BEFORE this append
    P = jax.lax.dynamic_update_slice(cache.P, (v / d)[:, None],
                                     (jnp.asarray(0, count.dtype), count))
    idx = jnp.arange(N)

    def flush(_):
        # one (N,m)@(m,N) GEMM + fused diagonal cancel of the m pending
        # identity slots; refresh the bf16 mirror and re-derive ay/u_ones
        # from the fresh buffer (two matvecs fused over one Kinv read) so
        # recurrence rounding never outlives a flush window.
        pend = ((idx >= cache.base_n) & (idx <= i)).astype(dtype)
        corr = (jnp.dot(P, P.T, preferred_element_type=dtype)
                - jnp.where(idx[:, None] == idx[None, :],
                            pend[None, :], 0.0))
        rhs = jnp.concatenate([ym, mask2[:, None]], axis=1)
        if cache.Kinv is None:
            if cache.Kinv_q.dtype == dtype:
                # lite, full-precision mirror: in-place rank-m add (one
                # fused read-add-write pass)
                mirror = cache.Kinv_q + corr
            else:
                # lite, low-precision mirror: an in-place add is INVALID —
                # the correction's entries are far below the mirror's
                # quantization step and get absorbed (measured: a bf16
                # in-place flush leaves the mirror stale and posterior
                # variance off by O(prior)).  Rebuild exactly from the
                # maintained Linv instead, panel by panel (no f32 N x N
                # temp — the flush can fire inside the jitted bo_iter at
                # the memory frontier); size defer_m large (the pending-P
                # query correction costs N x m bytes per step, so m of
                # 128-512 is nearly free) to amortize the O(N^3) GEMMs.
                mirror = _mirror_from_linv(Linv, cache.Kinv_q.dtype)
            # ay/u_ones re-derive from the maintained Linv (exact, two
            # (N,N)@(N,k) passes)
            z = jnp.dot(Linv, rhs, preferred_element_type=dtype)
            a = jnp.dot(Linv.T, z, preferred_element_type=dtype)
            Kinv = None
        else:
            Kinv = cache.Kinv + corr
            a = jnp.dot(Kinv, rhs, preferred_element_type=dtype)
            mirror = (Kinv.astype(cache.Kinv_q.dtype)
                      if cache.Kinv_q is not None else None)
        return (Kinv, mirror, jnp.zeros_like(P),
                (i + 1).astype(cache.base_n.dtype), a[:, :-1], a[:, -1])

    def keep(_):
        return (cache.Kinv, cache.Kinv_q, P, cache.base_n, ay, u_ones)

    Kinv, Kinv_q, P, base_n, ay, u_ones = jax.lax.cond(
        count + 1 >= m, flush, keep, None)

    mean = prepare_mean(gp2.mean, y, mask2)
    mu_bar = mean(x_new[None, :])[0]      # constant-type means: (p,)
    alpha = ay - u_ones[:, None] * mu_bar[None, :].astype(dtype)
    return (gp2.replace(mean=mean, alpha=alpha),
            QueryCache(Kinv=Kinv, K=None, Linv=Linv, Kinv_q=Kinv_q,
                       P=P, base_n=base_n, ay=ay, u_ones=u_ones))


# ---------------------------------------------------------------------------
# objectives (differentiable scalars)
# ---------------------------------------------------------------------------

def log_lik(gp: GP) -> jax.Array:
    """Log marginal likelihood of the current factorization.

    limbo GP::compute_log_lik (gp.hpp:267-281):
      -0.5 tr(C^T alpha) - 0.5 logdet(K) - 0.5 n log(2 pi)
    where C = y - m(x).  Note logdet/2pi counted once regardless of dim_out
    (limbo's multi-output generalization).
    """
    mask = gp.mask
    centered = (gp.y - gp.mean(gp.x)) * mask[:, None]
    a = jnp.sum(centered * gp.alpha)
    # padded diag of L is 1 -> log 0 contributions vanish automatically
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(gp.L)))
    n = gp.n.astype(gp.x.dtype)
    return -0.5 * a - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)


def log_marginal_likelihood(kernel, mean, x: jax.Array, y: jax.Array,
                            n: jax.Array,
                            extra_jitter=None) -> jax.Array:
    """LML as a pure differentiable function of (kernel, mean) params.

    This is the hyperparameter-learning objective; `jax.grad` of this replaces
    limbo's hand-derived compute_kernel_grad_log_lik / compute_mean_grad_log_lik
    (gp.hpp:285-337).

    extra_jitter adds a parameter-independent diagonal ridge to the objective's
    kernel matrix only (the fitted GP is untouched).  Used by the hp-opt
    strategies as an f32 conditioning floor: candidate hyperparameters (long
    length scales over clustered BO data) drive K's spectrum below the f32
    Cholesky stability limit eps*lambda_max ~ eps*n, where the reference's
    f64 Eigen pipeline (gp.hpp:285) still has ~9 digits of headroom.
    """
    N = x.shape[0]
    mask = (jnp.arange(N) < n).astype(x.dtype)
    mean = prepare_mean(mean, y, mask)
    K = kernel.gram_train_masked(x, n, extra_jitter=extra_jitter)
    L = chol_dispatch(K)       # differentiable (custom VJP, ops/chol.py)
    centered = (y - mean(x)) * mask[:, None]
    alpha = _cho_solve(L, centered)
    a = jnp.sum(centered * alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    nf = n.astype(x.dtype) if hasattr(n, "astype") else jnp.asarray(n, x.dtype)
    return -0.5 * a - 0.5 * logdet - 0.5 * nf * jnp.log(2.0 * jnp.pi)


def inv_kernel(gp: GP) -> jax.Array:
    """K^{-1} via two triangular solves (limbo compute_inv_kernel, gp.hpp:254)."""
    eye = jnp.eye(gp.capacity, dtype=gp.x.dtype)
    return _cho_solve(gp.L, eye)


def log_loo_cv(gp: GP) -> jax.Array:
    """Leave-one-out predictive log probability.

    limbo GP::compute_log_loo_cv (gp.hpp:339-351), Rasmussen & Williams 5.4.2:
      sum_i sum_out [ -0.5 alpha_i^2 / Kinv_ii - 0.5 log(1/Kinv_ii)
                      - 0.5 log 2 pi ]   (masked over valid i)
    """
    Kinv = inv_kernel(gp)
    inv_diag = 1.0 / jnp.diagonal(Kinv)                              # (N,)
    mask = gp.mask
    per = (-0.5 * (gp.alpha ** 2) * inv_diag[:, None]
           - 0.5 * jnp.log(inv_diag)[:, None]
           - 0.5 * jnp.log(2.0 * jnp.pi))
    return jnp.sum(per * mask[:, None])


def log_loo_cv_fn(kernel, mean, x: jax.Array, y: jax.Array,
                  n: jax.Array, extra_jitter=None) -> jax.Array:
    """LOO-CV as a pure differentiable function of hyperparameters
    (objective for KernelLooOpt; grads replace gp.hpp:354-402).
    extra_jitter: see log_marginal_likelihood."""
    N = x.shape[0]
    mask = (jnp.arange(N) < n).astype(x.dtype)
    mean = prepare_mean(mean, y, mask)
    K = kernel.gram_train_masked(x, n, extra_jitter=extra_jitter)
    L = chol_dispatch(K)
    centered = (y - mean(x)) * mask[:, None]
    alpha = _cho_solve(L, centered)
    Kinv = _cho_solve(L, jnp.eye(N, dtype=x.dtype))
    inv_diag = 1.0 / jnp.diagonal(Kinv)
    per = (-0.5 * (alpha ** 2) * inv_diag[:, None]
           - 0.5 * jnp.log(inv_diag)[:, None]
           - 0.5 * jnp.log(2.0 * jnp.pi))
    return jnp.sum(per * mask[:, None])


# ---------------------------------------------------------------------------
# data access helpers (limbo samples()/observations()/mean_observation())
# ---------------------------------------------------------------------------

def samples(gp: GP) -> jax.Array:
    """Valid samples (host-side convenience; returns a (n, d) numpy view)."""
    return gp.x[: int(gp.n)]


def observations(gp: GP) -> jax.Array:
    return gp.y[: int(gp.n)]


def mean_observation(gp: GP) -> jax.Array:
    """Column means of valid observations (limbo gp.mean_observation())."""
    m = gp.mask
    return jnp.sum(gp.y * m[:, None], axis=0) / jnp.maximum(jnp.sum(m), 1.0)
