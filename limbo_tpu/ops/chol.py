"""Blocked Cholesky factorization + triangular inverse, TPU-first.

This is the performance kernel behind every large-n GP fit / hp-opt step /
K^{-1} cache rebuild (the O(n^3) hot path of the reference:
src/limbo/model/gp.hpp:550-605, `_compute_full_kernel` -> Eigen LLT and
`_compute_alpha`'s triangular solves).

Why not stock `jnp.linalg.cholesky`?  XLA's TPU Cholesky serializes in
128-wide mini-panels with vector-unit updates; at n >= 8k it runs far below
matmul speed (measured ~10x slower than this path at n=16k on v5e — see
docs/BENCHMARKS.md).  The factorization here is restructured so that
asymptotically *all* flops are MXU matmuls:

* **Left-looking block factorization.**  For block column k (width B):
      panel  = A[kB:, kB:kB+B] - L[kB:, :kB] @ L[kB:kB+B, :kB]^T   (one GEMM)
      L11    = chol(panel[:B])                                     (Pallas)
      L21    = panel[B:] @ L11^{-T}                                (one GEMM)
  The deferred (left-looking) update does exactly n^3/3 multiply-adds — no
  wasted upper-triangle work, unlike a right-looking full-GEMM SYRK — and
  each step is one large matmul, so the MXU stays busy.  The outer loop is
  unrolled in Python: every slice has a static shape, XLA sees a straight-
  line program of ~4 ops per block column.

* **Pallas panel kernel.**  The B x B diagonal block is factorized *and*
  inverted in VMEM by a single Mosaic kernel (`_panel_kernel`): a
  Cholesky-Crout column sweep followed by a forward-substitution sweep,
  both expressed as masked matvecs (no dynamic lane indexing, sublane-only
  dynamic writes).  Producing L11^{-1} directly turns the TRSM into a GEMM.

* **Blocked triangular inverse** (`tri_inv_blocked`) with the same
  structure gives L^{-1} in block-row GEMMs; `Kinv = Linv^T @ Linv` then
  makes the whole K^{-1} cache build matmul-only (see models/gp.QueryCache).

Numerics: all GEMMs default to `Precision.HIGHEST` (true f32 on the MXU);
`cholesky_blocked` agrees with `jnp.linalg.cholesky` to f32 roundoff
(tests/test_chol.py checks both f32 and f64-vs-f32 reconstruction error).

On non-TPU backends the Pallas kernel runs in interpreter mode (tests) and
`cholesky()` dispatches to stock XLA below `BLOCKED_MIN_N`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly where libtpu exists; tests run on CPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

# below this size stock XLA Cholesky is already fine (and compile is cheaper)
BLOCKED_MIN_N = 4096
DEFAULT_BLOCK = 512

HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Pallas panel kernel: factor + invert one B x B diagonal block in VMEM
# ---------------------------------------------------------------------------

def _panel_kernel(a_ref, l_ref, linv_ref):
    """chol(A) and chol(A)^{-1} of a symmetric PD block, entirely in VMEM.

    Works in the transposed layout LT[j, :] = column j of L so that the
    per-column sequential writes hit the sublane dimension (dynamic lane
    writes do not vectorize on TPU).  Every gather of a column is a masked
    matvec against a one-hot vector — no dynamic lane reads either.
    """
    B = a_ref.shape[0]
    A = a_ref[:]
    dtype = A.dtype
    # everything stays >= 2-D: Mosaic does not lower 1-D (vector-vector) dots
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)    # (B, 1)
    tiny = jnp.asarray(1e-30, dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def dot00(a, b):
        """Contract dim 0 with dim 0 (a: (B, p), b: (B, q)) -> (p, q)."""
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=dtype,
                                   precision=HIGHEST)

    # ---- pass 1: Cholesky-Crout, LT rows written top to bottom ----
    l_ref[:] = jnp.zeros((B, B), dtype)

    def factor_col(j, _):
        lt = l_ref[:]
        e_j = jnp.where(iota == j, one, zero)                # (B, 1)
        v = jnp.dot(lt, e_j, preferred_element_type=dtype,
                    precision=HIGHEST)                       # LT[:, j] = L[j, :]
        w = v * jnp.where(iota < j, one, zero)               # (B, 1)
        s = dot00(lt, w)                                     # (B, 1): L[r,:j].L[j,:j]
        a_col = jnp.dot(A, e_j, preferred_element_type=dtype,
                        precision=HIGHEST)                   # (B, 1)
        a_jj = dot00(a_col, e_j)                             # (1, 1)
        s_j = dot00(s, e_j)                                  # (1, 1)
        d = jnp.sqrt(jnp.maximum(a_jj - s_j, tiny))          # (1, 1)
        col = jnp.where(iota > j, (a_col - s) / d,
                        jnp.where(iota == j, d * jnp.ones((B, 1), dtype),
                                  jnp.zeros((B, 1), dtype)))
        l_ref[pl.ds(j, 1), :] = col.reshape(1, B)
        return 0

    jax.lax.fori_loop(0, B, factor_col, 0)

    # ---- pass 2: forward substitution, X = L^{-1} row by row ----
    lt = l_ref[:]
    linv_ref[:] = jnp.zeros((B, B), dtype)

    def inv_row(k, _):
        X = linv_ref[:]
        e_k = jnp.where(iota == k, one, zero)                # (B, 1)
        v = jnp.dot(lt, e_k, preferred_element_type=dtype,
                    precision=HIGHEST)                       # (B, 1): L[k, :]
        lkk = dot00(v, e_k)                                  # (1, 1)
        w = v * jnp.where(iota < k, one, zero)               # (B, 1)
        r = dot00(w, X)                                      # (1, B)
        linv_ref[pl.ds(k, 1), :] = (e_k.reshape(1, B) - r) / lkk
        return 0

    jax.lax.fori_loop(0, B, inv_row, 0)


@functools.partial(jax.jit, static_argnums=())
def _panel_factor_pallas(D: jax.Array):
    """(B, B) PD block -> (LT, Linv) where LT = L^T row-major trick layout.

    Returns L (lower) and L^{-1} (lower)."""
    B = D.shape[0]
    lt, linv = pl.pallas_call(
        _panel_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, B), D.dtype),
                   jax.ShapeDtypeStruct((B, B), D.dtype)),
        interpret=_interpret(),
    )(D)
    return lt.T, linv


def panel_factor(D: jax.Array, use_pallas: bool = True):
    """Factor + invert a small diagonal block: returns (L11, L11inv)."""
    if use_pallas:
        return _panel_factor_pallas(D)
    L11 = jnp.linalg.cholesky(D)
    eye = jnp.eye(D.shape[0], dtype=D.dtype)
    L11inv = jax.scipy.linalg.solve_triangular(L11, eye, lower=True)
    return L11, L11inv


# ---------------------------------------------------------------------------
# blocked drivers (Python-unrolled; static shapes per step)
# ---------------------------------------------------------------------------

def _pad_identity(A: jax.Array, block: int):
    """Extend A to a multiple of `block` with an identity diagonal block
    (same convention as utils.maths.masked_identity_gram padding)."""
    n = A.shape[0]
    npad = -(-n // block) * block
    if npad == n:
        return A, n
    P = jnp.eye(npad, dtype=A.dtype)
    P = P.at[:n, :n].set(A)
    return P, n


def cholesky_blocked(A: jax.Array, block: int = DEFAULT_BLOCK,
                     precision=HIGHEST, use_pallas: bool = True) -> jax.Array:
    """Lower Cholesky factor by left-looking blocked elimination.

    All O(n^3) work is GEMMs at the given precision; the per-block-column
    B x B factorization runs in the Pallas panel kernel.  A is assumed
    symmetric positive definite (padded-identity blocks are fine).
    """
    A, n = _pad_identity(A, block)
    N = A.shape[0]
    nb = N // block
    dtype = A.dtype
    L = jnp.zeros((N, N), dtype=dtype)
    for k in range(nb):
        j0, j1 = k * block, (k + 1) * block
        Apanel = A[j0:, j0:j1]                                # (N-j0, B)
        if k > 0:
            Lbelow = L[j0:, :j0]                              # (N-j0, j0)
            Lrow = L[j0:j1, :j0]                              # (B, j0)
            panel = Apanel - jnp.dot(Lbelow, Lrow.T,
                                     preferred_element_type=dtype,
                                     precision=precision)
        else:
            panel = Apanel
        L11, L11inv = panel_factor(panel[:block], use_pallas=use_pallas)
        L = L.at[j0:j1, j0:j1].set(L11)
        if j1 < N:
            L21 = jnp.dot(panel[block:], L11inv.T,
                          preferred_element_type=dtype, precision=precision)
            L = L.at[j1:, j0:j1].set(L21)
    return L[:n, :n]


def tri_inv_blocked(L: jax.Array, block: int = DEFAULT_BLOCK,
                    precision=HIGHEST, use_pallas: bool = True) -> jax.Array:
    """Inverse of a lower-triangular matrix by block forward substitution.

    Block row i of X = L^{-1}:
        X[i, :iB] = -Lii^{-1} @ L[i-row, :iB] @ X[:iB, :iB]
        X[i, iB:(i+1)B] = Lii^{-1}
    Each step is one (B, iB) x (iB, iB) GEMM — MXU-dominant, like the
    factorization.  (Replaces XLA triangular_solve with N right-hand sides,
    which materializes O(N) incremental panels and OOMs at n=10k+.)
    """
    L, n = _pad_identity(L, block)
    N = L.shape[0]
    nb = N // block
    dtype = L.dtype
    X = jnp.zeros((N, N), dtype=dtype)
    for i in range(nb):
        j0, j1 = i * block, (i + 1) * block
        Lii = L[j0:j1, j0:j1]
        if use_pallas:
            Linv_ii = _tri_inv_panel(Lii)
        else:
            Linv_ii = jax.scipy.linalg.solve_triangular(
                Lii, jnp.eye(block, dtype=dtype), lower=True)
        if i > 0:
            S = jnp.dot(L[j0:j1, :j0], X[:j0, :j0],
                        preferred_element_type=dtype, precision=precision)
            Xrow = -jnp.dot(Linv_ii, S, preferred_element_type=dtype,
                            precision=precision)
            X = X.at[j0:j1, :j0].set(Xrow)
        X = X.at[j0:j1, j0:j1].set(Linv_ii)
    return X[:n, :n]


def _tri_inv_kernel(l_ref, linv_ref):
    """Forward-substitution inverse of a lower-triangular VMEM block."""
    B = l_ref.shape[0]
    Lm = l_ref[:]
    dtype = Lm.dtype
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)  # (B, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)  # (1, B)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    linv_ref[:] = jnp.zeros((B, B), dtype)

    def inv_row(k, _):
        X = linv_ref[:]
        e_k = jnp.where(iota_c == k, one, zero)              # (B, 1)
        v = jax.lax.dot_general(e_k, Lm, (((0,), (0,)), ((), ())),
                                preferred_element_type=dtype,
                                precision=HIGHEST)           # (1, B): L[k, :]
        lkk = jnp.dot(v, e_k, preferred_element_type=dtype,
                      precision=HIGHEST)                     # (1, 1)
        w = v * jnp.where(iota_r < k, one, zero)             # (1, B)
        r = jnp.dot(w, X, preferred_element_type=dtype,
                    precision=HIGHEST)                       # (1, B)
        linv_ref[pl.ds(k, 1), :] = (jnp.where(iota_r == k, one, zero) - r) / lkk
        return 0

    jax.lax.fori_loop(0, B, inv_row, 0)


def _tri_inv_panel(Lii: jax.Array) -> jax.Array:
    B = Lii.shape[0]
    return pl.pallas_call(
        _tri_inv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, B), Lii.dtype),
        interpret=_interpret(),
    )(Lii)


# ---------------------------------------------------------------------------
# size dispatch (the entry the GP model uses) + custom VJP
# ---------------------------------------------------------------------------

def _resolve_min(min_blocked) -> int:
    """None -> backend default: blocked above BLOCKED_MIN_N on TPU, never on
    CPU/GPU (stock LAPACK/XLA paths are already good there)."""
    if min_blocked is not None:
        return min_blocked
    return BLOCKED_MIN_N if jax.default_backend() == "tpu" else 1 << 30


def _use_blocked(n: int, min_blocked) -> bool:
    return n >= _resolve_min(min_blocked)


def _cholesky_impl(A: jax.Array, block: int, min_blocked) -> jax.Array:
    if _use_blocked(A.shape[0], min_blocked):
        return cholesky_blocked(A, block=block)
    return jnp.linalg.cholesky(A)


def tri_inv(L: jax.Array, block: int = DEFAULT_BLOCK,
            min_blocked=None) -> jax.Array:
    """L^{-1} for lower-triangular L, size-dispatched like `cholesky`."""
    if _use_blocked(L.shape[0], min_blocked):
        return tri_inv_blocked(L, block=block)
    return jax.scipy.linalg.solve_triangular(
        L, jnp.eye(L.shape[0], dtype=L.dtype), lower=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def cholesky(A: jax.Array, block: int = DEFAULT_BLOCK,
             min_blocked=None) -> jax.Array:
    """Cholesky with a static size dispatch: stock XLA for small matrices,
    blocked-GEMM + Pallas panels above `min_blocked` on TPU.

    Differentiable: the custom VJP is the standard Cholesky pullback
        Abar = sym(L^{-T} phi(L^T Lbar) L^{-1}),  phi = tril, diag halved,
    computed with the blocked triangular inverse — so hyperparameter
    optimization (grad of the log-marginal-likelihood, models/hp_opt.py)
    stays matmul-dominant at large n instead of falling back to XLA's
    serialized triangular solves.
    """
    return _cholesky_impl(A, block, min_blocked)


def _cholesky_fwd(A, block, min_blocked):
    L = _cholesky_impl(A, block, min_blocked)
    return L, L


def _cholesky_bwd(block, min_blocked, L, Lbar):
    dtype = L.dtype
    n = L.shape[0]
    P = jnp.dot(L.T, Lbar, preferred_element_type=dtype, precision=HIGHEST)
    phi = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    Linv = tri_inv(L, block=block, min_blocked=min_blocked)
    S = jnp.dot(jnp.dot(Linv.T, phi, preferred_element_type=dtype,
                        precision=HIGHEST),
                Linv, preferred_element_type=dtype, precision=HIGHEST)
    Abar = 0.5 * (S + S.T)
    return (Abar,)


cholesky.defvjp(_cholesky_fwd, _cholesky_bwd)
