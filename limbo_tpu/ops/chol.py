"""Blocked Cholesky factorization + triangular inverse, TPU-first.

This is the performance kernel behind every large-n GP fit / hp-opt step /
K^{-1} cache rebuild (the O(n^3) hot path of the reference:
src/limbo/model/gp.hpp:550-605, `_compute_full_kernel` -> Eigen LLT and
`_compute_alpha`'s triangular solves).

Why not stock `jnp.linalg.cholesky`?  XLA's TPU Cholesky advances one column
per sequential step — n dependent steps of vector-unit work, far below
matmul speed at n >= 8k.  The factorization here is restructured so that
asymptotically *all* flops are MXU GEMMs and the sequential dependency chain
is n / PIVOT_W steps instead of n:

* **Left-looking block factorization.**  For block column k (width B):
      panel  = A[kB:, kB:kB+B] - L[kB:, :kB] @ L[kB:kB+B, :kB]^T   (one GEMM)
      L11, L11^{-T} = panel_factor(panel[:B])                      (Pallas)
      L21    = panel[B:] @ L11^{-T}                                (one GEMM)
  The deferred (left-looking) update does exactly n^3/3 multiply-adds — no
  wasted upper-triangle work — and each step is one large matmul.  The outer
  loop is unrolled in Python: every slice has a static shape; XLA sees a
  straight-line program of ~4 ops per block column.

* **Pallas panel kernel with w-wide micro-pivots.**  The B x B diagonal
  block is factorized *and* inverted in VMEM by one Mosaic kernel
  (`_panel_kernel`), processing PIVOT_W columns per loop iteration: the
  w x w pivot is factorized by a fully *unrolled* register-level loop (no
  loop-carried VMEM round trips), the w-column block solve and the rank-w
  trailing update are MXU ops.  This cuts the panel's sequential loop count
  from B to B/w — the latency floor of any Cholesky — and producing
  (L^T)^{-1} directly turns the driver's TRSM into a GEMM.

* **Blocked triangular inverse** (`tri_inv_blocked`) with the same
  structure gives L^{-1} in block-row GEMMs; `Kinv = Linv^T @ Linv` then
  makes the whole K^{-1} cache build matmul-only (see models/gp.QueryCache).

Numerics: all GEMMs run at `Precision.HIGHEST` (true f32 on the MXU;
measured bf16_3x "HIGH" loses ~50x accuracy for a 1.4x speedup — not worth
it for a factorization).  `cholesky_blocked` agrees with
`jnp.linalg.cholesky` to f32 roundoff (tests/test_chol.py checks f32 and
f64).

On non-TPU backends the Pallas kernels run in interpreter mode (tests) and
`cholesky()` dispatches to stock XLA below `BLOCKED_MIN_N`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Measured on v5e (docs/BENCHMARKS.md): TPU Cholesky of ANY formulation is
# bound by its length-n sequential dependency chain, and stock XLA already
# sits near that latency floor (n=10240: 26.7 ms steady-state; round 1's
# 105-165 ms included ~30 ms/dispatch tunnel RPC).  The blocked path reaches
# parity at 8-10k and wins modestly from ~12k up (1.07x at 16k, B=256) —
# so the dispatch only switches over where it actually helps.  The decisive
# win of this module is the GEMM-only triangular inverse (K^{-1} cache
# builds, Cholesky VJP) — see tri_inv_blocked.
BLOCKED_MIN_N = 12288
# the GEMM-only triangular inverse wins much earlier than the factorization:
# measured 1.53x over the scan-of-triangular-solves K^{-1} build at n=8192,
# 1.75x at 10240, 1.63x at 16384 (docs/BENCHMARKS.md)
TRI_INV_MIN_N = 4096
DEFAULT_BLOCK = 256
PIVOT_W = 16          # micro-pivot width inside the panel kernel

HIGHEST = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Pallas panel kernels (factor/invert one B x B diagonal block in VMEM)
# ---------------------------------------------------------------------------

def _unrolled_pivot_chol(P, w, dtype):
    """Cholesky of a w x w pivot block, fully unrolled (register-level).

    Returns (Lw, Lwinv) — both lower triangular.  Static python loop: no
    loop-carried memory traffic, just straight-line vector code.

    Indefinite pivots are NOT clamped: a negative pivot yields sqrt(<0) =
    NaN exactly like stock XLA cholesky, so the non-finite result reaches
    gp.recompute's jitter-escalation retry / add_sample's degenerate-append
    fallback instead of silently producing huge finite columns.
    """
    aw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)    # (w, 1) row ids
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)    # (1, w) col ids
    Lw = jnp.zeros((w, w), dtype)
    for a in range(w):
        # Mosaic has no scatter: column/row writes are where-selects
        lrow = Lw[a:a + 1, :]                                 # (1, w)
        s = jnp.dot(Lw, lrow.reshape(w, 1),
                    preferred_element_type=dtype, precision=HIGHEST)  # (w,1)
        d = jnp.sqrt(P[a:a + 1, a:a + 1] - s[a:a + 1, :])
        col = (P[:, a:a + 1] - s) / d                         # (w, 1)
        col = jnp.where(aw > a, col,
                        jnp.where(aw == a, jnp.broadcast_to(d, (w, 1)),
                                  jnp.zeros((w, 1), dtype)))
        Lw = jnp.where(ar == a, jnp.broadcast_to(col, (w, w)), Lw)
    return Lw, _unrolled_lower_inv(Lw, w, dtype)


def _unrolled_pivot_upper_inv(Uw, w, dtype):
    """Inverse of a w x w upper-triangular block, unrolled back substitution."""
    aw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    Uwi = jnp.zeros((w, w), dtype)
    for a in reversed(range(w)):
        urow = Uw[a:a + 1, :]                                 # (1, w)
        r = jnp.dot(urow, Uwi, preferred_element_type=dtype,
                    precision=HIGHEST)                        # rows > a set
        e_row = jnp.where(ar == a, jnp.ones((1, w), dtype),
                          jnp.zeros((1, w), dtype))
        new_row = (e_row - r) / Uw[a:a + 1, a:a + 1]
        Uwi = jnp.where(aw == a, jnp.broadcast_to(new_row, (w, w)), Uwi)
    return Uwi


def _panel_kernel(a_ref, lt_ref, v_ref):
    """Factor a symmetric PD block: lt = L^T and v = (L^T)^{-1} = Linv^T.

    Pass 1 — right-looking, PIVOT_W columns per step: pivot factorized by
    the unrolled register loop, block column solved with one (w,w)x(w,B)
    MXU op, trailing matrix updated by one rank-w GEMM.  The trailing S
    stays symmetric, so rows (dynamic-sublane reads) double as columns —
    no dynamic lane access anywhere.

    Pass 2 — w-wide back substitution for V = U^{-1} (U = L^T), bottom-up.
    v_ref doubles as the S scratch in pass 1 (saves a VMEM buffer).
    """
    B = a_ref.shape[0]
    w = PIVOT_W
    nbw = B // w
    dtype = a_ref.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)   # (B, 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)   # (1, B)
    wr_c = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)     # (w, 1)

    def dot00(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=dtype,
                                   precision=HIGHEST)

    # ---- pass 1: w-wide right-looking factorization ----
    v_ref[:] = a_ref[:]                    # S scratch
    lt_ref[:] = jnp.zeros((B, B), dtype)

    def factor_step(t, _):
        j = t * w
        W = v_ref[pl.ds(j, w), :]                             # (w, B)
        E = jnp.where(iota_c == (j + wr_c.reshape(1, w)), one, zero)  # (B, w)
        P = jnp.dot(W, E, preferred_element_type=dtype,
                    precision=HIGHEST)                        # (w, w)
        Lw, Lwi = _unrolled_pivot_chol(P, w, dtype)
        Ct = jnp.dot(Lwi, W, preferred_element_type=dtype,
                     precision=HIGHEST)                       # (w, B)
        rowmask = iota_r >= (j + wr_c)                        # (w, B)
        Ct = jnp.where(rowmask, Ct, zero)
        lt_ref[pl.ds(j, w), :] = Ct
        S = v_ref[:]
        v_ref[:] = S - dot00(Ct, Ct)                          # rank-w update
        return 0

    jax.lax.fori_loop(0, nbw, factor_step, 0)

    # ---- pass 2: V = U^{-1} (upper), w rows at a time, bottom-up ----
    v_ref[:] = jnp.zeros((B, B), dtype)

    def inv_step(tt, _):
        t = nbw - 1 - tt
        j = t * w
        Urows = lt_ref[pl.ds(j, w), :]                        # (w, B)
        E = jnp.where(iota_c == (j + wr_c.reshape(1, w)), one, zero)
        Uw = jnp.dot(Urows, E, preferred_element_type=dtype,
                     precision=HIGHEST)                       # (w, w)
        Uwi = _unrolled_pivot_upper_inv(Uw, w, dtype)
        V = v_ref[:]                                          # rows >= j+w set
        R = jnp.dot(Urows, V, preferred_element_type=dtype,
                    precision=HIGHEST)                        # (w, B)
        E_rows = jnp.where(iota_r == (j + wr_c), one, zero)   # (w, B)
        v_ref[pl.ds(j, w), :] = jnp.dot(Uwi, E_rows - R,
                                        preferred_element_type=dtype,
                                        precision=HIGHEST)
        return 0

    jax.lax.fori_loop(0, nbw, inv_step, 0)


@functools.partial(jax.jit, static_argnums=())
def _panel_factor_pallas(D: jax.Array):
    """(B, B) PD block -> (L11, L11invT): L lower, (L^{-1})^T upper."""
    B = D.shape[0]
    lt, v = pl.pallas_call(
        _panel_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, B), D.dtype),
                   jax.ShapeDtypeStruct((B, B), D.dtype)),
        interpret=_interpret(),
    )(D)
    return lt.T, v


def _tri_inv_kernel(l_ref, v_ref):
    """X = L^{-1} for lower-triangular L, w rows at a time, top-down.

    Row block: X[j:j+w, :] = Lw^{-1} (E_rows - L[j:j+w, :] @ X); the matmul
    only sees already-written rows (X rows >= j are still zero) and L's
    zero upper triangle kills t > j+w terms.
    """
    B = l_ref.shape[0]
    w = PIVOT_W
    nbw = B // w
    dtype = l_ref.dtype
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    wr_c = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    v_ref[:] = jnp.zeros((B, B), dtype)

    def inv_step(t, _):
        j = t * w
        Lrows = l_ref[pl.ds(j, w), :]                         # (w, B)
        E = jnp.where(iota_c == (j + wr_c.reshape(1, w)), one, zero)
        Lw = jnp.dot(Lrows, E, preferred_element_type=dtype,
                     precision=HIGHEST)
        # forward-substitution inverse of the w x w pivot (lower)
        Lwi = _unrolled_lower_inv(Lw, w, dtype)
        X = v_ref[:]
        R = jnp.dot(Lrows, X, preferred_element_type=dtype,
                    precision=HIGHEST)                        # (w, B)
        E_rows = jnp.where(iota_r == (j + wr_c), one, zero)
        v_ref[pl.ds(j, w), :] = jnp.dot(Lwi, E_rows - R,
                                        preferred_element_type=dtype,
                                        precision=HIGHEST)
        return 0

    jax.lax.fori_loop(0, nbw, inv_step, 0)


def _unrolled_lower_inv(Lw, w, dtype):
    """Inverse of a w x w lower-triangular block, unrolled."""
    aw = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    Lwi = jnp.zeros((w, w), dtype)
    for a in range(w):
        lrow = Lw[a:a + 1, :]
        r = jnp.dot(lrow, Lwi, preferred_element_type=dtype,
                    precision=HIGHEST)
        e_row = jnp.where(ar == a, jnp.ones((1, w), dtype),
                          jnp.zeros((1, w), dtype))
        new_row = (e_row - r) / Lw[a:a + 1, a:a + 1]
        Lwi = jnp.where(aw == a, jnp.broadcast_to(new_row, (w, w)), Lwi)
    return Lwi


def _tri_inv_panel(Lii: jax.Array) -> jax.Array:
    B = Lii.shape[0]
    return pl.pallas_call(
        _tri_inv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, B), Lii.dtype),
        interpret=_interpret(),
    )(Lii)


def panel_factor(D: jax.Array, use_pallas: bool = True):
    """Factor + invert a small diagonal block: returns (L11, L11inv)."""
    if use_pallas:
        L11, L11invT = _panel_factor_pallas(D)
        return L11, L11invT.T
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
        if use_pallas:
            L11, L11invT = _panel_factor_pallas(panel[:block])
        else:
            L11, L11inv = panel_factor(panel[:block], use_pallas=False)
            L11invT = L11inv.T
        L = L.at[j0:j1, j0:j1].set(L11)
        if j1 < N:
            L21 = jnp.dot(panel[block:], L11invT,
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


# ---------------------------------------------------------------------------
# size dispatch (the entry the GP model uses) + custom VJP
# ---------------------------------------------------------------------------

def _resolve_min(min_blocked, default=None) -> int:
    """None -> backend default: blocked above the given floor on TPU, never
    on CPU/GPU (stock LAPACK/XLA paths are already good there)."""
    if min_blocked is not None:
        return min_blocked
    floor = BLOCKED_MIN_N if default is None else default
    return floor if jax.default_backend() == "tpu" else 1 << 30


def _use_blocked(n: int, min_blocked) -> bool:
    return n >= _resolve_min(min_blocked)


def use_blocked_tri(n: int, min_blocked=None) -> bool:
    return n >= _resolve_min(min_blocked, default=TRI_INV_MIN_N)


def _cholesky_impl(A: jax.Array, block: int, min_blocked) -> jax.Array:
    if _use_blocked(A.shape[0], min_blocked):
        return cholesky_blocked(A, block=block)
    return jnp.linalg.cholesky(A)


def tri_inv(L: jax.Array, block: int = DEFAULT_BLOCK,
            min_blocked=None) -> jax.Array:
    """L^{-1} for lower-triangular L, size-dispatched (TRI_INV_MIN_N)."""
    if use_blocked_tri(L.shape[0], min_blocked):
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
    P = jnp.dot(L.T, Lbar, preferred_element_type=dtype, precision=HIGHEST)
    phi = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    Linv = tri_inv(L, block=block, min_blocked=min_blocked)
    S = jnp.dot(jnp.dot(Linv.T, phi, preferred_element_type=dtype,
                        precision=HIGHEST),
                Linv, preferred_element_type=dtype, precision=HIGHEST)
    Abar = 0.5 * (S + S.T)
    return (Abar,)


cholesky.defvjp(_cholesky_fwd, _cholesky_bwd)
