"""Native host components: hypervolume + exact/MC EHVI (C++ via ctypes).

TPU-native equivalents of the reference's compiled static library
(src/hv/hypervol.c, src/ehvi/*.cc built in src/wscript:55-67).  The shared
library is built on first import with the bundled Makefile (g++ -O3
-march=native); if the toolchain is unavailable, NumPy fallbacks keep every
feature working (slower, same results — the tests compare all three paths:
C++, NumPy, and the JAX device kernels in limbo_tpu.ops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIBPATH = os.path.join(_HERE, "liblimbo_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native build failed ({e}); using NumPy fallbacks")
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIBPATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIBPATH)
    except OSError:  # pragma: no cover
        return None
    lib.lt_hypervolume.restype = ctypes.c_double
    lib.lt_hypervolume.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.lt_filter_nondominated.restype = ctypes.c_int
    lib.lt_filter_nondominated.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.lt_ehvi2d_batch.restype = None
    lib.lt_ehvi2d_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.lt_ehvi_mc.restype = ctypes.c_double
    lib.lt_ehvi_mc.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_ulonglong]
    lib.lt_ehvi3d_batch.restype = None
    lib.lt_ehvi3d_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def hv_host(Y: np.ndarray, ref: np.ndarray) -> float:
    """Hypervolume (maximization) of Y (n, d) above ref (d,)."""
    Y = np.ascontiguousarray(np.atleast_2d(Y), dtype=np.float64)
    ref = np.ascontiguousarray(ref, dtype=np.float64)
    n, d = Y.shape
    lib = _load()
    if lib is not None:
        return float(lib.lt_hypervolume(_cptr(Y), n, d, _cptr(ref)))
    return _hv_numpy(Y, ref)


def filter_nondominated_host(Y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of non-dominated rows (maximization)."""
    Y = np.ascontiguousarray(np.atleast_2d(Y), dtype=np.float64)
    n, d = Y.shape
    lib = _load()
    if lib is not None:
        keep = np.zeros(n, dtype=np.int32)
        lib.lt_filter_nondominated(
            _cptr(Y), n, d, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep.astype(bool)
    ge = np.all(Y[None, :, :] >= Y[:, None, :], axis=-1)
    gt = np.any(Y[None, :, :] > Y[:, None, :], axis=-1)
    return ~np.any(ge & gt, axis=1)


def ehvi2d_host(mu: np.ndarray, sigma: np.ndarray, front: np.ndarray,
                ref: np.ndarray) -> np.ndarray:
    """Exact 2-D EHVI (maximization) for a batch of candidates.

    mu, sigma: (n, 2); front: (k, 2) non-dominated; ref: (2,).
    """
    mu = np.ascontiguousarray(np.atleast_2d(mu), dtype=np.float64)
    sigma = np.ascontiguousarray(np.atleast_2d(sigma), dtype=np.float64)
    front = np.ascontiguousarray(np.atleast_2d(front), dtype=np.float64)
    ref = np.ascontiguousarray(ref, dtype=np.float64)
    n = mu.shape[0]
    lib = _load()
    if lib is not None:
        out = np.zeros(n, dtype=np.float64)
        lib.lt_ehvi2d_batch(_cptr(mu), _cptr(sigma), n, _cptr(front),
                            front.shape[0], _cptr(ref), _cptr(out))
        return out
    # fallback: the JAX implementation on CPU
    import jax
    import jax.numpy as jnp

    from limbo_tpu.ops.ehvi import ehvi_2d_max

    f = jnp.asarray(front)
    r = jnp.asarray(ref)
    return np.asarray(jax.vmap(
        lambda m, s: ehvi_2d_max(m, s, f, r))(jnp.asarray(mu),
                                              jnp.asarray(sigma)))


def ehvi3d_host(mu: np.ndarray, sigma: np.ndarray, front: np.ndarray,
                ref: np.ndarray) -> np.ndarray:
    """Exact 3-D EHVI (maximization) for a batch of candidates — host
    cross-check of the device box decomposition (ops/ehvi.ehvi_3d_max;
    reference capability: src/ehvi/ehvi_sliceupdate.cc).

    mu, sigma: (n, 3); front: (k, 3) non-dominated; ref: (3,).
    """
    mu = np.ascontiguousarray(np.atleast_2d(mu), dtype=np.float64)
    sigma = np.ascontiguousarray(np.atleast_2d(sigma), dtype=np.float64)
    front = np.ascontiguousarray(np.atleast_2d(front), dtype=np.float64)
    ref = np.ascontiguousarray(ref, dtype=np.float64)
    n = mu.shape[0]
    lib = _load()
    if lib is not None:
        out = np.zeros(n, dtype=np.float64)
        lib.lt_ehvi3d_batch(_cptr(mu), _cptr(sigma), n, _cptr(front),
                            front.shape[0], _cptr(ref), _cptr(out))
        return out
    import jax
    import jax.numpy as jnp

    from limbo_tpu.ops.ehvi import ehvi_3d_max

    f = jnp.asarray(front)
    r = jnp.asarray(ref)
    return np.asarray(jax.vmap(
        lambda m, s: ehvi_3d_max(m, s, f, r))(jnp.asarray(mu),
                                              jnp.asarray(sigma)))


def ehvi_mc_host(mu, sigma, front, ref, n_samples=10000, seed=1234) -> float:
    """MC EHVI for any dimensionality (maximization)."""
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sigma = np.ascontiguousarray(sigma, dtype=np.float64)
    front = np.ascontiguousarray(np.atleast_2d(front), dtype=np.float64)
    ref = np.ascontiguousarray(ref, dtype=np.float64)
    lib = _load()
    if lib is not None:
        return float(lib.lt_ehvi_mc(_cptr(mu), _cptr(sigma), mu.shape[0],
                                    _cptr(front), front.shape[0], _cptr(ref),
                                    int(n_samples), seed))
    rng = np.random.default_rng(seed)
    hv0 = _hv_numpy(front, ref)
    ys = mu[None, :] + sigma[None, :] * rng.normal(
        size=(n_samples, mu.shape[0]))
    acc = 0.0
    for y in ys:
        acc += max(_hv_numpy(np.vstack([front, y[None]]), ref) - hv0, 0.0)
    return acc / n_samples


def _hv_numpy(Y: np.ndarray, ref: np.ndarray) -> float:
    """Recursive dimension-sweep hypervolume in NumPy (fallback)."""
    Y = Y[np.all(Y > ref[None, :], axis=1)]
    if Y.shape[0] == 0:
        return 0.0
    d = Y.shape[1]
    if d == 1:
        return float(Y[:, 0].max() - ref[0])
    if d == 2:
        order = np.argsort(-Y[:, 0])
        vol, h = 0.0, ref[1]
        for p in Y[order]:
            if p[1] > h:
                vol += (p[0] - ref[0]) * (p[1] - h)
                h = p[1]
        return float(vol)
    order = np.argsort(-Y[:, d - 1])
    Ys = Y[order]
    vol = 0.0
    for i in range(Ys.shape[0]):
        hi = Ys[i, d - 1]
        lo = Ys[i + 1, d - 1] if i + 1 < Ys.shape[0] else ref[d - 1]
        if hi > lo:
            vol += _hv_numpy(Ys[: i + 1, : d - 1], ref[: d - 1]) * (hi - lo)
    return float(vol)
