"""Triangular matvec: y = L v / y = L^T v reading ONLY the lower triangle.

The "linv" cached update's pivot (models/gp.add_sample_cached) is two
dependent N x N matvecs against the maintained inverse Cholesky factor.
Dense `jnp.dot` matvecs read the full (N, N) buffer — half of which is the
triangle's structural zeros — and measure ~200 GB/s effective on v5e
(scripts/update_ablation_bench.py: 4.23 ms of the 5.93 ms update at
n=10k).  This kernel enumerates only the nb(nb+1)/2 lower-triangle blocks
with a linearized 1-D grid (block coordinates come in as scalar-prefetch
arrays, the Pallas analogue of a packed-triangular walk), halving the HBM
bytes and streaming them through the Mosaic pipeline.

Grid order and accumulation:
  * y = L v     : row-major over (I, J<=I) — the output block y[I] is
                  revisited on consecutive steps (J ascending), so the
                  first-visit predicate is J == 0.
  * y = L^T v   : column-major over (J, I>=J) — output block y[J] is
                  revisited consecutively (I ascending), first visit I == J.

Diagonal blocks are read as stored (their upper half is structural zeros
in the dense buffer), so no masking is needed; callers must pass a square
buffer whose size is divisible by the block (GP capacities are 256-aligned
by convention — see models/gp.fit).

Reference hot path being accelerated: the incremental update feeding
limbo's BOptimizer loop (src/limbo/model/gp.hpp:573-603 — Eigen
rank-1 Cholesky append + O(n^2) solves).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Below this size the dense matvec's full read is cheap and kernel launch
# overhead dominates; the dispatch falls back to jnp.dot.
TRIMV_MIN_N = 4096


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(N: int) -> int:
    # 512 measured fastest at n~10k (238 GB/s effective vs 176-222 for 256;
    # 1024 within noise; 2048 exceeds VMEM) — docs/BENCHMARKS.md
    for b in (512, 256):
        if N % b == 0:
            return b
    return 0


def _mv_kernel(transpose: bool, i_ref, j_ref, l_ref, v_ref, o_ref):
    # v and o live whole in VMEM (nb x block ~ tens of KB); only the L
    # blocks stream.  o accumulates in VMEM across the grid (its index_map
    # is constant) and is written back to HBM once, at the last step.
    t = pl.program_id(0)
    I = i_ref[t]
    J = j_ref[t]

    @pl.when(t == 0)
    def _zero():
        o_ref[...] = jnp.zeros_like(o_ref)

    if transpose:
        # o[J] += L[I, J]^T v[I]  (2-D row form: Mosaic's dot lowering
        # rejects 1-D vec @ mat)
        part = jnp.dot(v_ref[I, :][None, :], l_ref[...],
                       preferred_element_type=o_ref.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        o_ref[J, :] += part[0]
    else:
        # o[I] += L[I, J] v[J]
        part = jnp.dot(l_ref[...], v_ref[J, :],
                       preferred_element_type=o_ref.dtype,
                       precision=jax.lax.Precision.HIGHEST)
        o_ref[I, :] += part


@functools.partial(jax.jit, static_argnames=("transpose", "block"))
def _trimv_pallas(L: jax.Array, v: jax.Array, transpose: bool,
                  block: int) -> jax.Array:
    N = L.shape[0]
    nb = N // block
    # linearized lower-triangle walk (trace-time constants)
    if transpose:
        # column-major: for J in 0..nb-1, for I in J..nb-1
        Js = np.concatenate([np.full(nb - j, j) for j in range(nb)])
        Is = np.concatenate([np.arange(j, nb) for j in range(nb)])
    else:
        # row-major: for I in 0..nb-1, for J in 0..I
        Is = np.concatenate([np.full(i + 1, i) for i in range(nb)])
        Js = np.concatenate([np.arange(i + 1) for i in range(nb)])
    T = Is.shape[0]
    i_idx = jnp.asarray(Is, dtype=jnp.int32)
    j_idx = jnp.asarray(Js, dtype=jnp.int32)
    v2 = v.reshape(nb, block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((block, block),
                         lambda t, ir, jr: (ir[t], jr[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),        # whole v
        ],
        out_specs=pl.BlockSpec((nb, block), lambda t, ir, jr: (0, 0),
                               memory_space=pltpu.VMEM),  # whole o, resident
    )
    out = pl.pallas_call(
        functools.partial(_mv_kernel, transpose),
        out_shape=jax.ShapeDtypeStruct((nb, block), L.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=N * (N + block),
            bytes_accessed=(T * block * block + 2 * N) * L.dtype.itemsize,
            transcendentals=0,
        ),
    )(i_idx, j_idx, L, v2)
    return out.reshape(N)


def trimv(L: jax.Array, v: jax.Array, transpose: bool = False,
          min_n: int | None = None) -> jax.Array:
    """y = L @ v (or L^T @ v) for lower-triangular L, size-dispatched.

    Reads only the lower-triangle blocks on TPU for N >= TRIMV_MIN_N with
    a 256-aligned square buffer; falls back to a dense `jnp.dot` matvec
    elsewhere (CPU/GPU, small N, odd sizes, or LIMBO_TPU_NO_TRIMV=1).
    """
    import os
    N = L.shape[0]
    floor = TRIMV_MIN_N if min_n is None else min_n
    block = _pick_block(N)
    use_kernel = (N >= floor and block > 0 and L.ndim == 2
                  and L.shape[1] == N and v.shape == (N,)
                  and L.dtype == jnp.float32          # Mosaic has no f64 dot
                  and not os.environ.get("LIMBO_TPU_NO_TRIMV"))
    if use_kernel and jax.default_backend() == "tpu":
        return _trimv_pallas(L, v, transpose, block)
    A = L.T if transpose else L
    return jnp.dot(A, v, preferred_element_type=L.dtype)
