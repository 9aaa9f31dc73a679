"""Batched CMA-ES in pure JAX — the libcmaes replacement.

Reference capability: src/limbo/opt/cmaes.hpp:168 wraps libcmaes (aIPOP
variant, multithreaded population evaluation via set_mt_feval, pwq bound
transform for [0,1] searches).  This implementation is a from-scratch
(mu/mu_w, lambda)-CMA-ES (Hansen's standard update equations: CSA step-size,
rank-one + rank-mu covariance adaptation) expressed as one `lax.scan`:

* the population is a batch axis — candidate evaluation is one vmapped call
  per generation (the whole generation's objective evaluations fuse into a
  single XLA program; across chips the population shards over the mesh);
* bounds are handled by a smooth-free *reflection* genotype->phenotype map
  (triangle wave into [0,1]^d), the same geno/pheno idea as libcmaes's
  pwqBoundStrategy (cmaes.hpp:231) without data-dependent branching;
* restarts (limbo's aIPOP restarts, cmaes.hpp:105) are an outer vmap with
  fresh keys; the best result across restarts is returned.

Everything is static-shape and jit/vmap-safe.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult


def reflect01(x: jax.Array) -> jax.Array:
    """Reflect R^d onto [0,1]^d (triangle wave): preserves CMA dynamics while
    keeping evaluated phenotypes feasible."""
    return 1.0 - jnp.abs(jnp.mod(x, 2.0) - 1.0)


@struct.dataclass
class Cmaes:
    iterations: int = struct.field(pytree_node=False, default=120)
    pop_size: int = struct.field(pytree_node=False, default=0)   # 0 -> auto
    sigma0: float = struct.field(pytree_node=False, default=0.3)
    restarts: int = struct.field(pytree_node=False, default=1)
    # optional device mesh: population evaluation shards over `mesh_axis`
    # (the multi-chip set_mt_feval; lambda is rounded up to the axis size).
    mesh: object = struct.field(pytree_node=False, default=None)
    mesh_axis: str = struct.field(pytree_node=False, default=None)

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = True) -> OptResult:
        d = init.shape[0]
        dtype = init.dtype
        # Hansen's default: lambda = 4 + floor(3 ln d)  (= 4 at d=1)
        lam = (self.pop_size if self.pop_size > 0
               else 4 + int(3 * math.log(d)) if d > 1 else 4)
        lam = max(lam, 4)
        if self.mesh is not None:
            ax = (self.mesh_axis if self.mesh_axis is not None
                  else self.mesh.axis_names[0])
            n_dev = self.mesh.shape[ax]
            lam = -(-lam // n_dev) * n_dev
        mu = lam // 2
        # recombination weights (static -> host numpy, jit-safe)
        import numpy as _np

        w_np = math.log(mu + 0.5) - _np.log(_np.arange(1, mu + 1))
        w_np = w_np / w_np.sum()
        mueff = float(1.0 / _np.sum(w_np ** 2))
        w = jnp.asarray(w_np, dtype=dtype)
        # adaptation constants (Hansen 2016 tutorial defaults)
        cs = (mueff + 2.0) / (d + mueff + 5.0)
        ds = 1.0 + 2.0 * max(0.0, math.sqrt((mueff - 1.0) / (d + 1.0)) - 1.0) + cs
        cc = (4.0 + mueff / d) / (d + 4.0 + 2.0 * mueff / d)
        c1 = 2.0 / ((d + 1.3) ** 2 + mueff)
        cmu = min(1.0 - c1, 2.0 * (mueff - 2.0 + 1.0 / mueff) / ((d + 2.0) ** 2 + mueff))
        chiN = math.sqrt(d) * (1.0 - 1.0 / (4.0 * d) + 1.0 / (21.0 * d * d))

        pheno = (lambda x: reflect01(x)) if bounded else (lambda x: x)

        if self.mesh is not None:
            from limbo_tpu.parallel.sharded import make_sharded_pop_eval

            pop_eval = make_sharded_pop_eval(
                self.mesh, lambda x: fun(pheno(x)), axis=self.mesh_axis)
        else:
            pop_eval = jax.vmap(lambda x: fun(pheno(x)))

        def run_one(key):
            def gen(carry, k):
                m, sigma, C, ps, pc, best_x, best_v, t = carry
                # sample population: z ~ N(0, I), y = B D z, x = m + sigma y
                evals, B = jnp.linalg.eigh(C)
                D = jnp.sqrt(jnp.maximum(evals, 1e-20))
                z = jax.random.normal(k, (lam, d), dtype=dtype)
                y = (z * D[None, :]) @ B.T                       # (lam, d)
                xs = m[None, :] + sigma * y
                fs = pop_eval(xs)                                # maximize
                order = jnp.argsort(-fs)
                xs_sorted = xs[order[:mu]]
                y_sorted = y[order[:mu]]
                # track best (phenotype)
                gbest = order[0]
                better = fs[gbest] > best_v
                best_x = jnp.where(better, pheno(xs[gbest]), best_x)
                best_v = jnp.where(better, fs[gbest], best_v)
                # recombination
                y_w = jnp.sum(w[:, None] * y_sorted, axis=0)
                m_new = m + sigma * y_w
                # step-size control (CSA)
                Cinvsqrt_yw = (B * (1.0 / D)[None, :]) @ (B.T @ y_w)
                ps = (1 - cs) * ps + math.sqrt(cs * (2 - cs) * mueff) * Cinvsqrt_yw
                ps_norm = jnp.linalg.norm(ps)
                sigma_new = sigma * jnp.exp((cs / ds) * (ps_norm / chiN - 1.0))
                # covariance adaptation
                hsig = (ps_norm / jnp.sqrt(1 - (1 - cs) ** (2 * (t + 1)))
                        < (1.4 + 2.0 / (d + 1)) * chiN).astype(dtype)
                pc = (1 - cc) * pc + hsig * math.sqrt(cc * (2 - cc) * mueff) * y_w
                rank1 = jnp.outer(pc, pc)
                rankmu = jnp.einsum("i,ij,ik->jk", w, y_sorted, y_sorted)
                delta_hsig = (1 - hsig) * cc * (2 - cc)
                C_new = ((1 - c1 - cmu) * C
                         + c1 * (rank1 + delta_hsig * C)
                         + cmu * rankmu)
                C_new = 0.5 * (C_new + C_new.T)
                sigma_new = jnp.clip(sigma_new, 1e-12, 1e6)
                return (m_new, sigma_new, C_new, ps, pc, best_x, best_v,
                        t + 1), None

            m0 = init if not bounded else jnp.clip(init, 0.0, 1.0)
            carry0 = (m0, jnp.asarray(self.sigma0, dtype),
                      jnp.eye(d, dtype=dtype), jnp.zeros(d, dtype=dtype),
                      jnp.zeros(d, dtype=dtype), m0,
                      jnp.asarray(-jnp.inf, dtype=dtype),
                      jnp.asarray(0, dtype=jnp.int32))
            keys = jax.random.split(key, self.iterations)
            carry, _ = jax.lax.scan(gen, carry0, keys)
            _, _, _, _, _, best_x, best_v, _ = carry
            return OptResult(x=best_x, value=best_v)

        if self.restarts <= 1:
            return run_one(key)
        keys = jax.random.split(key, self.restarts)
        if self.mesh is not None:
            # restarts run sequentially (vmap over a shard_mapped feval is
            # not composable); each restart's population still fans out
            def body(best, k):
                r = run_one(k)
                better = r.value > best.value
                return OptResult(x=jnp.where(better, r.x, best.x),
                                 value=jnp.where(better, r.value,
                                                 best.value)), None

            init_res = OptResult(x=jnp.zeros_like(init),
                                 value=jnp.asarray(-jnp.inf, dtype))
            best, _ = jax.lax.scan(body, init_res, keys)
            return best
        res = jax.vmap(run_one)(keys)
        i = jnp.argmax(res.value)
        return OptResult(x=res.x[i], value=res.value[i])
