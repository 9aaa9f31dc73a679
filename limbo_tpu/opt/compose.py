"""Optimizer combinators: batched restarts and sequential chaining.

* ParallelRepeater (src/limbo/opt/parallel_repeater.hpp:77): limbo runs N
  perturbed restarts of a sub-optimizer on TBB threads and keeps the best.
  Here the restarts are a vmapped batch axis — one compiled program evaluates
  all restarts at once on the MXU/VPU; across chips the same axis shards with
  shard_map + a pmax/argmax collective (see limbo_tpu.parallel).

* Chained (src/limbo/opt/chained.hpp:60): run optimizers in sequence, each
  starting from the previous result.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult


@struct.dataclass
class ParallelRepeater:
    sub: object                 # sub-optimizer (pytree)
    repeats: int = struct.field(pytree_node=False, default=10)
    epsilon: float = struct.field(pytree_node=False, default=1e-2)

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = False) -> OptResult:
        keys = jax.random.split(key, self.repeats + 1)
        pert = jax.random.uniform(
            keys[0], (self.repeats, init.shape[0]), dtype=init.dtype,
            minval=-self.epsilon, maxval=self.epsilon)
        inits = init[None, :] + pert

        def one(x0, k):
            return self.sub(fun, x0, k, bounded)

        res = jax.vmap(one)(inits, keys[1:])
        i = jnp.argmax(res.value)
        return OptResult(x=res.x[i], value=res.value[i])


@struct.dataclass
class RandomRestarts:
    """Global sweep + multi-start ascent — the acquisition-optimizer default,
    replacing NLOpt DIRECT's global coverage.

    With ``seed_from_sweep`` (default), a dense random sweep runs FIRST and
    the ``repeats`` best candidates seed the gradient ascents — DIRECT-style
    explore-then-polish, fully batched.  Otherwise starts are uniform random
    and the sweep only competes at the end.
    """

    sub: object
    repeats: int = struct.field(pytree_node=False, default=16)
    sweep_samples: int = struct.field(pytree_node=False, default=0)
    seed_from_sweep: bool = struct.field(pytree_node=False, default=True)
    # wide-then-deep: after the batched ascent, continue the ``polish_k``
    # best carries for ``polish_steps`` more steps (requires a resumable
    # sub-optimizer exposing ``run(..., state=, iterations=)``, e.g. Rprop).
    # On the large-n hot loop restarts batch nearly free (one K^{-1} read
    # per step regardless of width) while steps serialize, so a
    # 64x12 + top8x8 schedule does 22 sequential reads (each run() phase
    # adds one final-candidate eval) where 32x30 does 31.  Since width is
    # free per read, polishing only the top k is dominated by running every
    # restart deeper — the knobs exist for sub-optimizers that cannot batch
    # wide; the measured schedule study is in docs/BENCHMARKS.md.
    polish_k: int = struct.field(pytree_node=False, default=0)
    polish_steps: int = struct.field(pytree_node=False, default=0)
    # "uniform" | "halton": the sweep's point set.  A randomized-Halton
    # sweep has O(log n / n) star discrepancy vs O(n^{-1/2}) for iid
    # uniform — closer to DIRECT's systematic space coverage at identical
    # evaluation cost (the A/B behind the default is in
    # benchmark_results/acqopt_ab.json).
    sweep_kind: str = struct.field(pytree_node=False, default="uniform")

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = True) -> OptResult:
        d = init.shape[0]
        k_init, k_sub, k_sweep = jax.random.split(key, 3)
        keys = jax.random.split(k_sub, self.repeats)

        sweep_x = None
        if self.sweep_samples > 0:
            if self.sweep_kind == "halton":
                from limbo_tpu.utils.random import halton

                sweep_x = halton(k_sweep, self.sweep_samples, d,
                                 dtype=init.dtype)
            else:
                sweep_x = jax.random.uniform(k_sweep, (self.sweep_samples, d),
                                             dtype=init.dtype)
            sweep_v = jax.vmap(fun)(sweep_x)

        if self.seed_from_sweep and self.sweep_samples >= self.repeats:
            _, top = jax.lax.top_k(sweep_v, self.repeats)
            inits = sweep_x[top].at[0].set(init)
        else:
            inits = jax.random.uniform(k_init, (self.repeats, d),
                                       dtype=init.dtype)
            inits = inits.at[0].set(init)

        do_polish = self.polish_k > 0 and self.polish_steps > 0
        if do_polish and not hasattr(self.sub, "run"):
            raise ValueError(
                "polish_k/polish_steps require a resumable sub-optimizer "
                f"exposing run(..., state=, iterations=); "
                f"{type(self.sub).__name__} has no run()")
        if do_polish:
            res, states = jax.vmap(
                lambda x0, k: self.sub.run(fun, x0, k, bounded))(inits, keys)
            _, top = jax.lax.top_k(res.value, min(self.polish_k, self.repeats))
            st_top = jax.tree_util.tree_map(lambda a: a[top], states)
            res, _ = jax.vmap(
                lambda st: self.sub.run(fun, None, None, bounded, state=st,
                                        iterations=self.polish_steps))(st_top)
        else:
            res = jax.vmap(
                lambda x0, k: self.sub(fun, x0, k, bounded))(inits, keys)
        i = jnp.argmax(res.value)
        best_x, best_v = res.x[i], res.value[i]

        if sweep_x is not None:
            j = jnp.argmax(sweep_v)
            better = sweep_v[j] > best_v
            best_x = jnp.where(better, sweep_x[j], best_x)
            best_v = jnp.where(better, sweep_v[j], best_v)
        return OptResult(x=best_x, value=best_v)


@struct.dataclass
class Chained:
    subs: Tuple = struct.field(default=())

    def __call__(self, fun: Callable, init: jax.Array, key,
                 bounded: bool = False) -> OptResult:
        x = init
        best = OptResult(x=init, value=jnp.asarray(-jnp.inf, dtype=init.dtype))
        keys = jax.random.split(key, max(len(self.subs), 1))
        for sub, k in zip(self.subs, keys):
            res = sub(fun, x, k, bounded)
            x = res.x
            better = res.value > best.value
            best = OptResult(x=jnp.where(better, res.x, best.x),
                             value=jnp.where(better, res.value, best.value))
        return best
