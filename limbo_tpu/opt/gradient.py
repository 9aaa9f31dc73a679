"""Gradient-based inner optimizers: Rprop, Adam, GradientAscent.

Each is a fixed-iteration `lax.scan` (XLA-friendly: static trip count, the
eps_stop early exit becomes a no-op freeze once converged) that tracks the
best-seen point, exactly mirroring the reference update rules:

* Rprop      — src/limbo/opt/rprop.hpp:82   (delta0=0.1, dmin=1e-6, dmax=50,
               eta-=0.5, eta+=1.2, 300 iterations; sign-based, the default
               hyperparameter optimizer)
* Adam       — src/limbo/opt/adam.hpp:94    (alpha=1e-3, b1=.9, b2=.999)
* GradAscent — src/limbo/opt/gradient_ascent.hpp:94 (plain/momentum/nesterov)

All maximize.  `bounded` projects iterates onto [0,1]^d each step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult, clip01


def _sanitize(v, g):
    """NaN/Inf guard: a bad objective evaluation must not poison the run
    (limbo catches NLOpt exceptions and keeps the best-so-far,
    opt/nlopt_base.hpp:95-109; here bad values lose and bad gradients become
    zero steps)."""
    v = jnp.where(jnp.isfinite(v), v, -jnp.inf)
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    return v, g


@struct.dataclass
class Rprop:
    iterations: int = struct.field(pytree_node=False, default=300)
    eps_stop: float = struct.field(pytree_node=False, default=0.0)

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = False) -> OptResult:
        return self.run(fun, init, key, bounded)[0]

    def run(self, fun: Callable, init, key=None, bounded: bool = False,
            state=None, iterations: int | None = None):
        """Like __call__ but resumable: returns ``(OptResult, state)``.

        ``state`` is the full scan carry (iterate, per-dim deltas, previous
        gradient, best-seen); passing a previous run's state continues the
        ascent exactly where it stopped — the per-dimension step sizes keep
        their adapted magnitudes instead of resetting to delta0.  This is
        what makes a wide-then-deep acquisition schedule work: a short wide
        phase over many restarts, then extra steps on the few best carries
        (opt/compose.py: RandomRestarts polish_k/polish_steps).
        """
        delta0, dmin, dmax = 0.1, 1e-6, 50.0
        etaminus, etaplus = 0.5, 1.2
        vg = jax.value_and_grad(fun)

        def step(carry, _):
            x, delta, grad_old, best_x, best_v, frozen = carry
            v, g = vg(x)
            v, g = _sanitize(v, g)
            better = v > best_v
            best_x = jnp.where(better, x, best_x)
            best_v = jnp.where(better, v, best_v)
            # limbo works with grad of -f then flips; net effect: ascent on f
            prod = grad_old * g
            delta = jnp.where(prod > 0, jnp.minimum(delta * etaplus, dmax),
                              jnp.where(prod < 0,
                                        jnp.maximum(delta * etaminus, dmin),
                                        delta))
            g_eff = jnp.where(prod < 0, 0.0, g)
            step_vec = jnp.sign(g_eff) * delta
            x_new = clip01(x + step_vec, bounded)
            grad_old = g_eff
            # eps_stop: freeze once the gradient norm is small
            small = jnp.linalg.norm(g_eff) < self.eps_stop
            frozen = jnp.logical_or(frozen, small) if self.eps_stop > 0 else frozen
            x_new = jnp.where(frozen, x, x_new)
            return (x_new, delta, grad_old, best_x, best_v, frozen), None

        if state is None:
            x0 = clip01(init, bounded)
            state = (x0, jnp.full_like(x0, delta0), jnp.zeros_like(x0),
                     x0, jnp.asarray(-jnp.inf, dtype=x0.dtype),
                     jnp.asarray(False))
        n_steps = self.iterations if iterations is None else iterations
        state, _ = jax.lax.scan(step, state, None, length=n_steps)
        x, _, _, best_x, best_v, _ = state
        # final candidate also competes (limbo returns best_params)
        v_final = fun(x)
        v_final = jnp.where(jnp.isfinite(v_final), v_final, -jnp.inf)
        better = v_final > best_v
        best_x = jnp.where(better, x, best_x)
        best_v = jnp.where(better, v_final, best_v)
        state = (x, state[1], state[2], best_x, best_v, state[5])
        return OptResult(x=best_x, value=best_v), state


@struct.dataclass
class Adam:
    iterations: int = struct.field(pytree_node=False, default=300)
    alpha: float = struct.field(pytree_node=False, default=1e-3)
    b1: float = struct.field(pytree_node=False, default=0.9)
    b2: float = struct.field(pytree_node=False, default=0.999)
    eps: float = struct.field(pytree_node=False, default=1e-8)

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = False) -> OptResult:
        vg = jax.value_and_grad(fun)
        x0 = clip01(init, bounded)

        def step(carry, t):
            x, m, v_adam, best_x, best_v = carry
            v, g = vg(x)
            v, g = _sanitize(v, g)
            better = v > best_v
            best_x = jnp.where(better, x, best_x)
            best_v = jnp.where(better, v, best_v)
            m = self.b1 * m + (1 - self.b1) * g
            v_adam = self.b2 * v_adam + (1 - self.b2) * g * g
            mhat = m / (1 - self.b1 ** (t + 1))
            vhat = v_adam / (1 - self.b2 ** (t + 1))
            x = clip01(x + self.alpha * mhat / (jnp.sqrt(vhat) + self.eps),
                       bounded)
            return (x, m, v_adam, best_x, best_v), None

        carry0 = (x0, jnp.zeros_like(init), jnp.zeros_like(init), x0,
                  jnp.asarray(-jnp.inf, dtype=init.dtype))
        (x, _, _, best_x, best_v), _ = jax.lax.scan(
            step, carry0, jnp.arange(self.iterations, dtype=init.dtype))
        v_final = fun(x)
        v_final = jnp.where(jnp.isfinite(v_final), v_final, -jnp.inf)
        better = v_final > best_v
        return OptResult(x=jnp.where(better, x, best_x),
                         value=jnp.where(better, v_final, best_v))


@struct.dataclass
class GradientAscent:
    iterations: int = struct.field(pytree_node=False, default=300)
    alpha: float = struct.field(pytree_node=False, default=1e-3)
    gamma: float = struct.field(pytree_node=False, default=0.0)
    nesterov: bool = struct.field(pytree_node=False, default=False)

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = False) -> OptResult:
        vg = jax.value_and_grad(fun)
        grad_only = jax.grad(fun)
        x0 = clip01(init, bounded)

        def step(carry, _):
            x, vel, best_x, best_v = carry
            v, g = vg(x)
            v, g = _sanitize(v, g)
            better = v > best_v
            best_x = jnp.where(better, x, best_x)
            best_v = jnp.where(better, v, best_v)
            if self.nesterov:
                g_look = grad_only(clip01(x + self.gamma * vel, bounded))
                vel = self.gamma * vel + self.alpha * g_look
            else:
                vel = self.gamma * vel + self.alpha * g
            x = clip01(x + vel, bounded)
            return (x, vel, best_x, best_v), None

        carry0 = (x0, jnp.zeros_like(init), x0,
                  jnp.asarray(-jnp.inf, dtype=init.dtype))
        (x, _, best_x, best_v), _ = jax.lax.scan(
            step, carry0, None, length=self.iterations)
        v_final = fun(x)
        v_final = jnp.where(jnp.isfinite(v_final), v_final, -jnp.inf)
        better = v_final > best_v
        return OptResult(x=jnp.where(better, x, best_x),
                         value=jnp.where(better, v_final, best_v))
