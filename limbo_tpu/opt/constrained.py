"""Constrained inner optimization: an augmented-Lagrangian wrapper.

Reference capability: NLOpt's inequality/equality constraint interface
(src/limbo/opt/nlopt_base.hpp:116-130 `add_inequality_constraint` /
`add_equality_constraint`, exercised by src/tests/test_nlopt.cpp:100-165
with COBYLA and AUGLAG_EQ).  The reference delegates to NLOpt's augmented-
Lagrangian/COBYLA implementations; here the augmented Lagrangian itself is
the (tiny) algorithm, and any of the framework's jit-native optimizers
(Rprop, Adam, GradientAscent, Cmaes, RandomRestarts) serves as the inner
solver — constraint gradients come from autodiff instead of user-supplied
closed forms.

Convention (limbo's): MAXIMIZE f(x) subject to
    g_i(x) <= 0   (inequality),      h_j(x) = 0   (equality).

Method (standard AL with Powell-Hestenes-Rockafellar updates):
    L(x) = f(x) - sum_j [lam_j h_j + (rho/2) h_j^2]
                - (1/2 rho) sum_i [max(0, mu_i + rho g_i)^2 - mu_i^2]
outer loop: maximize L with the sub-optimizer, then
    lam_j += rho h_j(x),  mu_i = max(0, mu_i + rho g_i(x)),  rho *= growth.
The outer loop is a short static Python unroll — the whole thing jits.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.opt.base import OptResult
from limbo_tpu.opt.gradient import Rprop


def _default_sub():
    return Rprop(iterations=100)


@struct.dataclass
class AugmentedLagrangian:
    """Constraint-handling wrapper around any inner optimizer.

    Fields `inequality` / `equality` are tuples of scalar functions of x
    (static pytree metadata — they define the compiled program).
    """

    sub: object = struct.field(default_factory=_default_sub)
    inequality: Tuple[Callable, ...] = struct.field(pytree_node=False,
                                                    default=())
    equality: Tuple[Callable, ...] = struct.field(pytree_node=False,
                                                  default=())
    outer_iterations: int = struct.field(pytree_node=False, default=10)
    rho0: float = struct.field(pytree_node=False, default=1.0)
    rho_growth: float = struct.field(pytree_node=False, default=2.0)

    # composition helpers (≙ nlopt_base.hpp add_*_constraint)
    def add_inequality_constraint(self, g: Callable) -> "AugmentedLagrangian":
        return self.replace(inequality=self.inequality + (g,))

    def add_equality_constraint(self, h: Callable) -> "AugmentedLagrangian":
        return self.replace(equality=self.equality + (h,))

    def __call__(self, fun: Callable, init: jax.Array, key=None,
                 bounded: bool = False) -> OptResult:
        key = key if key is not None else jax.random.PRNGKey(0)
        dtype = init.dtype
        n_eq = len(self.equality)
        n_in = len(self.inequality)
        lam = jnp.zeros((max(n_eq, 1),), dtype)
        mu = jnp.zeros((max(n_in, 1),), dtype)
        rho = jnp.asarray(self.rho0, dtype)
        x = init

        def augmented(x, lam, mu, rho):
            v = fun(x)
            for j, h in enumerate(self.equality):
                hv = h(x)
                v = v - (lam[j] * hv + 0.5 * rho * hv * hv)
            for i, g in enumerate(self.inequality):
                gv = g(x)
                t = jnp.maximum(0.0, mu[i] + rho * gv)
                v = v - (t * t - mu[i] * mu[i]) / (2.0 * rho)
            return v

        for _ in range(self.outer_iterations):
            key, k_sub = jax.random.split(key)
            lam_c, mu_c, rho_c = lam, mu, rho      # close over this round's
            res = self.sub(lambda z: augmented(z, lam_c, mu_c, rho_c),
                           x, k_sub, bounded)
            x = res.x
            for j, h in enumerate(self.equality):
                lam = lam.at[j].add(rho * h(x))
            for i, g in enumerate(self.inequality):
                mu = mu.at[i].set(jnp.maximum(0.0, mu[i] + rho * g(x)))
            rho = rho * self.rho_growth

        return OptResult(x=x, value=fun(x))
