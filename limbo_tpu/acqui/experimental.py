"""Experimental acquisition functions: EHVI wrapper + UCB_IMGPO.

Reference: src/limbo/experimental/acqui/{ehvi,ucb_imgpo,eci}.hpp (ECI lives
with the constrained optimizer, limbo_tpu/bo/cbo.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from limbo_tpu.acqui.acqui import FirstElem
from limbo_tpu.models import multi_gp
from limbo_tpu.ops.ehvi import ehvi_max


@struct.dataclass
class EhviAcqui:
    """Exact EHVI acquisition over a MultiGP, 2 or 3 objectives
    (experimental/acqui/ehvi.hpp:59, which calls the native ehvi2d; here the
    closed-form box decomposition runs fused on device — incl. the exact
    3-D scheme replacing src/ehvi/ehvi_sliceupdate.cc — and is
    differentiable through query).

    front: (k, p) observed Pareto front (padded; front_mask marks validity),
    ref: (p,) reference point.
    """

    front: jax.Array
    ref: jax.Array
    front_mask: Optional[jax.Array] = None

    def __call__(self, model: multi_gp.MultiGP, x: jax.Array,
                 aggregator=FirstElem, iteration=0) -> jax.Array:
        mu, var = multi_gp.query(model, x[None, :])
        sigma = jnp.sqrt(jnp.maximum(var[0], 1e-20))
        return ehvi_max(mu[0], sigma, self.front, self.ref,
                        front_mask=self.front_mask)


@struct.dataclass
class UCB_IMGPO:
    """UCB variant used by IMGPO (experimental/acqui/ucb_imgpo.hpp:62):

    a(x) = mu(x) + (sqrt(2 log(pi^2 M^2 / (12 nu))) + 0.2) * sigma(x),
    default nu = 0.05; M = number of GP-screened candidates so far.
    """

    nu: float = struct.field(pytree_node=False, default=0.05)

    def __call__(self, gp, x: jax.Array, aggregator=FirstElem,
                 iteration=0, M: int = 1) -> jax.Array:
        from limbo_tpu.models import gp as gp_mod

        mu, var = gp_mod.query(gp, x[None, :])
        varsigma = math.sqrt(
            2.0 * math.log(math.pi ** 2 * max(M, 1) ** 2 / (12.0 * self.nu)))
        return aggregator(mu[0]) + (varsigma + 0.2) * jnp.sqrt(var[0])
