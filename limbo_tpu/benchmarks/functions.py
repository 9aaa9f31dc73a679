"""The BO benchmark test functions.

Reference: src/benchmarks/limbo/testfunctions.hpp:110-360 — Sphere,
Ellipsoid (with BBOB t_osz transform), Rastrigin, Hartmann3, Hartmann6,
GoldsteinPrice (log-normalized), BraninNormalized, SixHumpCamel; all defined
on [0,1]^d, MINIMIZATION convention, with known solutions for the
accuracy = |f(best) - f(x*)| metric (bench.cpp:146-157).

All are pure JAX (vmap/jit-safe) so whole benchmark runs execute on device
through BOptimizer.optimize_jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TestFunction:
    name: str
    dim_in: int
    fn: Callable                    # (d,) -> scalar, minimize
    solutions: np.ndarray           # (n_sols, d) argmin(s) in [0,1]^d

    @property
    def f_opt(self) -> float:
        return float(min(self.fn(jnp.asarray(s)) for s in self.solutions))

    def accuracy(self, best_observed: float) -> float:
        """|f(best) - f(x*)| (bench.cpp accuracy)."""
        return abs(best_observed - self.f_opt)

    def as_max_objective(self):
        """(d,) -> (1,) maximization wrapper for the BO drivers."""
        f = self.fn
        return lambda x: jnp.asarray([-f(jnp.asarray(x))])


def _sphere(x):
    return jnp.sum((x - 0.5) ** 2)


def _ellipsoid(x):
    # t_osz transform exactly as testfunctions.hpp:102-108:
    # sign(z) * exp(hat + 0.049*sin(c1*hat) + sin(c2*hat))
    z = x - 0.5
    hat = jnp.where(z != 0, jnp.log(jnp.abs(jnp.where(z == 0, 1.0, z))), 0.0)
    c1 = jnp.where(z > 0, 10.0, 5.5)
    c2 = jnp.where(z > 0, 7.9, 3.1)
    zz = jnp.sign(z) * jnp.exp(hat + 0.049 * jnp.sin(c1 * hat)
                               + jnp.sin(c2 * hat))
    d = x.shape[0]
    w = jnp.power(10.0, jnp.arange(d, dtype=x.dtype) / (d - 1.0))
    return jnp.sum(w * zz * zz + 1.0)


def _rastrigin(x):
    z = 2.0 * x - 1.0
    d = x.shape[0]
    return 10.0 * d + jnp.sum(z * z - 10.0 * jnp.cos(2.0 * jnp.pi * z))


_H3_A = np.array([[3.0, 10., 30.], [0.1, 10., 35.],
                  [3.0, 10., 30.], [0.1, 10., 35.]])
_H3_P = np.array([[0.3689, 0.1170, 0.2673], [0.4699, 0.4387, 0.7470],
                  [0.1091, 0.8732, 0.5547], [0.0381, 0.5743, 0.8828]])
_H_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])
_H6_A = np.array([[10., 3., 17., 3.5, 1.7, 8.],
                  [0.05, 10., 17., 0.1, 8., 14.],
                  [3., 3.5, 1.7, 10., 17., 8.],
                  [17., 8., 0.05, 10., 0.1, 14.]])
_H6_P = np.array([[0.1312, 0.1696, 0.5569, 0.0124, 0.8283, 0.5886],
                  [0.2329, 0.4135, 0.8307, 0.3736, 0.1004, 0.9991],
                  [0.2348, 0.1451, 0.3522, 0.2883, 0.3047, 0.6650],
                  [0.4047, 0.8828, 0.8732, 0.5743, 0.1091, 0.0381]])


def _hartmann(A, P):
    def f(x):
        a = jnp.asarray(A, dtype=x.dtype)
        p = jnp.asarray(P, dtype=x.dtype)
        al = jnp.asarray(_H_ALPHA, dtype=x.dtype)
        s = jnp.sum(a * (x[None, :] - p) ** 2, axis=1)
        return -jnp.sum(al * jnp.exp(-s))
    return f


def _goldstein_price(x):
    z = 4.0 * x - 2.0
    x1, x2 = z[0], z[1]
    fact1a = (x1 + x2 + 1.0) ** 2
    fact1b = (19. - 14. * x1 + 3. * x1 ** 2 - 14. * x2 + 6. * x1 * x2
              + 3. * x2 ** 2)
    fact1 = 1.0 + fact1a * fact1b
    fact2a = (2. * x1 - 3. * x2) ** 2
    fact2b = (18. - 32. * x1 + 12. * x1 ** 2 + 48. * x2 - 36. * x1 * x2
              + 27. * x2 ** 2)
    fact2 = 30.0 + fact2a * fact2b
    return (jnp.log(fact1 * fact2) - 8.693) / 2.427


def _branin_normalized(x):
    x1 = x[0] * 15.0 - 5.0
    x2 = x[1] * 15.0
    term1 = (x2 - 5.1 * x1 ** 2 / (4 * jnp.pi ** 2)
             + 5.0 * x1 / jnp.pi - 6.0) ** 2
    term2 = (10.0 - 10.0 / (8.0 * jnp.pi)) * jnp.cos(x1)
    return (term1 + term2 - 44.81) / 51.95


def _six_hump_camel(x):
    x1 = -3.0 + 6.0 * x[0]
    x2 = -2.0 + 4.0 * x[1]
    x1_2, x2_2 = x1 * x1, x2 * x2
    return ((4.0 - 2.1 * x1_2 + x1_2 * x1_2 / 3.0) * x1_2 + x1 * x2
            + (-4.0 + 4.0 * x2_2) * x2_2)


SPHERE = TestFunction("Sphere", 2, _sphere, np.array([[0.5, 0.5]]))
ELLIPSOID = TestFunction("Ellipsoid", 2, _ellipsoid, np.array([[0.5, 0.5]]))
RASTRIGIN = TestFunction("Rastrigin", 4, _rastrigin, np.full((1, 4), 0.5))
HARTMANN3 = TestFunction("Hartmann3", 3, _hartmann(_H3_A, _H3_P),
                         np.array([[0.114614, 0.555649, 0.852547]]))
HARTMANN6 = TestFunction("Hartmann6", 6, _hartmann(_H6_A, _H6_P),
                         np.array([[0.20169, 0.150011, 0.476874,
                                    0.275332, 0.311652, 0.6573]]))
GOLDSTEIN_PRICE = TestFunction("GoldsteinPrice", 2, _goldstein_price,
                               np.array([[0.5, 0.25]]))
BRANIN = TestFunction(
    "BraninNormalized", 2, _branin_normalized,
    np.array([[(-math.pi + 5) / 15, 12.275 / 15],
              [(math.pi + 5) / 15, 2.275 / 15],
              [(9.42478 + 5) / 15, 2.475 / 15]]))
SIX_HUMP_CAMEL = TestFunction(
    "SixHumpCamel", 2, _six_hump_camel,
    np.array([[(0.0898 + 3) / 6, (-0.7126 + 2) / 4],
              [(-0.0898 + 3) / 6, (0.7126 + 2) / 4]]))

ALL_FUNCTIONS: List[TestFunction] = [
    SPHERE, ELLIPSOID, RASTRIGIN, HARTMANN3, HARTMANN6,
    GOLDSTEIN_PRICE, BRANIN, SIX_HUMP_CAMEL,
]
