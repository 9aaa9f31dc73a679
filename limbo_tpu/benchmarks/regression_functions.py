"""Regression benchmark test functions.

Reference: src/benchmarks/regression/test_functions.hpp and the protocol
config waf_tools/regression_benchmarks.json — functions with native bounds
(inputs are sampled uniformly in `bounds` and scaled from the unit cube):
Rastrigin (dims 1,2,4,8), GramacyLee (1), Step (1), RobotArm (8),
OTLCircuit (6), PistonSimulation (7), PlanarInverseDynamics I/II (6).
All pure JAX (vmap/jit-safe).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RegressionFunction:
    name: str
    fn: Callable                        # (d,) native-domain -> scalar
    bounds: np.ndarray                  # (d, 2) native bounds
    dims: Sequence[int]                 # benchmark dims (json "dimensions")

    def scale(self, u):
        """Map [0,1]^d samples into the native domain."""
        lo = jnp.asarray(self.bounds[:, 0], dtype=u.dtype)
        hi = jnp.asarray(self.bounds[:, 1], dtype=u.dtype)
        return lo + u * (hi - lo)

    def bounds_for_dim(self, d: int) -> np.ndarray:
        b = self.bounds
        if b.shape[0] == 1:
            return np.repeat(b, d, axis=0)
        assert b.shape[0] == d
        return b


def _rastrigin(x):
    return 10.0 * x.shape[0] + jnp.sum(
        x * x - 10.0 * jnp.cos(2.0 * jnp.pi * x))


def _gramacy_lee(x):
    v = x[0]
    return jnp.sin(10.0 * jnp.pi * v) / (2.0 * v) + (v - 1.0) ** 4


def _step(x):
    return jnp.where(x[0] <= 0.0, 0.0, 1.0)


def _robot_arm(x):
    q = x[:4]
    L = x[4:]
    csum = jnp.cumsum(q)
    u = jnp.sum(L * jnp.cos(csum))
    v = jnp.sum(L * jnp.sin(csum))
    return jnp.sqrt(u * u + v * v)


def _otl_circuit(x):
    Rb1, Rb2, Rf, Rc1, Rc2, beta = x[0], x[1], x[2], x[3], x[4], x[5]
    Vb1 = 12.0 * Rb2 / (Rb1 + Rb2)
    den = beta * (Rc2 + 9.0) + Rf
    term1 = (Vb1 + 0.74) * beta * (Rc2 + 9.0) / den
    term2 = 11.35 * Rf / den
    term3 = 0.74 * Rf * beta * (Rc2 + 9.0) / (den * Rc1)
    return term1 + term2 + term3


def _piston(x):
    M, S, V0, k, P0, Ta, T0 = (x[0], x[1], x[2], x[3], x[4], x[5], x[6])
    A = P0 * S + 19.62 * M - k * V0 / S
    V = S * (jnp.sqrt(A * A + 4.0 * k * P0 * V0 * Ta / T0) - A) / (2.0 * k)
    return 2.0 * jnp.pi * jnp.sqrt(
        M / (k + S * S * P0 * V0 * Ta / (T0 * V * V)))


def _planar_inverse_dynamics(x, torque_idx: int):
    ddq, dq, q = x[:2], x[2:4], x[4:6]
    m1 = l1 = 0.5
    m2 = l2 = 0.5
    r1, r2 = l1 / 2.0, l2 / 2.0
    I1 = m1 * l1 * l1 / 12.0
    I2 = m2 * l2 * l2 / 12.0
    a = I1 + I2 + m1 * r1 * r1 + m2 * (l1 * l1 + r2 * r2)
    b = m2 * l1 * r2
    delta = I2 + m2 * r2 * r2
    c1 = jnp.cos(q[1])
    s1 = jnp.sin(q[1])
    M = jnp.asarray([[a + 2 * b * c1, delta + b * c1],
                     [delta + b * c1, delta]])
    C = jnp.asarray([[-b * s1 * dq[1], -b * s1 * (dq[0] + dq[1])],
                     [b * s1 * dq[0], 0.0]])
    tau = M @ ddq + C @ dq
    return tau[torque_idx]


RASTRIGIN_REG = RegressionFunction(
    "Rastrigin", _rastrigin, np.array([[-5.12, 5.12]]), (1, 2, 4, 8))
GRAMACY_LEE = RegressionFunction(
    "GramacyLee", _gramacy_lee, np.array([[0.5, 2.5]]), (1,))
STEP = RegressionFunction(
    "Step", _step, np.array([[-2.0, 2.0]]), (1,))
ROBOT_ARM = RegressionFunction(
    "RobotArm", _robot_arm,
    np.array([[0.0, 2 * math.pi]] * 4 + [[0.0, 1.0]] * 4), (8,))
OTL_CIRCUIT = RegressionFunction(
    "OTLCircuit", _otl_circuit,
    np.array([[50., 150.], [25., 70.], [0.5, 3.], [1.2, 2.5],
              [0.25, 1.2], [50., 300.]]), (6,))
PISTON = RegressionFunction(
    "PistonSimulation", _piston,
    np.array([[30., 60.], [0.005, 0.020], [0.002, 0.010], [1000., 5000.],
              [90000., 110000.], [290., 296.], [340., 360.]]), (7,))
PLANAR_I = RegressionFunction(
    "PlanarInverseDynamicsI", lambda x: _planar_inverse_dynamics(x, 0),
    np.array([[-2 * math.pi, 2 * math.pi]] * 4 + [[-math.pi, math.pi]] * 2),
    (6,))
PLANAR_II = RegressionFunction(
    "PlanarInverseDynamicsII", lambda x: _planar_inverse_dynamics(x, 1),
    np.array([[-2 * math.pi, 2 * math.pi]] * 4 + [[-math.pi, math.pi]] * 2),
    (6,))

ALL_REGRESSION: List[RegressionFunction] = [
    RASTRIGIN_REG, GRAMACY_LEE, STEP, ROBOT_ARM, OTL_CIRCUIT, PISTON,
    PLANAR_I, PLANAR_II,
]
