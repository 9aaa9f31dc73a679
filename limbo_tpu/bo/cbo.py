"""Constrained Bayesian optimization: CBOptimizer + ECI acquisition.

Reference: src/limbo/experimental/bayes_opt/cboptimizer.hpp:120 (separate
objective GP and constraint GP over the split observation vector) and
experimental/acqui/eci.hpp:66 (Expected Constrained Improvement =
EI(x) * probability of feasibility, where a constraint observation of 1
means feasible and Pf = Phi((mu_c - 1)/sigma_c), eci.hpp:115-130).

The objective function returns a concatenated vector
[objectives (dim_out), constraints (nb_constraints)]; constraint values are
in [0, 1] with 1 = satisfied (limbo's convention from the cbo example,
src/examples/experimental/cbo.cpp).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from limbo_tpu.acqui.acqui import EI, FirstElem
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.optimizer import (
    BOptimizer,
    EvaluationError,
    default_acqui_optimizer,
)
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.kernels import Exp, MaternFiveHalves
from limbo_tpu.means import ConstantMean, DataMean
from limbo_tpu.models import gp as gp_mod


@struct.dataclass
class ECI:
    """Expected constrained improvement (eci.hpp:66): EI * Pf."""

    jitter: float = struct.field(pytree_node=False, default=0.0)

    def __call__(self, model, constraint_model, x: jax.Array,
                 aggregator=FirstElem, iteration=0, f_max=None) -> jax.Array:
        ei = EI(jitter=self.jitter)
        val = ei(model, x, aggregator, iteration, f_max=f_max)
        # probability of feasibility (eci.hpp:115-130)
        mu_c, var_c = gp_mod.query(constraint_model, x[None, :])
        sigma_c = jnp.sqrt(var_c[0])
        Z = (aggregator(mu_c[0]) - 1.0) / jnp.maximum(sigma_c, 1e-10)
        Pf = 0.5 * jax.lax.erfc(-Z / jnp.sqrt(2.0))
        Pf = jnp.where((sigma_c < 1e-10) | (constraint_model.n < 1), 1.0, Pf)
        return val * Pf


class CBOptimizer:
    """The constrained BO loop (cboptimizer.hpp optimize:148-195)."""

    def __init__(self, nb_constraints: int, dim_out: int = 1,
                 kernel=None, constraint_kernel=None,
                 mean=None, constraint_mean=None,
                 acqui: Optional[ECI] = None, acqui_optimizer=None,
                 init=None, stop: Sequence = None,
                 hp_opt=None, hp_period: int = -1,
                 dtype=jnp.float64):
        self.nb_constraints = nb_constraints
        self.dim_out = dim_out
        self.kernel = kernel
        # limbo CBO defaults: Exp kernel + Constant mean for constraints
        self.constraint_kernel = constraint_kernel
        self.mean = mean
        self.constraint_mean = constraint_mean
        self.acqui = acqui if acqui is not None else ECI()
        self.acqui_optimizer = (acqui_optimizer if acqui_optimizer is not None
                                else default_acqui_optimizer())
        self.init = init if init is not None else RandomSampling(10)
        self.stop = tuple(stop) if stop is not None else (MaxIterations(30),)
        self.hp_opt = hp_opt
        self.hp_period = hp_period
        self.dtype = dtype
        self.X: list = []
        self.Yobj: list = []
        self.Ycon: list = []
        self.iteration = 0
        self._step_jit = None

    def _max_iters(self) -> int:
        for s in self.stop:
            if isinstance(s, MaxIterations):
                return s.iterations
        return 30

    def _eval_split(self, f, x):
        y = np.atleast_1d(np.asarray(f(x), dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        return y[: self.dim_out], y[self.dim_out:]

    def _build_step(self):
        acqui, opt = self.acqui, self.acqui_optimizer

        @jax.jit
        def step(model, cmodel, key, iteration):
            f_max = EI().best_predicted(model, FirstElem)

            def acq(x):
                return acqui(model, cmodel, x, FirstElem, iteration,
                             f_max=f_max)

            start = jnp.full((model.dim_in,), 0.5, dtype=model.x.dtype)
            res = opt(acq, start, key, True)
            return res.x, res.value

        return step

    def optimize(self, f: Callable, dim: int, key=None, reset: bool = True):
        key = key if key is not None else jax.random.PRNGKey(0)
        if reset:
            self.X, self.Yobj, self.Ycon = [], [], []
            self.iteration = 0
            key, k0 = jax.random.split(key)
            X0 = self.init(k0, dim, dtype=self.dtype)
            for i in range(X0.shape[0]):
                x = np.asarray(X0[i])
                yo, yc = self._eval_split(f, x)
                self.X.append(x); self.Yobj.append(yo); self.Ycon.append(yc)

        cap = max(64, -(-(len(self.X) + self._max_iters() + 1) // 64) * 64)
        kern = (self.kernel if self.kernel is not None
                else MaternFiveHalves.create(dtype=self.dtype))
        ckern = (self.constraint_kernel if self.constraint_kernel is not None
                 else Exp.create(dtype=self.dtype))
        mean = (self.mean if self.mean is not None
                else DataMean.create(dim_out=self.dim_out, dtype=self.dtype))
        cmean = (self.constraint_mean if self.constraint_mean is not None
                 else ConstantMean.create(1.0, dim_out=self.nb_constraints,
                                          dtype=self.dtype))
        if self._step_jit is None:
            self._step_jit = self._build_step()

        while self.iteration < self._max_iters():
            key, k_step = jax.random.split(key)
            X = jnp.asarray(np.stack(self.X), dtype=self.dtype)
            model = gp_mod.fit(kern, mean, X,
                               jnp.asarray(np.stack(self.Yobj),
                                           dtype=self.dtype), capacity=cap)
            cmodel = gp_mod.fit(ckern, cmean, X,
                                jnp.asarray(np.stack(self.Ycon),
                                            dtype=self.dtype), capacity=cap)
            if (self.hp_opt is not None and self.hp_period > 0
                    and (self.iteration + 1) % self.hp_period == 0):
                key, k_hp = jax.random.split(key)
                model = self.hp_opt(model, k_hp)
            x_new, _ = self._step_jit(model, cmodel, k_step,
                                      jnp.asarray(self.iteration))
            x_new = np.asarray(x_new)
            yo, yc = self._eval_split(f, x_new)
            self.X.append(x_new); self.Yobj.append(yo); self.Ycon.append(yc)
            self.iteration += 1
        return self

    # -- feasibility-aware bests (cboptimizer.hpp:198-232) -------------------

    def _feasible_mask(self) -> np.ndarray:
        if self.nb_constraints == 0:
            return np.ones(len(self.X), dtype=bool)
        C = np.stack(self.Ycon)
        return np.all(C >= 1.0 - 1e-9, axis=1)

    @property
    def best_observation(self) -> np.ndarray:
        Y = np.stack(self.Yobj)
        feas = self._feasible_mask()
        pool = Y[feas] if feas.any() else Y
        return pool[np.argmax(pool[:, 0])]

    @property
    def best_sample(self) -> np.ndarray:
        Y = np.stack(self.Yobj)[:, 0]
        X = np.stack(self.X)
        feas = self._feasible_mask()
        if feas.any():
            idx = np.flatnonzero(feas)
            return X[idx[np.argmax(Y[feas])]]
        return X[np.argmax(Y)]
