"""Multi-objective Bayesian optimization: BoMulti base, EHVI, NSBO, ParEGO.

Reference: src/limbo/experimental/bayes_opt/{bo_multi,ehvi,nsbo,parego}.hpp
and experimental/model/gp_parego.hpp.

* BoMulti keeps one GP per objective (here: a vmapped MultiGP) plus the
  Pareto front of the observed data and of the model (bo_multi.hpp:153-198).
  The model front comes from the batched JAX NSGA-II (opt/nsga2.py) instead
  of sferes2.

* Ehvi (ehvi.hpp:82): each iteration maximizes the exact 2-D EHVI seeded
  from every Pareto point — limbo fans the seeds over TBB threads and calls
  the compiled ehvi2d per candidate (ehvi.hpp:128-147); here the seed batch
  is one vmapped gradient ascent on the *differentiable* device EHVI.

* Nsbo (nsbo.hpp:65): samples a random point from the variance Pareto front
  of the NSGA-II model front.

* Parego (parego.hpp:73, gp_parego.hpp:103): random-weight augmented
  Chebyshev scalarization (y = max_j(l_j y_j) + rho * sum_j l_j y_j) reduces
  to single-objective BO per iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.optimizer import BOptimizer, EvaluationError
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.kernels import Exp, MaternFiveHalves
from limbo_tpu.means import DataMean, NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.models import multi_gp
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.opt.nsga2 import Nsga2
from limbo_tpu.ops.ehvi import ehvi_max
from limbo_tpu.ops.pareto import non_dominated_mask


class BoMulti:
    """Shared machinery for multi-objective loops (limbo BoMulti)."""

    def __init__(self, n_objs: int, kernel=None, mean=None, init=None,
                 stop: Sequence = None, nsga2: Optional[Nsga2] = None,
                 stats_enabled: bool = False, stats: Sequence = (),
                 res_base_dir: Optional[str] = None, dtype=jnp.float64):
        self.n_objs = n_objs
        self.kernel = (kernel if kernel is not None
                       else MaternFiveHalves.create(dtype=dtype))
        self.mean = mean if mean is not None else NullMean(dim_out=n_objs)
        self.init = init if init is not None else RandomSampling(10)
        self.stop = tuple(stop) if stop is not None else (MaxIterations(30),)
        self.nsga2 = nsga2 if nsga2 is not None else Nsga2(pop_size=64,
                                                           generations=30)
        self.dtype = dtype
        self.stats_enabled = stats_enabled
        self.stats = tuple(stats)
        from limbo_tpu.utils.sysinfo import make_res_dir
        self.res_dir = (make_res_dir(res_base_dir)
                        if (stats_enabled and res_base_dir is not None
                            and stats) else None)
        self.model: Optional[multi_gp.MultiGP] = None
        self.X: list = []
        self.Y: list = []
        self.iteration = 0

    # -- data handling -------------------------------------------------------

    def _eval_checked(self, f, x: np.ndarray) -> np.ndarray:
        y = np.atleast_1d(np.asarray(f(x), dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        return y

    def add_sample(self, x, y):
        self.X.append(np.asarray(x))
        self.Y.append(np.asarray(y))

    def update_models(self, capacity: Optional[int] = None):
        """Refit one GP per objective (bo_multi.hpp _update_models)."""
        X = jnp.asarray(np.stack(self.X), dtype=self.dtype)
        Y = jnp.asarray(np.stack(self.Y), dtype=self.dtype)
        self.model = multi_gp.fit(self.kernel, self.mean, X, Y,
                                  capacity=capacity)

    def pareto_data(self) -> Tuple[np.ndarray, np.ndarray]:
        """Non-dominated observed points (bo_multi.hpp update_pareto_data)."""
        Y = jnp.asarray(np.stack(self.Y), dtype=self.dtype)
        nd = np.asarray(non_dominated_mask(Y))
        X = np.stack(self.X)
        return X[nd], np.stack(self.Y)[nd]

    def pareto_model(self, key) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """NSGA-II over the posterior means -> model front (x, mu, sigma^2)
        (bo_multi.hpp update_pareto_model:184)."""
        model = self.model
        dim = int(model.dim_in)

        def objs(x):
            mu, _ = multi_gp.query(model, x[None, :])
            return mu[0]

        Xp, Yp = self.nsga2(objs, dim, key, dtype=self.dtype)
        nd = np.asarray(non_dominated_mask(Yp))
        mu, var = multi_gp.query(model, Xp)
        return (np.asarray(Xp)[nd], np.asarray(mu)[nd], np.asarray(var)[nd])

    def _init_design(self, f, dim: int, key):
        X0 = self.init(key, dim, dtype=self.dtype)
        for i in range(X0.shape[0]):
            x = np.asarray(X0[i])
            self.add_sample(x, self._eval_checked(f, x))

    def _stopped(self) -> bool:
        state = dataclasses.make_dataclass("S", ["iteration"])(self.iteration)
        return any(bool(s(state)) for s in self.stop)

    def _update_stats(self):
        if not self.stats_enabled:
            return
        for stat in self.stats:
            stat(self)


class Ehvi(BoMulti):
    """Expected-hypervolume-improvement BO (limbo Ehvi, ehvi.hpp:82).

    2 or 3 objectives (n_objs = len(ref)): exact EHVI via the device box
    decomposition (ops/ehvi.py) — the 3-objective path replaces the
    reference's O(n^3) slice-update scheme (src/ehvi/ehvi_sliceupdate.cc)."""

    def __init__(self, ref: Sequence[float] = (0.0, 0.0),
                 inner_opt=None, q: int = 1, gh_nodes: int = 12, **kw):
        super().__init__(n_objs=len(ref), **kw)
        self.ref = np.asarray(ref, dtype=np.float64)
        self.inner_opt = (inner_opt if inner_opt is not None
                          else Rprop(iterations=50))
        # q > 1: propose a q-point batch per iteration by jointly maximizing
        # the EXACT q-EHVI (ops/ehvi.qehvi_exact_max — inclusion-exclusion
        # over the box decomposition with the true joint posterior
        # covariance; ≙ the exact-batch capability of src/ehvi/ehvi_multi.cc
        # extended to joint batches).  Intended for q <= 4.
        self.q = int(q)
        self.gh_nodes = int(gh_nodes)
        self._step_jit = None

    def _build_step(self, front_size: int):
        inner = self.inner_opt
        ref = jnp.asarray(self.ref, dtype=self.dtype)

        @jax.jit
        def step(model, front_y, front_x, front_mask, key):
            def acq(x):
                mu, var = multi_gp.query(model, x[None, :])
                sigma = jnp.sqrt(jnp.maximum(var[0], 1e-20))
                return ehvi_max(mu[0], sigma, front_y, ref,
                                front_mask=front_mask)

            keys = jax.random.split(key, front_x.shape[0])
            res = jax.vmap(lambda x0, k: inner(acq, x0, k, True))(
                front_x, keys)
            value = jnp.where(front_mask > 0, res.value, -jnp.inf)
            i = jnp.argmax(value)
            return res.x[i], value[i]

        return step

    def _build_step_batch(self, dim: int):
        """One seeded multi-start joint ascent over the (q, d) batch on the
        exact q-EHVI.  Seeds: each front point tiled to q jittered copies."""
        from limbo_tpu.acqui.qei import joint_posterior_multi
        from limbo_tpu.ops.ehvi import qehvi_exact_max

        inner = self.inner_opt
        ref = jnp.asarray(self.ref, dtype=self.dtype)
        q, gh = self.q, self.gh_nodes

        @jax.jit
        def step(model, front_y, front_x, front_mask, key):
            def acq(flat):
                Xb = jnp.reshape(flat, (q, dim))
                mu, cov = joint_posterior_multi(model, Xb)
                return qehvi_exact_max(mu, cov, front_y, ref,
                                       front_mask=front_mask, gh_nodes=gh)

            k_jit, k_run = jax.random.split(key)
            seeds = jnp.tile(front_x[:, None, :], (1, q, 1))
            seeds = jnp.clip(
                seeds + 0.1 * jax.random.normal(
                    k_jit, seeds.shape, dtype=front_x.dtype), 0.0, 1.0)
            seeds = seeds.reshape(front_x.shape[0], q * dim)
            keys = jax.random.split(k_run, seeds.shape[0])
            res = jax.vmap(lambda x0, k: inner(acq, x0, k, True))(seeds, keys)
            value = jnp.where(front_mask > 0, res.value, -jnp.inf)
            i = jnp.argmax(value)
            return jnp.reshape(res.x[i], (q, dim)), value[i]

        return step

    def optimize(self, f: Callable, dim: int, key=None, reset: bool = True):
        key = key if key is not None else jax.random.PRNGKey(0)
        if reset:
            self.X, self.Y, self.iteration = [], [], 0
            key, k0 = jax.random.split(key)
            self._init_design(f, dim, k0)
        cap = max(64, -(-(len(self.X) + self._max_iters() * self.q)
                        // 64) * 64)
        FRONT_CAP = 64
        while not self._stopped():
            key, k_step = jax.random.split(key)
            self.update_models(capacity=cap)
            Xp, Yp = self.pareto_data()
            if len(Xp) > FRONT_CAP:
                # keep an evenly spread subset along the front (sorted by
                # first objective) rather than truncating arbitrarily
                order = np.argsort(Yp[:, 0])
                pick = order[np.linspace(0, len(order) - 1, FRONT_CAP)
                             .round().astype(int)]
                Xp, Yp = Xp[pick], Yp[pick]
            k = min(len(Xp), FRONT_CAP)
            fx = np.zeros((FRONT_CAP, dim)); fx[:k] = Xp[:k]
            fy = np.full((FRONT_CAP, self.n_objs), self.ref); fy[:k] = Yp[:k]
            fm = np.zeros(FRONT_CAP); fm[:k] = 1.0
            if self._step_jit is None:
                self._step_jit = (self._build_step(FRONT_CAP)
                                  if self.q == 1
                                  else self._build_step_batch(dim))
            x_new, hv = self._step_jit(
                self.model, jnp.asarray(fy, dtype=self.dtype),
                jnp.asarray(fx, dtype=self.dtype),
                jnp.asarray(fm, dtype=self.dtype), k_step)
            x_new = np.asarray(x_new)
            if self.q == 1:
                self.add_sample(x_new, self._eval_checked(f, x_new))
            else:
                for j in range(self.q):
                    self.add_sample(x_new[j],
                                    self._eval_checked(f, x_new[j]))
            self.iteration += 1
            self._update_stats()
        self.update_models(capacity=cap)
        return self.pareto_data()

    def _max_iters(self) -> int:
        for s in self.stop:
            if isinstance(s, MaxIterations):
                return s.iterations
        return 30


class Nsbo(BoMulti):
    """Pareto-front-of-variances sampling (limbo Nsbo, nsbo.hpp:65)."""

    def optimize(self, f: Callable, dim: int, key=None, reset: bool = True):
        key = key if key is not None else jax.random.PRNGKey(0)
        if reset:
            self.X, self.Y, self.iteration = [], [], 0
            key, k0 = jax.random.split(key)
            self._init_design(f, dim, k0)
        while not self._stopped():
            key, k_model, k_pick = jax.random.split(key, 3)
            self.update_models()
            Xp, mu_p, var_p = self.pareto_model(k_model)
            # Pareto front of the VARIANCES (nsbo.hpp:82)
            nd = np.asarray(non_dominated_mask(jnp.asarray(var_p)))
            cand = Xp[nd]
            idx = int(jax.random.randint(k_pick, (), 0, len(cand)))
            x_new = cand[idx]
            self.add_sample(x_new, self._eval_checked(f, x_new))
            self.iteration += 1
            self._update_stats()
        self.update_models()
        return self.pareto_data()


class Parego:
    """Multi-objective via Chebyshev scalarization to a single-objective
    BOptimizer (limbo Parego + GPParego).

    Each outer iteration draws fresh weights l ~ normalized U(0,1)^M and
    scalarizes ALL observations: s(y) = max_j(l_j y_j) + rho * sum_j l_j y_j
    (gp_parego.hpp:103-116; rho default 0.05), then takes one BO step on the
    scalarized model.
    """

    def __init__(self, n_objs: int, rho: float = 0.05, bo: BOptimizer = None,
                 iterations: int = 30, init=None, dtype=jnp.float64):
        self.n_objs = n_objs
        self.rho = rho
        self.iterations = iterations
        self.init = init if init is not None else RandomSampling(10)
        self.dtype = dtype
        self.bo = bo if bo is not None else BOptimizer(
            stats_enabled=False, dtype=dtype,
            stop=(MaxIterations(iterations),))
        self.X: list = []
        self.Y: list = []

    def _scalarize(self, Y: np.ndarray, lam: np.ndarray) -> np.ndarray:
        w = Y * lam[None, :]
        return (w.max(axis=1) + self.rho * w.sum(axis=1))[:, None]

    def optimize(self, f: Callable, dim: int, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, k0 = jax.random.split(key)
        X0 = self.init(k0, dim, dtype=self.dtype)
        for i in range(X0.shape[0]):
            x = np.asarray(X0[i])
            y = np.atleast_1d(np.asarray(f(x), dtype=np.float64))
            self.X.append(x)
            self.Y.append(y)

        capacity = max(64, -(-(len(self.X) + self.iterations + 1) // 64) * 64)
        if self.bo._propose_jit is None:
            self.bo._propose_jit = self.bo._build_propose()

        for it in range(self.iterations):
            key, k_lam, k_prop = jax.random.split(key, 3)
            lam = np.asarray(jax.random.uniform(k_lam, (self.n_objs,)))
            lam = lam / lam.sum()
            S = self._scalarize(np.stack(self.Y), lam)
            kern = (self.bo.kernel if self.bo.kernel is not None
                    else MaternFiveHalves.create(dtype=self.dtype))
            mean = (self.bo.mean if self.bo.mean is not None
                    else DataMean.create(dim_out=1, dtype=self.dtype))
            gp = gp_mod.fit(
                kern, mean,
                jnp.asarray(np.stack(self.X), dtype=self.dtype),
                jnp.asarray(S, dtype=self.dtype), capacity=capacity)
            x_new, _, _ = self.bo._propose_jit(gp, k_prop, jnp.asarray(it))
            x_new = np.asarray(x_new)
            y = np.atleast_1d(np.asarray(f(x_new), dtype=np.float64))
            if not np.all(np.isfinite(y)):
                raise EvaluationError(f"invalid observation {y}")
            self.X.append(x_new)
            self.Y.append(y)

        Y = jnp.asarray(np.stack(self.Y))
        nd = np.asarray(non_dominated_mask(Y))
        return np.stack(self.X)[nd], np.stack(self.Y)[nd]
