"""The Bayesian-optimization driver.

Reference: src/limbo/bayes_opt/bo_base.hpp:179 (BoBase: sample DB, init,
stats, stop chaining, NaN guards) and boptimizer.hpp:116 (BOptimizer: the
classic fit -> acquire -> evaluate -> update loop, with periodic
hyperparameter re-optimization via hp_period, boptimizer.hpp:163).

TPU-first redesign:

* The GP lives in fixed-capacity padded buffers sized once from
  n_init + max_iterations, so the *entire run* compiles to a handful of XLA
  programs (propose / add / hp-opt) — no shape-driven recompiles.

* Two drive modes:
    - `optimize(f, ...)`    — host loop, arbitrary Python objective (limbo's
      model: control leaves the library at eval_and_add, bo_base.hpp:232).
    - `optimize_jit(f, ...)` — f is a JAX function; the WHOLE BO run
      (init eval, every fit/acquire/evaluate/update, periodic hp-opt) is one
      `lax.scan` compiled on device.  This is the benchmark path: zero host
      round-trips per iteration.

* The acquisition optimizer defaults to batched multi-start gradient ascent
  + a dense random sweep (acquisitions here are differentiable through the
  GP query), replacing limbo's NLOpt DIRECT-L-RAND / CMA-ES default chain
  (boptimizer.hpp:120-127).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui.acqui import EI, UCB, FirstElem
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.kernels import MaternFiveHalves
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.utils.sysinfo import make_res_dir


class EvaluationError(Exception):
    """Raised on NaN/Inf observations (limbo bo_base.hpp:106,232-238)."""


def default_acqui_optimizer():
    """Batched multi-start ascent + random sweep (DIRECT replacement).

    Wide-and-shallow beats deep-and-narrow on TPU: restarts are a free batch
    axis (the per-step cost at large n is one K^{-1} mirror read regardless
    of width) while ascent steps serialize.  64 restarts x 20 steps runs 21
    sequential reads where the earlier 32x30 default ran 31 (~1.4x the
    n=10k iteration rate) at statistically indistinguishable BO quality:
    30-rep full-suite A/B, Mann-Whitney p >= 0.28 on every function
    (docs/BENCHMARKS.md "why this schedule", scripts/acq_sched_ab.py).
    """
    return RandomRestarts(sub=Rprop(iterations=20), repeats=64,
                          sweep_samples=1024)


@dataclasses.dataclass
class BOState:
    """Host-side view of a running optimization (mutable between steps)."""

    gp: gp_mod.GP
    key: jax.Array
    iteration: int = 0
    total_iterations: int = 0
    aggregator: Callable = FirstElem
    last_sample: Optional[np.ndarray] = None
    last_observation: Optional[np.ndarray] = None
    last_acqui_value: Optional[float] = None
    last_prediction: Optional[np.ndarray] = None
    cache: Optional[gp_mod.QueryCache] = None
    # init-design points not yet evaluated (ask/tell flow only; optimize()
    # evaluates the whole design up front)
    pending_init: Optional[list] = None

    # -- best-so-far (limbo best_observation/best_sample,
    #    boptimizer.hpp:174-188) --------------------------------------------
    @property
    def _agg_obs(self) -> np.ndarray:
        n = int(self.gp.n)
        ys = np.asarray(self.gp.y[:n])
        return np.array([self.aggregator(y) for y in ys])

    @property
    def best_index(self) -> int:
        return int(np.argmax(self._agg_obs))

    @property
    def best_observation(self) -> np.ndarray:
        n = int(self.gp.n)
        return np.asarray(self.gp.y[:n])[self.best_index]

    @property
    def best_sample(self) -> np.ndarray:
        n = int(self.gp.n)
        return np.asarray(self.gp.x[:n])[self.best_index]

    @property
    def best_value(self) -> float:
        agg = self._agg_obs
        return float(np.max(agg)) if agg.size else -np.inf


class BOptimizer:
    """The classic single-objective BO loop (limbo BOptimizer)."""

    def __init__(self,
                 kernel=None,
                 mean=None,
                 acqui=None,
                 acqui_optimizer=None,
                 init=None,
                 stop: Sequence = None,
                 stats: Sequence = (),
                 hp_opt=None,
                 hp_period: int = -1,
                 bounded: bool = True,
                 stats_enabled: bool = True,
                 res_base_dir: Optional[str] = None,
                 use_query_cache: bool = False,
                 cache_fast_update: bool = False,
                 cache_refresh_period: int = 64,
                 cache_query_dtype=None,
                 cache_defer_m: int = 32,
                 cache_lite: bool = False,
                 max_model_points: Optional[int] = None,
                 model_type: str = "gp",
                 model_options: Optional[dict] = None,
                 model_refit_period: int = 1,
                 dtype=jnp.float32):
        self.kernel = kernel
        self.mean = mean
        self.acqui = acqui if acqui is not None else UCB()
        self.acqui_optimizer = (acqui_optimizer if acqui_optimizer is not None
                                else default_acqui_optimizer())
        self.init = (init if init is not None
                     else RandomSampling(10, bounded=bounded))
        self.stop = tuple(stop) if stop is not None else (MaxIterations(190),)
        self.stats = tuple(stats)
        self.hp_opt = hp_opt
        self.hp_period = hp_period
        self.bounded = bounded
        self.stats_enabled = stats_enabled
        # matmul-only large-n path: maintain K^{-1} by O(n^2) block updates
        # and query through it (no triangular solves on the hot loop)
        self.use_query_cache = use_query_cache
        # cached-add mode: False = solve-based u (most accurate, 2 solves),
        # "deferred" = linv pivots with the N x N Kinv/mirror rewrite
        # amortized to one GEMM per cache_defer_m appends (fastest; exact
        # same math as linv; constant-type means only), "linv" = matvec-only
        # via a maintained inverse Cholesky factor (solve-grade accuracy),
        # "refined" = matvec-only with one iterative-refinement step against
        # a maintained K mirror, True = raw matmul u (fastest per-pass;
        # compounding drift — pair with a small refresh period).
        # See gp.add_sample_cached + docs/BENCHMARKS.md.
        self.cache_fast_update = cache_fast_update
        self.cache_defer_m = cache_defer_m
        # lite cache: drop the f32 K^{-1} master; the (bf16) query mirror is
        # the only N x N buffer and flushes update it in place — a third
        # less HBM per capacity (the n>24k single-chip enabler).  Requires
        # the deferred update mode.
        if cache_lite and cache_fast_update != "deferred":
            raise ValueError("cache_lite requires cache_fast_update="
                             "'deferred' (lite flushes apply the deferred "
                             "pivot corrections to the mirror)")
        self.cache_lite = cache_lite
        # rebuild K^{-1} exactly every N cached adds (bounds f32 drift of
        # the O(n^2) block updates over long horizons)
        self.cache_refresh_period = cache_refresh_period
        # low-precision query mirror (e.g. jnp.bfloat16): halves the HBM
        # read of the n x n Kinv per acquisition query and runs the
        # variance matmul at MXU bf16 rate; the f32 master still drives
        # all updates (see gp.QueryCache.Kinv_q).
        self.cache_query_dtype = cache_query_dtype
        # ≙ limbo modelfun<SparsifiedGP>: cap the model's dataset by
        # density-based sparsification (model/sparsified_gp.hpp)
        self.max_model_points = max_model_points
        # ≙ limbo modelfun<...> genericity (bo_base.hpp:113): the BO loop
        # accepts any model family.  "gp" (exact, rank-1 updates), "spgp"
        # (FITC pseudo-inputs, experimental/model/spgp.hpp) or "iterative"
        # (CG, no Cholesky — the very-large-n option).
        if model_type not in ("gp", "spgp", "iterative"):
            raise ValueError(f"unknown model_type {model_type!r}")
        # exact-GP-only features: the K^{-1} query cache and the hp-opt
        # strategies operate on the Cholesky state (L/alpha) that SPGP /
        # IterativeGP do not carry — fail at construction, not mid-run
        if model_type != "gp":
            if use_query_cache:
                raise ValueError(
                    f"use_query_cache requires model_type='gp' "
                    f"(got {model_type!r}: no Cholesky factor to cache)")
            # hp-opt is model-family-specific: the GP strategies
            # (models/hp_opt.py) rebuild the Cholesky state that SPGP /
            # IterativeGP do not carry.  SPGP has its own joint
            # pseudo-input+hyperparameter optimizer (SPGPHpOpt) that the
            # loop fires through the same hp_period cadence.
            if hp_opt is not None:
                from limbo_tpu.models.spgp import SPGPHpOpt
                if not (model_type == "spgp"
                        and isinstance(hp_opt, SPGPHpOpt)):
                    raise ValueError(
                        f"hp_opt for model_type={model_type!r} must be a "
                        f"models.spgp.SPGPHpOpt (spgp only); the GP "
                        f"strategies in models/hp_opt.py need the exact-GP "
                        f"Cholesky state")
            elif hp_period > 0:
                raise ValueError(
                    f"hp_period > 0 without hp_opt does nothing for "
                    f"model_type={model_type!r}")
            if max_model_points is not None:
                raise ValueError(
                    "max_model_points (SparsifiedGP) requires model_type='gp'")
        self.model_type = model_type
        self.model_options = dict(model_options or {})
        # cadence of full re-solves for models without incremental updates
        self.model_refit_period = model_refit_period
        self.dtype = dtype
        self.res_dir = (make_res_dir(res_base_dir)
                        if (stats_enabled and res_base_dir is not None
                            and stats) else None)
        self._propose_jit = None
        self._add_jit = None
        self._hp_jit = None

    # -- defaults (GPBasic parity: Matern-5/2 + DataMean, model/gp.hpp:637) --

    def _make_gp(self, dim_in: int, dim_out: int, capacity: int) -> gp_mod.GP:
        kernel = (self.kernel if self.kernel is not None
                  else MaternFiveHalves.create(dtype=self.dtype))
        mean = (self.mean if self.mean is not None
                else DataMean.create(dim_out=dim_out, dtype=self.dtype))
        return gp_mod.empty(kernel, mean, dim_in, dim_out, capacity,
                            dtype=self.dtype)

    def _make_model(self, dim_in: int, dim_out: int, capacity: int, key):
        if self.model_type == "gp":
            return self._make_gp(dim_in, dim_out, capacity)
        kernel = (self.kernel if self.kernel is not None
                  else MaternFiveHalves.create(dtype=self.dtype))
        mean = (self.mean if self.mean is not None
                else DataMean.create(dim_out=dim_out, dtype=self.dtype))
        if self.model_type == "spgp":
            from limbo_tpu.models import spgp

            m = self.model_options.get("m", 16)
            return spgp.empty(kernel, mean, dim_in, dim_out, m=m,
                              capacity=capacity, dtype=self.dtype, key=key)
        from limbo_tpu.models import iterative

        return iterative.empty(
            kernel, mean, dim_in, dim_out, capacity=capacity,
            dtype=self.dtype,
            block=self.model_options.get("block", 2048),
            cg_tol=self.model_options.get("cg_tol", 1e-5),
            cg_maxiter=self.model_options.get("cg_maxiter", 256))

    def _refit_model(self, model):
        """Full re-solve for models with stale caches (IterativeGP's CG
        alpha).  SPGP/exact-GP are consistent after add_sample."""
        if self.model_type == "iterative":
            from limbo_tpu.models import iterative

            if getattr(self, "_refit_jit", None) is None:
                self._refit_jit = jax.jit(iterative.refit)
            return self._refit_jit(model)
        return model

    def _max_iterations(self) -> int:
        for s in self.stop:
            if isinstance(s, MaxIterations):
                return s.iterations
        return 190

    def _capacity(self, extra: int = 0) -> int:
        """Padded buffer size, bucketed so near-miss configurations share
        compiled programs (capacity is baked into every XLA program shape;
        64-granularity made 190- vs 200-iteration suites compile twice for
        nothing).  Buckets: multiples of 256 up to 2048, then 1024."""
        need = self.init.count + self._max_iterations() + extra + 1
        if need <= 2048:
            return max(256, -(-need // 256) * 256)
        return -(-need // 1024) * 1024

    # -- jitted pieces -------------------------------------------------------

    def _build_propose(self):
        acqui, agg_opt, bounded = self.acqui, self.acqui_optimizer, self.bounded
        aggregator_cfg = getattr(self, "_aggregator", FirstElem)

        @jax.jit
        def propose(gp, key, iteration):
            aggregator = aggregator_cfg
            f_max = (acqui.best_predicted(gp, aggregator)
                     if isinstance(acqui, EI) else None)

            def acq_fn(x):
                if isinstance(acqui, EI):
                    return acqui(gp, x, aggregator, iteration, f_max=f_max)
                return acqui(gp, x, aggregator, iteration)

            start = jnp.full((gp.dim_in,), 0.5, dtype=gp.x.dtype)
            res = agg_opt(acq_fn, start, key, bounded)
            from limbo_tpu.models.dispatch import query_any

            mu_pred, _ = query_any(gp, res.x[None, :])
            return res.x, res.value, mu_pred[0]

        return propose

    def _build_hp(self):
        hp_opt = self.hp_opt

        @jax.jit
        def run_hp(gp, key):
            return hp_opt(gp, key)

        return run_hp

    # -- the host-driven loop ------------------------------------------------

    def optimize(self, f: Callable, dim_in: int, dim_out: int = 1,
                 aggregator: Callable = FirstElem, reset: bool = True,
                 key: Optional[jax.Array] = None,
                 state: Optional[BOState] = None) -> BOState:
        """Run BO with a host-evaluated objective.

        f: (d,) numpy/jax array -> (p,) array-like observation.
        reset=False resumes from `state` keeping samples and total_iterations
        (limbo bo_base.hpp:249-260, boptimizer.hpp:139-141).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        if getattr(self, "_built_aggregator", None) is not aggregator:
            self._propose_jit = None          # rebuild for a new aggregator
        self._aggregator = aggregator
        self._built_aggregator = aggregator

        if reset or state is None:
            capacity = self._capacity()
            key, k_model = jax.random.split(key)
            gp = self._make_model(dim_in, dim_out, capacity, k_model)
            state = BOState(gp=gp, key=key, aggregator=aggregator)
            # ---- init design (bo_base.hpp:249, init/*.hpp) ----
            key, k_init = jax.random.split(key)
            X0 = self.init(k_init, dim_in, dtype=self.dtype)
            for i in range(X0.shape[0]):
                x = np.asarray(X0[i])
                y = self._eval_checked(f, x)
                state.gp = self._add(state.gp, X0[i], jnp.asarray(y, dtype=self.dtype))
            state.gp = self._refit_model(state.gp)
        else:
            state.iteration = 0  # current-run counter resets; total continues
            need = self._capacity(extra=int(state.gp.n))
            if need > state.gp.capacity:
                if self.model_type != "gp":
                    raise NotImplementedError(
                        f"resume past capacity needs gp_mod.grow, which is "
                        f"exact-GP only (model_type={self.model_type!r}); "
                        f"restart with a larger MaxIterations budget instead")
                state.gp = gp_mod.grow(state.gp, need)

        if self._propose_jit is None:
            self._propose_jit = self._build_propose()
        if self.hp_opt is not None and self._hp_jit is None:
            self._hp_jit = self._build_hp()

        if self.use_query_cache and state.cache is None:
            state.cache = self._build_cache(state.gp)

        state.key = key
        while not self._stopped(state):
            state.key, k_prop, k_hp = jax.random.split(state.key, 3)
            model = (gp_mod.CachedGPView(state.gp, state.cache)
                     if self.use_query_cache else state.gp)
            x_next, acq_val, mu_pred = self._propose_jit(
                model, k_prop, jnp.asarray(state.total_iterations))
            y = self._eval_checked(f, np.asarray(x_next))
            state.last_acqui_value = float(acq_val)
            state.last_prediction = np.asarray(mu_pred)
            self._ingest(state, x_next, y, k_hp)
        return state

    def _ingest(self, state: BOState, x_next, y, k_hp) -> None:
        """Add one (x, y) observation and do all per-iteration bookkeeping:
        model/cache update by mode, counters, hp-opt cadence, stats."""
        if self.model_type != "gp":
            state.gp = self._add(state.gp, x_next,
                                 jnp.asarray(y, dtype=self.dtype))
            if (self.model_refit_period > 0 and
                    (state.total_iterations + 1)
                    % self.model_refit_period == 0):
                state.gp = self._refit_model(state.gp)
        elif self.use_query_cache:
            state.gp, state.cache = self._add_cached(
                state.gp, state.cache, x_next,
                jnp.asarray(y, dtype=self.dtype))
            if (self.cache_refresh_period > 0 and
                    (state.total_iterations + 1)
                    % self.cache_refresh_period == 0):
                state.gp = gp_mod.recompute(state.gp)
                state.cache = self._build_cache(state.gp)
        elif self.max_model_points is not None:
            state.gp = self._add_sparse(state.gp, x_next,
                                        jnp.asarray(y, dtype=self.dtype))
        else:
            state.gp = self._add(state.gp, x_next,
                                 jnp.asarray(y, dtype=self.dtype))
        state.last_sample = np.asarray(x_next)
        state.last_observation = np.asarray(y)
        state.iteration += 1
        state.total_iterations += 1
        # periodic hyperparameter re-optimization (boptimizer.hpp:163-165)
        if (self.hp_opt is not None and self.hp_period > 0
                and state.total_iterations % self.hp_period == 0):
            if self._hp_jit is None:
                self._hp_jit = self._build_hp()
            state.gp = self._hp_jit(state.gp, k_hp)
            if self.use_query_cache:
                state.cache = self._build_cache(state.gp)
        self._update_stats(state)

    # -- ask/tell (hardware-in-the-loop flow; no reference equivalent) -------

    def init_state(self, dim_in: int, dim_out: int = 1,
                   aggregator: Callable = FirstElem,
                   key: Optional[jax.Array] = None) -> BOState:
        """Start an ask/tell optimization: build the empty model and queue
        the init design for the first `self.init.count` ask() calls.

        The ask/tell flow serves objectives that cannot be wrapped in a
        callable (robot episodes, lab experiments, human raters) — the
        primary audience of the reference, which forces them through the
        eval functor (bo_base.hpp:232).  Evaluate ask()'s point however and
        wherever you like, then feed it back with tell().
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        self._aggregator = aggregator
        self._built_aggregator = aggregator
        key, k_model = jax.random.split(key)
        gp = self._make_model(dim_in, dim_out, self._capacity(), k_model)
        state = BOState(gp=gp, key=key, aggregator=aggregator)
        state.key, k_init = jax.random.split(state.key)
        X0 = self.init(k_init, dim_in, dtype=self.dtype)
        state.pending_init = [np.asarray(X0[i]) for i in range(X0.shape[0])]
        return state

    def ask(self, state: BOState) -> np.ndarray:
        """Next point to evaluate: the unevaluated init design first, then
        the acquisition maximizer over the current model."""
        if state.pending_init:
            return np.asarray(state.pending_init[0])
        if self._propose_jit is None:
            self._propose_jit = self._build_propose()
        if self.use_query_cache and state.cache is None:
            state.cache = self._build_cache(state.gp)
        state.key, k_prop = jax.random.split(state.key)
        model = (gp_mod.CachedGPView(state.gp, state.cache)
                 if self.use_query_cache else state.gp)
        x_next, acq_val, mu_pred = self._propose_jit(
            model, k_prop, jnp.asarray(state.total_iterations))
        state.last_acqui_value = float(acq_val)
        state.last_prediction = np.asarray(mu_pred)
        return np.asarray(x_next)

    def tell(self, state: BOState, x, y) -> BOState:
        """Feed the observation y = f(x) back (NaN/Inf raises
        EvaluationError, bo_base.hpp:232-238).  Init-design points don't
        count as iterations (matching optimize()); acquisition points run
        the full per-iteration bookkeeping incl. hp-opt cadence and stats."""
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        x = jnp.asarray(x, dtype=self.dtype)
        if state.pending_init:
            # match optimize()'s init phase: plain adds, no iteration count
            state.pending_init.pop(0)
            state.gp = self._add(state.gp, x,
                                 jnp.asarray(y, dtype=self.dtype))
            if not state.pending_init:
                state.gp = self._refit_model(state.gp)
                if self.use_query_cache:
                    state.cache = self._build_cache(state.gp)
            return state
        state.key, k_hp = jax.random.split(state.key)
        if self.use_query_cache and state.cache is None:
            state.cache = self._build_cache(state.gp)
        self._ingest(state, x, y, k_hp)
        return state

    def _add(self, gp, x, y):
        if self._add_jit is None:
            from limbo_tpu.models.dispatch import add_sample_any

            self._add_jit = jax.jit(add_sample_any)
        return self._add_jit(gp, x, y)

    def _build_cache(self, gp):
        # keyed on the mode: flipping cache_fast_update between optimize()
        # calls must not reuse a jit traced for the old mode (stale
        # with_K/with_Linv would silently run the wrong update path)
        key = (self.cache_fast_update, self.cache_query_dtype,
               self.cache_defer_m, self.cache_lite)
        if getattr(self, "_cache_jit_key", None) != key:
            with_K = self.cache_fast_update == "refined"
            with_Linv = self.cache_fast_update in ("linv", "deferred")
            defer_m = (self.cache_defer_m
                       if self.cache_fast_update == "deferred" else 0)
            self._cache_jit = jax.jit(
                partial(gp_mod.QueryCache.build, with_K=with_K,
                        with_Linv=with_Linv,
                        qdtype=self.cache_query_dtype,
                        defer_m=defer_m, lite=self.cache_lite))
            self._cache_jit_key = key
        return self._cache_jit(gp)

    def _add_cached(self, gp, cache, x, y):
        fast = self.cache_fast_update
        if getattr(self, "_add_cached_jit_key", "?") != fast:
            # donate gp+cache: K^{-1}/L update in place (no 2x n^2 copies)
            self._add_cached_jit = jax.jit(
                partial(gp_mod.add_sample_cached, fast_update=fast),
                donate_argnums=(0, 1))
            self._add_cached_jit_key = fast
        return self._add_cached_jit(gp, cache, x, y)

    def _add_sparse(self, gp, x, y):
        from limbo_tpu.models import sparse_gp

        if getattr(self, "_add_sparse_jit", None) is None:
            mp = self.max_model_points

            @jax.jit
            def add(gp, x, y):
                sgp = sparse_gp.SparsifiedGP(gp=gp, max_points=mp)
                return sparse_gp.add_sample(sgp, x, y).gp

            self._add_sparse_jit = add
        return self._add_sparse_jit(gp, x, y)

    def _eval_checked(self, f, x: np.ndarray) -> np.ndarray:
        y = np.atleast_1d(np.asarray(f(x), dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        return y

    def _stopped(self, state: BOState) -> bool:
        # OR-fold like limbo's chained criteria (stop/chain_criteria.hpp:65)
        return any(bool(s(state)) for s in self.stop)

    def _update_stats(self, state: BOState):
        if not self.stats_enabled:
            return
        for stat in self.stats:
            stat(self, state)

    # -- batch proposals (q-EI; no reference counterpart) --------------------

    def optimize_batch(self, f: Callable, dim_in: int, q: int = 2,
                       dim_out: int = 1, aggregator: Callable = FirstElem,
                       key: Optional[jax.Array] = None,
                       qei=None, restarts: int = 16,
                       steps: int = 30) -> BOState:
        """Batch BO: each round proposes a joint q-point batch by maximizing
        Monte-Carlo q-EI (acqui/qei.py) and evaluates all q points.

        Stop criteria count ROUNDS (a MaxIterations(30) stop means 30
        batches = 30*q evaluations).  Covers the BASELINE "batch BO: q-EI
        candidate batches" configuration; the reference proposes one point
        per iteration only.
        """
        from limbo_tpu.acqui.qei import propose_batch

        key = key if key is not None else jax.random.PRNGKey(0)
        capacity = self._capacity(extra=(q - 1) * self._max_iterations())
        key, k_model = jax.random.split(key)
        gp = self._make_model(dim_in, dim_out, capacity, k_model)
        state = BOState(gp=gp, key=key, aggregator=aggregator)
        key, k_init = jax.random.split(key)
        X0 = self.init(k_init, dim_in, dtype=self.dtype)
        for i in range(X0.shape[0]):
            y = self._eval_checked(f, np.asarray(X0[i]))
            state.gp = self._add(state.gp, X0[i],
                                 jnp.asarray(y, dtype=self.dtype))
        state.gp = self._refit_model(state.gp)

        if getattr(self, "_propose_batch_jit", None) is None:
            self._propose_batch_jit = jax.jit(
                partial(propose_batch, q=q, qei=qei, restarts=restarts,
                        steps=steps, aggregator=aggregator))
        while not self._stopped(state):
            state.key, k_prop = jax.random.split(state.key)
            Xb, val = self._propose_batch_jit(state.gp, key=k_prop)
            for j in range(q):
                y = self._eval_checked(f, np.asarray(Xb[j]))
                state.gp = self._add(state.gp, Xb[j],
                                     jnp.asarray(y, dtype=self.dtype))
            state.gp = self._refit_model(state.gp)
            state.last_sample = np.asarray(Xb)
            state.last_acqui_value = float(val)
            state.iteration += 1
            state.total_iterations += 1
            self._update_stats(state)
        return state

    # -- the fully-jitted loop ----------------------------------------------

    def optimize_jit(self, f: Callable, dim_in: int, dim_out: int = 1,
                     aggregator: Callable = FirstElem,
                     key: Optional[jax.Array] = None,
                     n_iterations: Optional[int] = None) -> Tuple[BOState, dict]:
        """Run the ENTIRE BO loop as one lax.scan on device.

        f must be a JAX-traceable (d,) -> (p,) function (e.g. a synthetic
        benchmark or a simulator jitted in JAX).  Returns the final state and
        a history dict with per-iteration samples/observations/best values.
        """
        if self.model_type != "gp":
            raise NotImplementedError(
                f"optimize_jit runs the exact-GP scan loop only; "
                f"model_type={self.model_type!r} is supported by optimize()")
        key = key if key is not None else jax.random.PRNGKey(0)
        iters = (n_iterations if n_iterations is not None
                 else self._max_iterations())
        capacity = self._capacity()
        gp0 = self._make_gp(dim_in, dim_out, capacity)
        acqui = self.acqui
        agg_opt = self.acqui_optimizer
        bounded = self.bounded
        hp_opt, hp_period = self.hp_opt, self.hp_period
        dtype = self.dtype
        # non-MaxIterations criteria become a freeze mask inside the scan
        # (MaxIterations is the static trip count); each must be jit-capable
        # via device_stop (stop/chain_criteria.hpp:65 OR-fold parity).
        mask_criteria = tuple(s for s in self.stop
                              if not isinstance(s, MaxIterations))
        for s in mask_criteria:
            if not hasattr(s, "device_stop"):
                raise TypeError(
                    f"stop criterion {type(s).__name__} lacks device_stop(); "
                    "it cannot run inside optimize_jit — use optimize()")

        init_design = self.init

        @partial(jax.jit, static_argnums=())
        def run(key):
            k_init, k_loop = jax.random.split(key)
            X0 = init_design(k_init, dim_in, dtype=dtype)
            Y0 = jax.vmap(f)(X0)                      # batched init evals

            def seed(gp, xy):
                x, y = xy
                return gp_mod.add_sample(gp, x, y), None

            gp, _ = jax.lax.scan(seed, gp0, (X0, Y0.astype(dtype)))
            use_cache = self.use_query_cache
            with_K = self.cache_fast_update == "refined"
            with_Linv = self.cache_fast_update in ("linv", "deferred")
            defer_m = (self.cache_defer_m
                       if self.cache_fast_update == "deferred" else 0)
            cache = (gp_mod.QueryCache.build(gp, with_K=with_K,
                                             with_Linv=with_Linv,
                                             qdtype=self.cache_query_dtype,
                                             defer_m=defer_m,
                                             lite=self.cache_lite)
                     if use_cache
                     else gp_mod.QueryCache(Kinv=jnp.zeros((1, 1), dtype)))
            best0 = jnp.max(jnp.where(
                jnp.arange(capacity) < gp.n,
                jax.vmap(aggregator)(gp.y), -jnp.inf)).astype(dtype)

            def live_step(gp, cache, key, it, best):
                key, k_prop, k_hp, k_stop = jax.random.split(key, 4)
                model = gp_mod.CachedGPView(gp, cache) if use_cache else gp
                f_max = (acqui.best_predicted(model, aggregator)
                         if isinstance(acqui, EI) else None)

                def acq_fn(x):
                    if isinstance(acqui, EI):
                        return acqui(model, x, aggregator, it, f_max=f_max)
                    return acqui(model, x, aggregator, it)

                start = jnp.full((dim_in,), 0.5, dtype=dtype)
                res = agg_opt(acq_fn, start, k_prop, bounded)
                y = f(res.x).astype(dtype)
                if use_cache:
                    gp, cache = gp_mod.add_sample_cached(
                        gp, cache, res.x, y,
                        fast_update=self.cache_fast_update)
                else:
                    gp = gp_mod.add_sample(gp, res.x, y)
                if hp_opt is not None and hp_period > 0:
                    gp = jax.lax.cond((it + 1) % hp_period == 0,
                                      lambda g: hp_opt(g, k_hp),
                                      lambda g: g, gp)
                    if use_cache:
                        cache = jax.lax.cond(
                            (it + 1) % hp_period == 0,
                            lambda g: gp_mod.QueryCache.build(
                                g, with_K=with_K, with_Linv=with_Linv,
                                qdtype=self.cache_query_dtype,
                                defer_m=defer_m, lite=self.cache_lite),
                            lambda g: cache, gp)
                agg_y = aggregator(y)
                best = jnp.maximum(best, agg_y)
                stop_now = jnp.asarray(False)
                for s in mask_criteria:
                    stop_now = jnp.logical_or(
                        stop_now, s.device_stop(gp, best, k_stop, aggregator))
                return (gp, cache, key, best, stop_now), (res.x, y, agg_y)

            def step(carry, it):
                gp, cache, key, best, stopped = carry
                nan_x = jnp.full((dim_in,), jnp.nan, dtype=dtype)
                nan_y = jnp.full((dim_out,), jnp.nan, dtype=dtype)

                def frozen(_):
                    # emit NaN sample rows + -inf agg so cummax/best hold
                    return ((gp, cache, key, best, stopped),
                            (nan_x, nan_y, jnp.asarray(-jnp.inf, dtype)))

                def live(_):
                    (gp2, cache2, key2, best2, stop_now), out = live_step(
                        gp, cache, key, it, best)
                    return (gp2, cache2, key2, best2,
                            jnp.logical_or(stopped, stop_now)), out

                return jax.lax.cond(stopped, frozen, live, None)

            (gp, _, _, _, _), (xs, ys, aggs) = jax.lax.scan(
                step, (gp, cache, k_loop, best0, jnp.asarray(False)),
                jnp.arange(iters))
            best = jax.lax.cummax(jnp.maximum(aggs, best0))
            n_eff = jnp.sum(jnp.isfinite(aggs))
            return gp, xs, ys, best, n_eff

        gp, xs, ys, best, n_eff = run(key)
        state = BOState(gp=gp, key=key, iteration=iters,
                        total_iterations=iters, aggregator=aggregator)
        history = {"samples": xs, "observations": ys, "best": best,
                   "effective_iterations": n_eff}
        return state, history
