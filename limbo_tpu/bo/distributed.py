"""Beyond-one-chip BO with the BOptimizer surface.

`DistributedBOptimizer(mesh, ...)` runs the classic loop
(init design -> fit -> {propose, evaluate, append}* with stats/stop and
ask/tell) with the model living across a `jax.sharding.Mesh`:

  * fit: row-sharded blocked Cholesky (`parallel.sharded_chol.sharded_fit`)
  * query cache: column-sharded K^{-1} panels solved from the sharded
    factor (`parallel.sharded_big.sharded_cache_from_fit`)
  * per-iteration: column-sharded acquisition + distributed-solve append
    (`parallel.sharded_big.make_big_propose` / `make_big_add`)

so no N x N buffer ever materializes on one device — an 8-device slice
holds n ~ 100k where one chip tops out near 32k (docs/BENCHMARKS.md).

The reference has no counterpart (limbo is single-process shared-memory;
SURVEY.md section 2.4 makes the distributed comm backend the new
first-class component).  API parity with BOptimizer: optimize(f, ...),
init_state/ask/tell, stats writers, chained stop criteria, NaN guards.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.acqui.acqui import UCB, FirstElem
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.optimizer import (BOState, EvaluationError,
                                    default_acqui_optimizer)
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.kernels import MaternFiveHalves
from limbo_tpu.means import DataMean
from limbo_tpu.utils.sysinfo import make_res_dir


class DistributedBOptimizer:
    """The classic BO loop with the GP sharded over a device mesh.

    Same slots as BOptimizer (kernel/mean/acqui/acqui_optimizer/init/stop/
    stats); `block` is the sharded-Cholesky block size and `defer_m` the
    deferred-append flush period (see parallel/sharded_big.py).  `qdtype`
    (e.g. jnp.bfloat16) stores the K^{-1} query panels in low precision —
    halves the per-acquisition HBM read at bf16-quantization accuracy.
    """

    def __init__(self, mesh, kernel=None, mean=None, acqui=None,
                 acqui_optimizer=None, init=None, stop: Sequence = None,
                 stats: Sequence = (), stats_enabled: bool = True,
                 res_base_dir: Optional[str] = None, block: int = 256,
                 defer_m: int = 64, qdtype=None, bounded: bool = True,
                 axis: str = "rows", dtype=jnp.float32):
        self.mesh = mesh
        self.kernel = kernel
        self.mean = mean
        self.acqui = acqui if acqui is not None else UCB()
        self.acqui_optimizer = (acqui_optimizer if acqui_optimizer is not None
                                else default_acqui_optimizer())
        self.init = (init if init is not None
                     else RandomSampling(10, bounded=bounded))
        self.stop = tuple(stop) if stop is not None else (MaxIterations(190),)
        self.stats = tuple(stats)
        self.stats_enabled = stats_enabled
        self.block = block
        self.defer_m = defer_m
        self.qdtype = qdtype
        self.bounded = bounded
        self.axis = axis
        self.dtype = dtype
        self.res_dir = (make_res_dir(res_base_dir)
                        if (stats_enabled and res_base_dir is not None
                            and stats) else None)
        self._propose_jit = None
        self._add_jit = None

    # -- geometry ------------------------------------------------------------

    @property
    def _n_dev(self) -> int:
        return self.mesh.shape[self.axis]

    def _capacity(self, need: int) -> int:
        """Padded size: a multiple of n_devices * block covering `need`."""
        unit = self._n_dev * self.block
        return max(unit, -(-need // unit) * unit)

    def _slots(self, dim_out: int):
        kernel = (self.kernel if self.kernel is not None
                  else MaternFiveHalves.create(dtype=self.dtype))
        mean = (self.mean if self.mean is not None
                else DataMean.create(dim_out=dim_out, dtype=self.dtype))
        return kernel, mean

    # -- fit + cache (the once-per-run sharded build) ------------------------

    def _fit_big(self, X: np.ndarray, Y: np.ndarray):
        from limbo_tpu.parallel.sharded_big import sharded_cache_from_fit
        from limbo_tpu.parallel.sharded_chol import sharded_fit

        n, d = X.shape
        p = Y.shape[1]
        kernel, mean = self._slots(p)
        need = n + self._max_iterations() + 1
        cap = self._capacity(need)
        Xp = jnp.zeros((cap, d), self.dtype).at[:n].set(
            jnp.asarray(X, self.dtype))
        Yp = jnp.zeros((cap, p), self.dtype).at[:n].set(
            jnp.asarray(Y, self.dtype))
        sgp = sharded_fit(self.mesh, kernel, mean, Xp, Yp,
                          n=jnp.asarray(n), block=self.block, axis=self.axis)
        return sharded_cache_from_fit(self.mesh, sgp, qdtype=self.qdtype,
                                      defer_m=self.defer_m)

    def _max_iterations(self) -> int:
        for s in self.stop:
            if isinstance(s, MaxIterations):
                return s.iterations
        return 190

    def _build(self):
        from limbo_tpu.parallel.sharded_big import (make_big_add,
                                                    make_big_propose)

        if self._propose_jit is None:
            self._propose_jit = jax.jit(make_big_propose(
                self.mesh, self.acqui, self.acqui_optimizer,
                aggregator=getattr(self, "_aggregator", FirstElem),
                bounded=self.bounded))
            self._add_jit = jax.jit(make_big_add(self.mesh))

    # -- the host-driven loop (optimize in terms of ask/tell) ----------------

    def optimize(self, f: Callable, dim_in: int, dim_out: int = 1,
                 aggregator: Callable = FirstElem,
                 key: Optional[jax.Array] = None) -> BOState:
        state = self.init_state(dim_in, dim_out=dim_out,
                                aggregator=aggregator, key=key)
        while state.pending_init:
            x = self.ask(state)
            self.tell(state, x, self._eval_checked(f, x))
        while not self._stopped(state):
            x = self.ask(state)
            self.tell(state, x, self._eval_checked(f, x))
        return state

    # -- ask/tell ------------------------------------------------------------

    def init_state(self, dim_in: int, dim_out: int = 1,
                   aggregator: Callable = FirstElem,
                   key: Optional[jax.Array] = None) -> BOState:
        key = key if key is not None else jax.random.PRNGKey(0)
        self._aggregator = aggregator
        state = BOState(gp=None, key=key, aggregator=aggregator)
        state.key, k_init = jax.random.split(state.key)
        X0 = self.init(k_init, dim_in, dtype=self.dtype)
        state.pending_init = [np.asarray(X0[i]) for i in range(X0.shape[0])]
        state._init_xy = ([], [])            # accumulated until the fit
        state._dim_out = dim_out
        return state

    def ask(self, state: BOState) -> np.ndarray:
        if state.pending_init:
            return np.asarray(state.pending_init[0])
        self._build()
        state.key, k_prop = jax.random.split(state.key)
        x_next, acq_val = self._propose_jit(
            state.gp, k_prop, jnp.asarray(state.total_iterations))
        state.last_acqui_value = float(acq_val)
        return np.asarray(x_next)

    def tell(self, state: BOState, x, y) -> BOState:
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        if state.pending_init:
            state.pending_init.pop(0)
            state._init_xy[0].append(np.asarray(x))
            state._init_xy[1].append(y)
            if not state.pending_init:
                X = np.stack(state._init_xy[0])
                Y = np.stack(state._init_xy[1]).reshape(len(X), -1)
                state.gp = self._fit_big(X, Y)
            return state
        self._build()
        state.gp = self._add_jit(state.gp, jnp.asarray(x, self.dtype),
                                 jnp.asarray(y, self.dtype))
        state.last_sample = np.asarray(x)
        state.last_observation = np.asarray(y)
        state.iteration += 1
        state.total_iterations += 1
        self._update_stats(state)
        return state

    # -- shared plumbing -----------------------------------------------------

    def _eval_checked(self, f, x: np.ndarray) -> np.ndarray:
        y = np.atleast_1d(np.asarray(f(x), dtype=np.float64))
        if not np.all(np.isfinite(y)):
            raise EvaluationError(f"invalid observation {y} at {x}")
        return y

    def _stopped(self, state: BOState) -> bool:
        return any(bool(s(state)) for s in self.stop)

    def _update_stats(self, state: BOState):
        if not self.stats_enabled:
            return
        for stat in self.stats:
            stat(self, state)
