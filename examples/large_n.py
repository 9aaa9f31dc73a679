"""Large-n Bayesian optimization on the cached-K^{-1} fast path.

No reference counterpart: limbo's loop refactorizes O(n^3) per
hyperparameter change and runs O(n^2) triangular-solve queries per
acquisition evaluation (model/gp.hpp:550-626), which is impractical past a
few thousand observations.  This framework's large-n path keeps a K^{-1}
query cache (matmul-only posterior queries at full MXU rate), appends
samples in O(N) with the "deferred" update, and optionally drops the f32
master entirely (lite mode) — 74+ BO iterations/s at n=10,000 on one v5e
chip (docs/BENCHMARKS.md).

Run on anything (CPU works; the sizes here are scaled down so the example
finishes in seconds — raise N for a real workout).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.bo import BOptimizer, MaxIterations, NoInit
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.models import gp as gp_mod

N = 2_000          # pre-existing observations (10_000+ on a TPU)
D = 6
ITERS = 20


def objective(x):
    x = np.asarray(x)
    return np.array([float(np.sin(3.0 * x.sum()) - 0.5 * ((x - 0.4) ** 2).sum())])


def main():
    # a big pre-existing dataset (e.g. logs of a prior campaign)
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(N, D)).astype(np.float32)
    Y = np.array([objective(x) for x in X], dtype=np.float32)

    bo = BOptimizer(
        kernel=SquaredExpARD.create(dim=D),
        init=NoInit(),                       # data comes from `state` below
        stop=(MaxIterations(ITERS),),
        use_query_cache=True,                # matmul-only posterior queries
        cache_fast_update="deferred",        # O(N) appends, rank-m query corr
        cache_query_dtype=jnp.bfloat16,      # halve the HBM read per query
        cache_lite=True,                     # mirror-only: no f32 K^-1 master
        cache_defer_m=128,                   # flush cadence (lite: size it big)
        stats_enabled=False,
    )

    # seed the model with the existing data via ask/tell plumbing: build the
    # state, load the dataset, then let optimize() resume from it
    from limbo_tpu.bo.optimizer import BOState

    capacity = bo._capacity(extra=N)
    gp = gp_mod.fit(bo.kernel, bo._make_gp(D, 1, capacity).mean,
                    jnp.asarray(X), jnp.asarray(Y), capacity=capacity)
    state = BOState(gp=gp, key=jax.random.PRNGKey(1))

    t0 = time.perf_counter()
    state = bo.optimize(objective, dim_in=D, reset=False, state=state)
    dt = time.perf_counter() - t0
    print(f"{ITERS} BO iterations over {int(state.gp.n)} observations "
          f"in {dt:.1f}s ({ITERS / dt:.1f} iters/s incl. compile)")
    print(f"best value {state.best_value:.4f} at {state.best_sample}")


if __name__ == "__main__":
    main()
