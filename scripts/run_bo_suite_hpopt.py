import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import jax.numpy as jnp
from limbo_tpu.benchmarks.bo_suite import Variant, run_suite
from limbo_tpu.benchmarks.functions import (GOLDSTEIN_PRICE, HARTMANN6,
                                            RASTRIGIN, SIX_HUMP_CAMEL)
from limbo_tpu.acqui import UCB
from limbo_tpu.bo.optimizer import default_acqui_optimizer

v = Variant("limbo_def_hpopt", UCB(alpha=0.125), default_acqui_optimizer(),
            hp_opt=True, hp_period=50)
t0 = time.perf_counter()
run_suite([v], [GOLDSTEIN_PRICE, SIX_HUMP_CAMEL, HARTMANN6, RASTRIGIN],
          nb_reps=10, n_init=10, n_iters=190,
          out_dir="benchmark_results", dtype=jnp.float32, verbose=True)
print(f"total: {time.perf_counter()-t0:.0f}s", flush=True)
