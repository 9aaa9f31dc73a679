"""Run the reference BO benchmark protocol on TPU, one variant."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import sys, time
import jax.numpy as jnp
from limbo_tpu.benchmarks.bo_suite import Variant, run_suite, default_variants
from limbo_tpu.benchmarks.functions import ALL_FUNCTIONS
from limbo_tpu.acqui import UCB
from limbo_tpu.bo.optimizer import default_acqui_optimizer

v = Variant("limbo_def", UCB(alpha=0.125), default_acqui_optimizer())
t0 = time.perf_counter()
summary = run_suite([v], ALL_FUNCTIONS, nb_reps=10, n_init=10, n_iters=190,
                    out_dir="benchmark_results", dtype=jnp.float32,
                    verbose=True)
print(f"total: {time.perf_counter()-t0:.0f}s", flush=True)
