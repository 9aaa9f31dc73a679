"""Full reference regression protocol on TPU:
all 8 functions x n in {50,100,200,400,600} x 10 reps, one dim per function
(the reference sweeps dims too; each (fn, dim, n) is its own compiled
program, so dims are bounded to keep tunnel compile count sane — the n-grid
and function coverage match waf_tools/regression_benchmarks.json), with the
f64 NumPy oracle on 3 reps per config.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import dataclasses
import time

import jax

jax.config.update("jax_enable_x64", True)   # enables the suite's precise
# mode: f64-lifted LML objective + f64 final refit (reference parity —
# limbo runs f64 Eigen end to end; see regression_suite._make_runner)
import jax.numpy as jnp

from limbo_tpu.benchmarks.regression_functions import ALL_REGRESSION
from limbo_tpu.benchmarks.regression_suite import (ModelSpec,
                                                   run_regression_suite)

fns = [dataclasses.replace(f, dims=f.dims[:1]) for f in ALL_REGRESSION]
t0 = time.perf_counter()
run_regression_suite(functions=fns,
                     models=[ModelSpec("GP-SE-Full-Rprop", True),
                             ModelSpec("GP-SE-Rprop", False)],
                     points=(50, 100, 200, 400, 600), nb_reps=10,
                     out_dir="regression_results", dtype=jnp.float32,
                     with_oracle=True, oracle_reps=3, verbose=True)
print(f"total: {time.perf_counter()-t0:.0f}s", flush=True)
