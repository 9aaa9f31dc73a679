"""Reduced-scope regression benchmark on TPU (artifacts for the repo)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import jax.numpy as jnp
from limbo_tpu.benchmarks.regression_suite import ModelSpec, run_regression_suite
from limbo_tpu.benchmarks.regression_functions import (
    GRAMACY_LEE, STEP, OTL_CIRCUIT, PISTON, PLANAR_I, RASTRIGIN_REG)
import dataclasses

# one dim per function to bound compile count on the tunneled dev chip
fns = [dataclasses.replace(RASTRIGIN_REG, dims=(2,)), GRAMACY_LEE, STEP,
       OTL_CIRCUIT, PISTON, PLANAR_I]
t0 = time.perf_counter()
run_regression_suite(functions=fns,
                     models=[ModelSpec("GP-SE-Full-Rprop", True)],
                     points=(200, 600), nb_reps=3,
                     out_dir="regression_results", dtype=jnp.float32,
                     verbose=True)
print(f"total: {time.perf_counter()-t0:.0f}s", flush=True)
