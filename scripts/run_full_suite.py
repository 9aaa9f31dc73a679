"""Run the FULL reference BO benchmark protocol: all 5 variants x 8
functions x nb_reps (src/benchmarks/wscript:84-95 + bench.cpp:140-262).

Everything runs f32 on device; the hpopt variant's LML objective carries a
dtype-scaled conditioning ridge (KernelLFOpt objective_jitter="auto") in
place of the reference's f64-Eigen headroom — f64 is software-emulated on
TPU and an in-loop f64 objective both faults the tunnel's per-execution
limit and costs ~30s per hp-opt call.

Usage: python scripts/run_full_suite.py [nb_reps] [variant ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax.numpy as jnp

from limbo_tpu.benchmarks.bo_suite import default_variants, run_suite
from limbo_tpu.benchmarks.functions import ALL_FUNCTIONS

nb_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
only = set(sys.argv[2:])
variants = [v for v in default_variants() if not only or v.name in only]

t0 = time.perf_counter()
run_suite(variants, ALL_FUNCTIONS, nb_reps=nb_reps, n_init=10, n_iters=190,
          out_dir="benchmark_results", dtype=jnp.float32, verbose=True)
print(f"total: {time.perf_counter()-t0:.0f}s", flush=True)
