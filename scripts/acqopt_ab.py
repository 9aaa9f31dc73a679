"""A/B the default acquisition optimizer against the CMA-ES variant.

Round-3 verdict: opt_cmaes beat limbo_def on the multimodal half of the
suite (Rastrigin 1.13 vs 3.0 median accuracy).  The reference's default is
NLOpt DIRECT-L-RAND (boptimizer.hpp:120-127) — a *systematic* global
phase; our default's global phase was a 1024-point iid-uniform sweep.

Candidates (equal-ish evaluation budgets, all one batched device program):
  def        sweep-1024 uniform  -> 32 x Rprop-30      (round-3 default)
  halton     sweep-1024 halton   -> 32 x Rprop-30
  halton4k   sweep-4096 halton   -> 32 x Rprop-30
  chain_cma  halton-1024 restarts -> CMA-ES(40x16) polish (Chained)
  cma_first  CMA-ES(80x16) global -> 8 x Rprop-30 local polish

Run on CPU (quality A/B — accuracy medians only; wall time is re-measured
on TPU by the full suite).  Writes benchmark_results/acqopt_ab.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from limbo_tpu.acqui.acqui import UCB
from limbo_tpu.benchmarks.bo_suite import Variant, run_one
from limbo_tpu.benchmarks.functions import ALL_FUNCTIONS
from limbo_tpu.opt.cmaes import Cmaes
from limbo_tpu.opt.compose import Chained, ParallelRepeater, RandomRestarts
from limbo_tpu.opt.gradient import Rprop

FNS = [f for f in ALL_FUNCTIONS if f.name in (
    "Ellipsoid", "Rastrigin", "Hartmann6", "GoldsteinPrice",
    "BraninNormalized", "SixHumpCamel")]

CANDIDATES = {
    "def": RandomRestarts(sub=Rprop(iterations=30), repeats=32,
                          sweep_samples=1024),
    "halton": RandomRestarts(sub=Rprop(iterations=30), repeats=32,
                             sweep_samples=1024, sweep_kind="halton"),
    "halton4k": RandomRestarts(sub=Rprop(iterations=30), repeats=32,
                               sweep_samples=4096, sweep_kind="halton"),
    "chain_cma": Chained(subs=(
        RandomRestarts(sub=Rprop(iterations=30), repeats=32,
                       sweep_samples=1024, sweep_kind="halton"),
        Cmaes(iterations=40, pop_size=16, sigma0=0.15),
    )),
    "cma_first": Chained(subs=(
        Cmaes(iterations=80, pop_size=16),
        ParallelRepeater(sub=Rprop(iterations=30), repeats=8, epsilon=0.05),
    )),
    "cmaes_ref": Cmaes(iterations=80, pop_size=16),   # the variant to beat
}


def main(reps=5, n_iters=190):
    out = {}
    path = "benchmark_results/acqopt_ab.json"
    if os.path.exists(path):
        out = json.load(open(path))
    for cname, opt in CANDIDATES.items():
        for fn in FNS:
            tag = f"{cname}/{fn.name}"
            if tag in out:
                print(f"{tag:32s} cached", flush=True)
                continue
            v = Variant(cname, UCB(alpha=0.125), opt)
            accs = []
            for rep in range(reps):
                key = jax.random.PRNGKey(1000 * rep + 7)
                acc, ms, _ = run_one(v, fn, 10, n_iters, key,
                                     measure_compile=False)
                accs.append(acc)
            out[tag] = {"accuracy": float(np.median(accs)),
                        "accs": [float(a) for a in accs]}
            os.makedirs("benchmark_results", exist_ok=True)
            with open(path, "w") as fh:
                json.dump(out, fh, indent=1)
            print(f"{tag:32s} median={out[tag]['accuracy']:.5f} "
                  f"accs={np.round(accs, 4)}", flush=True)


if __name__ == "__main__":
    main()

# round 2: union candidates (best-of-both via Chained's best-value fold)
CANDIDATES_R2 = {
    "union": __import__("limbo_tpu.opt.compose", fromlist=["Chained"]).Chained(subs=(
        Cmaes(iterations=80, pop_size=16),
        RandomRestarts(sub=Rprop(iterations=30), repeats=32,
                       sweep_samples=1024, sweep_kind="halton"),
    )),
    "cma_strong": Chained(subs=(
        Cmaes(iterations=120, pop_size=24),
        ParallelRepeater(sub=Rprop(iterations=30), repeats=8, epsilon=0.05),
    )),
}
