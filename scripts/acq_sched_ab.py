"""Acquisition-schedule quality A/B (the study behind the 64x20 default).

Sequential ascent steps are the acquisition phase's cost on the large-n hot
loop (one K^{-1} mirror read per step; restarts batch nearly free), so a
schedule with fewer sequential steps raises the headline iters/s 1.4-1.5x —
IF BO quality holds.  Outcome (docs/BENCHMARKS.md "why 64x20"): at 30 reps
per function, 64x20 — and 64x15 — are Mann-Whitney-indistinguishable from
the old 32x30 default on every suite function; the round-2 claim that wide
schedules under-converge on Hartmann3/6 was 10-rep bimodal-median noise.
Top-k polish phases and denser sweeps were measured here too and are
dominated (see SCHEDULES below).

Runs the full reference BO protocol (8 functions x LIMBO_AB_REPS reps,
default 30 — 10-rep medians are noise on Hartmann6, see below — UCB
alpha=.125) per schedule; writes benchmark_results/acq_sched[_cpu]/<name>
+ a summary print.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import json
import time

import jax

# LIMBO_AB_CPU=1: run the quality A/B on the host CPU backend (accuracy
# medians are backend-comparable; use when the TPU tunnel is congested).
# Results land in acq_sched_cpu/ so CPU and TPU rows never mix.
_CPU = os.environ.get("LIMBO_AB_CPU", "") == "1"
if _CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from limbo_tpu.acqui import UCB
from limbo_tpu.benchmarks.bo_suite import Variant, run_suite
from limbo_tpu.benchmarks.functions import ALL_FUNCTIONS
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop

SCHEDULES = {
    # name -> (repeats, steps, polish_k, polish_steps[, sweep]); sequential
    # reads = steps + polish_steps + 1 or 2 final-candidate evals.  Since
    # width is a free batch axis per read, a top-k polish phase is dominated
    # by just running every restart deeper (64x20 == 64x12 + top64x8); the
    # polish rows exist to demonstrate that empirically.  Sweep size is also
    # nearly free (the mirror read already happens; extra candidates only
    # add ks-build flops) — the s2048/s4096 rows probe whether denser global
    # coverage closes the multimodal (Rastrigin) gap to the CMA-ES variant.
    "sched_32x30": (32, 30, 0, 0),
    "sched_64x12_p8x8": (64, 12, 8, 8),
    "sched_64x15_p8x10": (64, 15, 8, 10),
    "sched_64x15": (64, 15, 0, 0),
    "sched_64x18": (64, 18, 0, 0),
    "sched_64x20": (64, 20, 0, 0),
    "sched_64x24": (64, 24, 0, 0),
    "sched_128x20": (128, 20, 0, 0),
    "sched_128x24": (128, 24, 0, 0),
    "sched_64x20_s2048": (64, 20, 0, 0, 2048),
    "sched_64x20_s4096": (64, 20, 0, 0, 4096),
    "sched_64x15_s2048": (64, 15, 0, 0, 2048),
}


def main():
    names = sys.argv[1:] or list(SCHEDULES)
    out = {}
    for name in names:
        r, s, pk, ps, *rest = SCHEDULES[name]
        sweep = rest[0] if rest else 1024
        opt = RandomRestarts(sub=Rprop(iterations=s), repeats=r,
                             sweep_samples=sweep, polish_k=pk, polish_steps=ps)
        v = Variant(name, UCB(alpha=0.125), opt)
        t0 = time.perf_counter()
        out_dir = ("benchmark_results/acq_sched_cpu" if _CPU
                   else "benchmark_results/acq_sched")
        # 10-rep medians are bimodal noise on Hartmann6 (reps either find
        # the good basin ~2e-3 or stall ~0.2; the median flips with 1-2
        # reps) — schedule ranking needs 30+.  Resume logic reuses
        # already-recorded reps when nb_reps grows.
        nb_reps = int(os.environ.get("LIMBO_AB_REPS", "30"))
        summary = run_suite([v], ALL_FUNCTIONS, nb_reps=nb_reps, n_init=10,
                            n_iters=190, out_dir=out_dir,
                            dtype=jnp.float32, verbose=True)
        print(f"{name}: {time.perf_counter()-t0:.0f}s", flush=True)
        out.update(summary)
    print(json.dumps({k: v["accuracy"] for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
