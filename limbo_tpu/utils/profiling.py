"""Tracing / profiling utilities.

The reference has no in-library tracing (timing is ad hoc std::chrono in
benchmarks, src/benchmarks/limbo/bench.cpp:138-153).  Here:

* `PhaseTimer` — named per-phase wall timers with TPU-safe synchronization
  (a host transfer of a scalar — `block_until_ready` alone does not reliably
  fence on tunneled backends);
* `trace()` — context manager around `jax.profiler.trace` writing a
  TensorBoard-loadable device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def device_sync(x) -> None:
    """Force completion of the computation producing x (host transfer)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf if getattr(leaf, "ndim", 0) == 0
                              else leaf.ravel()[0]))


class PhaseTimer:
    """Accumulating named timers:

        timer = PhaseTimer()
        with timer("fit", sync=gp.L):
            gp = fit(...)
        print(timer.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def summary(self) -> str:
        lines = []
        for phase in sorted(self.totals):
            tot = self.totals[phase]
            cnt = self.counts[phase]
            lines.append(f"{phase:24s} {tot*1e3:10.2f} ms total "
                         f"({cnt} calls, {tot/cnt*1e3:.2f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/limbo_tpu_trace"):
    """Device trace for TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
