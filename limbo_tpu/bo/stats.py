"""Per-iteration statistics writers (observability layer).

Reference: src/limbo/stat/ — 13 functors, each lazily opening its own .dat
file in the run's result dir and appending one line per iteration, fired by
BoBase::_update_stats (bo_base.hpp:270).  Here stats are host-side callables
`stat(bo, state)` invoked by the driver after each iteration; they receive the
BOptimizer (for res_dir / config) and the current BOState.  File formats
mirror the reference (whitespace-separated, iteration-first) so limbo's plot
tooling conventions carry over.
"""

from __future__ import annotations

import os

import numpy as np


class StatBase:
    """Per-stat log file (stat/stat_base.hpp:72-95).

    Unlike the reference's lazily-opened long-lived ofstream, each line is
    appended open-write-close: stats fire once per host-loop iteration (never
    on the device hot path), so the syscall cost is noise and no file handle
    can leak across runs.
    """

    filename = "stat.dat"

    def _log(self, bo, line: str):
        if not bo.stats_enabled or bo.res_dir is None:
            return
        with open(os.path.join(bo.res_dir, self.filename), "a") as fh:
            fh.write(line + "\n")

    def __call__(self, bo, state):
        raise NotImplementedError


class Samples(StatBase):
    """stat/samples.hpp:56 — last sample per iteration."""

    filename = "samples.dat"

    def __call__(self, bo, state):
        if state.last_sample is None:
            return
        vals = " ".join(f"{v:.10g}" for v in np.ravel(state.last_sample))
        self._log(bo, f"{state.iteration} {vals}")


class Observations(StatBase):
    """stat/observations.hpp:56 — last observation per iteration."""

    filename = "observations.dat"

    def __call__(self, bo, state):
        if state.last_observation is None:
            return
        vals = " ".join(f"{v:.10g}" for v in np.ravel(state.last_observation))
        self._log(bo, f"{state.iteration} {vals}")


class AggregatedObservations(StatBase):
    """stat/aggregated_observations.hpp:58."""

    filename = "aggregated_observations.dat"

    def __call__(self, bo, state):
        if state.last_observation is None:
            return
        agg = float(state.aggregator(np.ravel(state.last_observation)))
        self._log(bo, f"{state.iteration} {agg:.10g}")


class BestSamples(StatBase):
    """stat/best_samples.hpp:56."""

    filename = "best_samples.dat"

    def __call__(self, bo, state):
        vals = " ".join(f"{v:.10g}" for v in np.ravel(state.best_sample))
        self._log(bo, f"{state.iteration} {vals}")


class BestObservations(StatBase):
    """stat/best_observations.hpp:57."""

    filename = "best_observations.dat"

    def __call__(self, bo, state):
        vals = " ".join(f"{v:.10g}" for v in np.ravel(state.best_observation))
        self._log(bo, f"{state.iteration} {vals}")


class BestAggregatedObservations(StatBase):
    """stat/best_aggregated_observations.hpp:58."""

    filename = "best_aggregated_observations.dat"

    def __call__(self, bo, state):
        self._log(bo, f"{state.iteration} {state.best_value:.10g}")


class ConsoleSummary(StatBase):
    """stat/console_summary.hpp:56 — one line to stdout per iteration."""

    def __call__(self, bo, state):
        obs = (np.ravel(state.last_observation)
               if state.last_observation is not None else None)
        print(f"{state.iteration} new point: "
              f"{np.ravel(state.last_sample) if state.last_sample is not None else '-'}"
              f" value: {state.aggregator(obs) if obs is not None else '-'}"
              f" best: {state.best_value:.6g}")


class GPLikelihood(StatBase):
    """stat/gp_likelihood.hpp:58 — model log-likelihood per iteration."""

    filename = "gp_likelihood.dat"

    def __call__(self, bo, state):
        from limbo_tpu.models import gp as gp_mod

        ll = float(gp_mod.log_lik(state.gp))
        self._log(bo, f"{state.iteration} {ll:.10g}")


class GPKernelHParams(StatBase):
    """stat/gp_kernel_hparams.hpp:58 — kernel hyperparameters per iteration."""

    filename = "gp_kernel_hparams.dat"

    def __call__(self, bo, state):
        p = np.asarray(state.gp.kernel.params)
        self._log(bo, f"{state.iteration} " + " ".join(f"{v:.10g}" for v in p))


class GPMeanHParams(StatBase):
    """stat/gp_mean_hparams.hpp:58."""

    filename = "gp_mean_hparams.dat"

    def __call__(self, bo, state):
        p = np.asarray(state.gp.mean.params)
        self._log(bo, f"{state.iteration} " + " ".join(f"{v:.10g}" for v in p))


class GPGrid(StatBase):
    """stat/gp.hpp:58 — dump mu/sigma over a full grid each iteration.

    One file per iteration: gp_<iter>.dat with rows `x... mu... sigma`.
    The whole grid is one batched query (vs limbo's per-point loop).
    """

    filename = "gp.dat"

    def __init__(self, bins: int = 20):
        super().__init__()
        self.bins = bins

    def __call__(self, bo, state):
        if not bo.stats_enabled or bo.res_dir is None:
            return
        import jax.numpy as jnp

        from limbo_tpu.models import gp as gp_mod
        from limbo_tpu.utils.random import grid_points

        X = grid_points(self.bins, state.gp.dim_in, dtype=state.gp.x.dtype)
        mu, var = gp_mod.query(state.gp, X)
        path = os.path.join(bo.res_dir, f"gp_{state.iteration}.dat")
        arr = np.hstack([np.asarray(X), np.asarray(mu),
                         np.sqrt(np.asarray(var))[:, None]])
        np.savetxt(path, arr, fmt="%.10g")


class GPAcquisitions(StatBase):
    """stat/gp_acquisitions.hpp:58 — acquisition value at the chosen point."""

    filename = "gp_acquisitions.dat"

    def __call__(self, bo, state):
        if state.last_acqui_value is None:
            return
        self._log(bo, f"{state.iteration} {float(state.last_acqui_value):.10g}")


class GPPredictionDifferences(StatBase):
    """stat/gp_prediction_differences.hpp:58 — |observation - prediction| of
    the point chosen this iteration."""

    filename = "gp_prediction_differences.dat"

    def __call__(self, bo, state):
        if state.last_prediction is None or state.last_observation is None:
            return
        diff = np.ravel(np.asarray(state.last_observation)) - np.ravel(
            np.asarray(state.last_prediction))
        self._log(bo, f"{state.iteration} "
                  + " ".join(f"{v:.10g}" for v in diff))
