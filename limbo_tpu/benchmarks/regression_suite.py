"""GP regression benchmark harness.

Reference protocol: waf_tools/benchmarks.py:103-328 +
waf_tools/regression_benchmarks.json — for each function x dim x
n in {50,100,200,400,600} x replicate: sample n noisy training points
uniformly in the native bounds, fit each model spec (GP-SE-Full-Rprop =
SquaredExpARD + noise optimization + KernelLFOpt(Rprop 50, eps_stop 1e-2);
GP-SE-Rprop = same without noise optimization), then measure MSE on fresh
test points plus learning and query wall times (the reference compares these
against GPy and libGP, docs/benchmark_res_reg.inc:3-5).

TPU-first: the fit + hyperparameter optimization + 10k-point query per
replicate is a single jitted program; replicates vary only the PRNG key.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.benchmarks import oracle as oracle_mod
from limbo_tpu.benchmarks.regression_functions import (
    ALL_REGRESSION,
    RegressionFunction,
)
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import NullMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.models.hp_opt import KernelLFOpt
from limbo_tpu.opt.gradient import Rprop


@dataclass
class ModelSpec:
    name: str
    optimize_noise: bool


DEFAULT_MODELS = [
    ModelSpec("GP-SE-Full-Rprop", optimize_noise=True),
    ModelSpec("GP-SE-Rprop", optimize_noise=False),
]


def _x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _make_runner(fn: RegressionFunction, dim: int, n: int, spec: ModelSpec,
                 n_test: int = 2048, noise_std: float = 0.01,
                 dtype=jnp.float32, precise: Optional[bool] = None,
                 hp_restarts: int = 8, hp_epsilon: float = 3.0):
    bounds = fn.bounds_for_dim(dim)
    lo = jnp.asarray(bounds[:, 0], dtype=dtype)
    hi = jnp.asarray(bounds[:, 1], dtype=dtype)
    f = fn.fn
    # bucket capacities (256-multiples) so the n-grid shares compiled
    # fit/query programs — n in {50,100,200} is ONE program per (dim, model)
    capacity = max(256, -(-n // 256) * 256)

    # fixed-noise spec: pin the SAME noise as the oracle baseline (std
    # 0.01 = variance 1e-4, benchmarks/oracle.py init_log_noise).  limbo's
    # kernel default (0.01 VARIANCE, kernel/kernel.hpp:57) is 100x more
    # smoothing — with no noise optimization that protocol mismatch, not
    # numerics, put the f32 path 10-15x behind the oracle on smooth
    # functions.  The noise-optimizing spec keeps limbo's default as its
    # warm start (hp-opt owns the final value there).
    kern = SquaredExpARD.create(dim=dim, optimize_noise=spec.optimize_noise,
                                noise=(0.01 if spec.optimize_noise
                                       else 1e-4), dtype=dtype)
    # precise mode (default whenever x64 is on — the suite runners enable
    # it): f64-lifted LML objective + f64 final refit.  The reference runs
    # f64 Eigen end to end (model/gp.hpp); measured on GramacyLee d1 n=600,
    # the f32 LML gradient sign-flips stall Rprop at log_ell -2.08 instead
    # of -2.60 (mse 0.082 vs 2.7e-4), so f32-only hp-opt is an accuracy
    # regression vs the reference, not a speed win: at n <= 600 the f64
    # segments are microseconds even under TPU software emulation.  The
    # large-n BO path keeps its scale-aware f32 numerics — precision
    # matters here because the regression protocol is scored on MSE.
    precise = _x64_enabled() if precise is None else (precise
                                                     and _x64_enabled())
    # Two-phase hp-opt:
    #
    # 1. Vmapped f32 multi-start (restarts are a FREE batch axis on TPU —
    #    ≙ wrapping the reference's Rprop in opt::ParallelRepeater).  The
    #    single-start protocol lands in a noise-absorbing local optimum on
    #    fine-structure functions: GramacyLee n=600 learns noise std 0.29
    #    (LML -146, MSE 0.087) while the true optimum sits at noise 0.008
    #    (LML +1741, MSE 1.1e-5) — measured; restart 0 keeps the
    #    reference's exact warm start, so multi-start only improves the
    #    LML.  The f32 objective carries the "auto" conditioning ridge so
    #    any candidate the restarts visit factorizes.
    #
    # 2. (precise mode) ONE f64-objective Rprop warm-started from the f32
    #    winner — reference-parity conditioning exactly at the optimum.
    #    Kept single-start deliberately: the f64-emulated objective under
    #    8 vmapped restarts compiles pathologically on TPU (>40 min for
    #    one program, measured r04) while the single-start f64 polish is
    #    the exact r03 configuration (84 ms learn at n=600).
    # restart winners are ranked by the EXACT f64 LML (no ridge): the
    # ridged f32 surface can prefer a degenerate basin (noise -> 0,
    # ell -> inf; measured on OTLCircuit d6 n=600: pick at f64 LML 19 vs
    # 1716 for the good basin -> MSE 5e-3 vs 2e-5)
    hp = KernelLFOpt(optimizer=Rprop(iterations=50, eps_stop=1e-2),
                     objective_jitter="auto",
                     restarts=hp_restarts, epsilon=hp_epsilon,
                     rank_dtype="float64" if precise else None)
    hp_polish = (KernelLFOpt(optimizer=Rprop(iterations=50, eps_stop=1e-2),
                             objective_dtype="float64")
                 if precise else None)

    # the GP is fit on the unit-cube parameterization (per-dim linear input
    # scaling — the standard normalization; native scales like Piston's
    # P0 ~ 1e5 underflow an ell=1 SE kernel and destabilize hp-opt)
    @jax.jit
    def make_data(key):
        kx, kn, kq = jax.random.split(key, 3)
        U = jax.random.uniform(kx, (n, dim), dtype=dtype)
        X = lo + U * (hi - lo)
        Y = jax.vmap(f)(X)[:, None].astype(dtype)
        Y = Y + noise_std * jax.random.normal(kn, Y.shape, dtype=dtype)
        Uq = jax.random.uniform(kq, (n_test, dim), dtype=dtype)
        Yq = jax.vmap(f)(lo + Uq * (hi - lo))[:, None]
        return U, Y, Uq, Yq

    @jax.jit
    def fit_fn(U, Y, key):
        import math

        gp = gp_mod.fit(kern, NullMean(), U, Y, capacity=capacity)
        gp = hp(gp, key)
        if hp_polish is not None:
            gp = hp_polish(gp, key)
            if spec.optimize_noise:
                # second basin candidate: a ridge-free f64-objective ascent
                # from the TINY-NOISE init (GPy-class convention).  The
                # ridged f32 multi-start cannot see this basin — the ridge
                # (~32*eps*N*var(y) ~ 3e-3) floors the effective noise, so
                # every f32 trajectory absorbs fine structure as noise;
                # measured on OTLCircuit d6 n=600 only this start reaches
                # the LML-1716 basin (MSE 2.3e-5 vs 5e-3).  Winner by
                # exact f64 LML.
                kern_tn = kern.with_params(
                    kern.params.at[-1].set(math.log(0.01)))
                gp_tn = hp_polish(
                    gp_mod.fit(kern_tn, NullMean(), U, Y,
                               capacity=capacity), key)
                U64 = U.astype(jnp.float64)
                Y64 = Y.astype(jnp.float64)

                def lml64(g):
                    return gp_mod.log_marginal_likelihood(
                        _cast_floats(g.kernel, jnp.float64), NullMean(),
                        U64, Y64, g.n)

                better_tn = lml64(gp_tn) > lml64(gp)
                p = jnp.where(better_tn, gp_tn.kernel.params,
                              gp.kernel.params)
                gp = gp.replace(kernel=gp.kernel.with_params(p))
        if precise:
            # final factorization at the learned hyperparameters in f64:
            # the f32 solve error at cond(K) ~ sf^2/noise ~ 1e6 costs two
            # orders of magnitude of MSE on fine-length-scale functions
            gp = gp_mod.fit(_cast_floats(gp.kernel, jnp.float64), NullMean(),
                            U.astype(jnp.float64), Y.astype(jnp.float64),
                            capacity=capacity)
        return gp

    @jax.jit
    def query_fn(gp, Uq, Yq):
        mu, var = gp_mod.query(gp, Uq.astype(gp.x.dtype))
        mse = jnp.mean((mu - Yq.astype(mu.dtype)) ** 2)
        return mse, mu, var

    return make_data, fit_fn, query_fn


def run_regression_suite(functions: Optional[List[RegressionFunction]] = None,
                         models: Optional[List[ModelSpec]] = None,
                         points=(50, 100, 200, 400, 600), nb_reps: int = 10,
                         out_dir: str = "regression_results",
                         dtype=jnp.float32, with_oracle: bool = True,
                         oracle_reps: int = 3, verbose: bool = True) -> Dict:
    """Full reference protocol (waf_tools/regression_benchmarks.json: all
    functions x n in {50..600} x replicates) with a measured f64 NumPy
    oracle baseline (same SE-ARD + Rprop model — benchmarks/oracle.py,
    standing in for the GPy/libGP comparison)."""
    functions = functions if functions is not None else ALL_REGRESSION
    models = models if models is not None else DEFAULT_MODELS
    os.makedirs(out_dir, exist_ok=True)
    summary = {}
    for fn in functions:
        for dim in fn.dims:
            for n in points:
                for spec in models:
                    tag = f"{fn.name}_d{dim}_n{n}_{spec.name}"
                    # resume: recorded replicates are kept and only the
                    # missing rep indices run (rep keys are deterministic,
                    # so a partial run continues exactly — same contract
                    # as bo_suite.run_suite).  Oracle reps persist in a
                    # sidecar <tag>.oracle.dat.
                    dat_path = os.path.join(out_dir, tag + ".dat")
                    ora_path = os.path.join(out_dir, tag + ".oracle.dat")
                    mses, t_learn, t_query = [], [], []
                    o_mses, o_learn, o_query = [], [], []
                    done = 0
                    if os.path.exists(dat_path):
                        rows = np.loadtxt(dat_path, ndmin=2)
                        done = min(rows.shape[0], nb_reps)
                        mses = [float(v) for v in rows[:done, 0]]
                        t_learn = [v / 1e3 for v in rows[:done, 1]]
                        t_query = [v / 1e3 for v in rows[:done, 2]]
                    o_done = 0
                    if os.path.exists(ora_path):
                        orows = np.loadtxt(ora_path, ndmin=2)
                        o_done = min(orows.shape[0], oracle_reps)
                        o_mses = [float(v) for v in orows[:o_done, 0]]
                        o_learn = [v for v in orows[:o_done, 1]]
                        o_query = [v for v in orows[:o_done, 2]]
                    if done >= nb_reps and (not with_oracle
                                            or o_done >= oracle_reps):
                        make_data = fit_fn = query_fn = None
                    else:
                        make_data, fit_fn, query_fn = _make_runner(
                            fn, dim, n, spec, dtype=dtype)
                    compiled = False
                    for rep in range(nb_reps):
                        need_tpu = rep >= done
                        need_oracle = (with_oracle and rep < oracle_reps
                                       and rep >= o_done)
                        if not (need_tpu or need_oracle):
                            continue
                        key = jax.random.PRNGKey(rep * 97 + 13)
                        kd, k1 = jax.random.split(key)
                        U, Y, Uq, Yq = make_data(kd)
                        if need_tpu:
                            if not compiled:         # compile outside timing
                                gp = fit_fn(U, Y, k1)
                                jax.block_until_ready(gp.L)
                                out = query_fn(gp, Uq, Yq)
                                jax.block_until_ready(out[0])
                                compiled = True
                            t0 = time.perf_counter()
                            gp = fit_fn(U, Y, k1)
                            jax.block_until_ready(gp.L)
                            tl = time.perf_counter() - t0
                            t0 = time.perf_counter()
                            mse, mu, var = query_fn(gp, Uq, Yq)
                            jax.block_until_ready(mu)
                            tq = time.perf_counter() - t0
                            t_learn.append(tl)
                            t_query.append(tq)
                            mses.append(float(mse))
                            with open(dat_path, "a") as fh:
                                fh.write(f"{float(mse):.8f} {tl*1e3:.3f} "
                                         f"{tq*1e3:.3f}\n")
                        if need_oracle:
                            om, ol, oq = oracle_mod.fit_and_eval(
                                np.asarray(U), np.asarray(Y), np.asarray(Uq),
                                np.asarray(Yq),
                                optimize_noise=spec.optimize_noise)
                            o_mses.append(om)
                            o_learn.append(ol)
                            o_query.append(oq)
                            with open(ora_path, "a") as fh:
                                fh.write(f"{om:.8f} {ol:.6f} {oq:.6f}\n")
                    row = {"mse": float(np.median(mses)),
                           "learn_ms": float(np.median(t_learn)) * 1e3,
                           "query_ms": float(np.median(t_query)) * 1e3}
                    if o_mses:
                        row["oracle_mse"] = float(np.median(o_mses))
                        row["oracle_learn_ms"] = float(np.median(o_learn)) * 1e3
                        row["oracle_query_ms"] = float(np.median(o_query)) * 1e3
                        row["vs_oracle_learn"] = (row["oracle_learn_ms"]
                                                  / max(row["learn_ms"], 1e-9))
                        row["vs_oracle_query"] = (row["oracle_query_ms"]
                                                  / max(row["query_ms"], 1e-9))
                    summary[tag] = row
                    if verbose:
                        extra = (f" | oracle mse={row.get('oracle_mse', 0):.5f}"
                                 f" {row.get('vs_oracle_learn', 0):.1f}x learn"
                                 if o_mses else "")
                        print(f"{tag:50s} mse={row['mse']:.5f} "
                              f"learn={row['learn_ms']:.1f}ms "
                              f"query={row['query_ms']:.2f}ms{extra}",
                              flush=True)
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary
