"""Stats layer tests: all 13 writers produce the reference's .dat formats
(stat/stat_base.hpp lazy files, one line per iteration)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling
from limbo_tpu.bo import stats as st
from limbo_tpu.opt import RandomSweep

F64 = jnp.float64


def quad(x):
    return np.array([-np.sum((np.asarray(x) - 0.5) ** 2)])


def test_all_stats_write_files(tmp_path):
    all_stats = (
        st.Samples(), st.Observations(), st.AggregatedObservations(),
        st.BestSamples(), st.BestObservations(),
        st.BestAggregatedObservations(), st.GPLikelihood(),
        st.GPKernelHParams(), st.GPMeanHParams(), st.GPAcquisitions(),
        st.GPPredictionDifferences(), st.GPGrid(bins=4),
    )
    bo = BOptimizer(init=RandomSampling(3), stop=(MaxIterations(3),),
                    acqui_optimizer=RandomSweep(samples=64),
                    stats=all_stats, res_base_dir=str(tmp_path), dtype=F64)
    bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(0))
    assert bo.res_dir is not None
    files = set(os.listdir(bo.res_dir))
    expected = {"samples.dat", "observations.dat",
                "aggregated_observations.dat", "best_samples.dat",
                "best_observations.dat", "best_aggregated_observations.dat",
                "gp_likelihood.dat", "gp_kernel_hparams.dat",
                "gp_mean_hparams.dat", "gp_acquisitions.dat",
                "gp_prediction_differences.dat"}
    assert expected.issubset(files), files
    # per-iteration grid dumps
    assert any(f.startswith("gp_1") for f in files)
    # one line per iteration, iteration-first format
    data = np.loadtxt(os.path.join(bo.res_dir, "samples.dat"))
    assert data.shape == (3, 3)      # iter x1 x2
    np.testing.assert_array_equal(data[:, 0], [1, 2, 3])
    best = np.loadtxt(os.path.join(bo.res_dir,
                                   "best_aggregated_observations.dat"))
    assert np.all(np.diff(best[:, 1]) >= -1e-12)   # monotone best


def test_stats_disabled_writes_nothing(tmp_path):
    bo = BOptimizer(init=RandomSampling(3), stop=(MaxIterations(2),),
                    acqui_optimizer=RandomSweep(samples=64),
                    stats=(st.Samples(),), stats_enabled=False,
                    res_base_dir=str(tmp_path), dtype=F64)
    bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(0))
    # stats_enabled=False: no res dir at all (limbo tests rely on this,
    # bo_base.hpp:212)
    assert bo.res_dir is None


def test_mo_hypervolume_stat(tmp_path):
    from limbo_tpu.bo.mo_stats import HyperVolume, ParetoFront
    from limbo_tpu.bo.multi import Nsbo
    from limbo_tpu.bo.stop import MaxIterations as MI
    from limbo_tpu.opt.nsga2 import Nsga2

    def f(x):
        v = float(np.atleast_1d(x)[0]) * 2
        return np.array([1 - v ** 2 / 4, 1 - (v - 2) ** 2 / 4])

    bo = Nsbo(n_objs=2, stop=(MI(3),), dtype=F64,
              nsga2=Nsga2(pop_size=16, generations=5),
              stats_enabled=True, res_base_dir=str(tmp_path),
              stats=(HyperVolume(ref=[-1, -1]), ParetoFront()))
    bo.optimize(f, dim=1, key=jax.random.PRNGKey(0))
    files = os.listdir(bo.res_dir)
    assert "hypervolume.dat" in files
    hv = np.loadtxt(os.path.join(bo.res_dir, "hypervolume.dat"))
    assert np.all(np.diff(np.atleast_2d(hv)[:, 1]) >= -1e-12)
    assert any(f.startswith("pareto_front_") for f in files)


def test_multi_gp_serialization_roundtrip(tmp_path, rng):
    """limbo test_serialize also covers MultiGP (test_serialize.cpp:191)."""
    from limbo_tpu.kernels import Exp
    from limbo_tpu.means import NullMean
    from limbo_tpu.models import multi_gp
    from limbo_tpu.utils.serialize import load_gp, save_gp

    X = jnp.asarray(rng.uniform(size=(10, 2)))
    Y = jnp.asarray(rng.normal(size=(10, 2)))
    kern = Exp.create(l=0.3, dtype=F64)
    m = multi_gp.fit(kern, NullMean(dim_out=2), X, Y, capacity=16)
    save_gp(m, str(tmp_path / "mgp"))
    template = multi_gp.empty(kern, NullMean(dim_out=2), dim_in=2, dim_out=2,
                              capacity=16, dtype=F64)
    m2 = load_gp(template, str(tmp_path / "mgp"))
    Xq = jnp.asarray(rng.uniform(size=(5, 2)))
    for a, b in zip(multi_gp.query(m, Xq), multi_gp.query(m2, Xq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_pareto_benchmark_stat(tmp_path):
    from limbo_tpu.bo.mo_stats import ParetoBenchmark
    from limbo_tpu.bo.multi import Nsbo
    from limbo_tpu.bo.stop import MaxIterations as MI
    from limbo_tpu.opt.nsga2 import Nsga2

    def f(x):
        v = float(np.atleast_1d(x)[0]) * 2
        return np.array([1 - v ** 2 / 4, 1 - (v - 2) ** 2 / 4])

    bo = Nsbo(n_objs=2, stop=(MI(2),), dtype=F64,
              nsga2=Nsga2(pop_size=16, generations=4),
              stats_enabled=True, res_base_dir=str(tmp_path),
              stats=(ParetoBenchmark(true_fn=f),))
    bo.optimize(f, dim=1, key=jax.random.PRNGKey(0))
    files = os.listdir(bo.res_dir)
    assert any(f.startswith("pareto_model_") and "real" not in f for f in files)
    assert any(f.startswith("pareto_model_real_") for f in files)
    assert any(f.startswith("pareto_data_") for f in files)
    assert any(f.startswith("obs_") for f in files)
