"""Benchmark suite sanity tests: function values at known optima, harness
plumbing on tiny budgets (the full protocol runs on TPU via scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.benchmarks.functions import (
    ALL_FUNCTIONS,
    BRANIN,
    GOLDSTEIN_PRICE,
    HARTMANN3,
    HARTMANN6,
    RASTRIGIN,
    SIX_HUMP_CAMEL,
    SPHERE,
)
from limbo_tpu.benchmarks.regression_functions import (
    ALL_REGRESSION,
    GRAMACY_LEE,
    ROBOT_ARM,
)


@pytest.mark.parametrize("fn", ALL_FUNCTIONS, ids=lambda f: f.name)
def test_solutions_are_optimal(fn):
    """f at the declared solutions beats 4096 random points."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(4096, fn.dim_in)))
    vals = jax.vmap(fn.fn)(X)
    f_opt = fn.f_opt
    assert f_opt <= float(vals.min()) + 1e-9


def test_known_values():
    np.testing.assert_allclose(float(SPHERE.fn(jnp.asarray([0.5, 0.5]))), 0.0,
                               atol=1e-12)
    np.testing.assert_allclose(RASTRIGIN.f_opt, 0.0, atol=1e-8)
    # Hartmann3 optimum: -3.86278 (sfu.ca/~ssurjano/hart3.html)
    np.testing.assert_allclose(HARTMANN3.f_opt, -3.86278, atol=1e-4)
    # Hartmann6 optimum: -3.32237
    np.testing.assert_allclose(HARTMANN6.f_opt, -3.32237, atol=1e-4)
    # limbo's BraninNormalized drops standard Branin's +10 term:
    # min = (0.397887 - 10 - 44.81) / 51.95  (testfunctions.hpp:305-312)
    np.testing.assert_allclose(BRANIN.f_opt, (0.397887 - 10 - 44.81) / 51.95,
                               atol=1e-4)
    # SixHumpCamel global min -1.0316
    np.testing.assert_allclose(SIX_HUMP_CAMEL.f_opt, -1.0316, atol=1e-3)


def test_regression_function_shapes():
    for fn in ALL_REGRESSION:
        for d in fn.dims:
            b = fn.bounds_for_dim(d)
            assert b.shape == (d, 2)
            x = jnp.asarray((b[:, 0] + b[:, 1]) / 2.0)
            v = fn.fn(x)
            assert np.isfinite(float(v))


def test_gramacy_lee_value():
    # GramacyLee at x=1: sin(10 pi)/2 + 0 = 0
    np.testing.assert_allclose(float(GRAMACY_LEE.fn(jnp.asarray([1.0]))), 0.0,
                               atol=1e-10)


def test_robot_arm_range():
    # fully folded arm with all lengths 0 -> distance 0
    x = jnp.zeros(8)
    np.testing.assert_allclose(float(ROBOT_ARM.fn(x)), 0.0, atol=1e-12)


def test_bo_suite_smoke(tmp_path):
    """Tiny-budget end-to-end run of the harness plumbing."""
    from limbo_tpu.benchmarks.bo_suite import Variant, run_suite
    from limbo_tpu.acqui import UCB
    from limbo_tpu.opt import RandomRestarts, Rprop

    v = Variant("smoke", UCB(0.5),
                RandomRestarts(sub=Rprop(iterations=10), repeats=2,
                               sweep_samples=64))
    summary = run_suite([v], [SPHERE], nb_reps=1, n_init=4, n_iters=6,
                        out_dir=str(tmp_path), dtype=jnp.float64,
                        verbose=False)
    key = "smoke/Sphere"
    assert key in summary and np.isfinite(summary[key]["accuracy"])
    assert (tmp_path / "smoke" / "Sphere.dat").exists()


def test_bo_suite_resume_no_duplicate_rows(tmp_path):
    """A partially-complete .dat resumes at the missing replicate index —
    no appended duplicates, no double-counted medians."""
    from limbo_tpu.benchmarks.bo_suite import Variant, run_suite
    from limbo_tpu.acqui import UCB
    from limbo_tpu.opt import RandomRestarts, Rprop

    v = Variant("resume", UCB(0.5),
                RandomRestarts(sub=Rprop(iterations=10), repeats=2,
                               sweep_samples=64))
    # simulate a run that died after 1 of 2 replicates
    vdir = tmp_path / "resume"
    vdir.mkdir()
    (vdir / "Sphere.dat").write_text("0.123456 42.000\n")
    run_suite([v], [SPHERE], nb_reps=2, n_init=4, n_iters=6,
              out_dir=str(tmp_path), dtype=jnp.float64, verbose=False)
    rows = np.loadtxt(vdir / "Sphere.dat", ndmin=2)
    assert rows.shape[0] == 2                       # 1 kept + 1 new, not 1+2
    assert rows[0, 0] == 0.123456                   # recorded row preserved


def test_regression_suite_smoke(tmp_path):
    from limbo_tpu.benchmarks.regression_suite import (
        ModelSpec,
        run_regression_suite,
    )

    summary = run_regression_suite(
        functions=[GRAMACY_LEE], models=[ModelSpec("smoke", False)],
        points=(60,), nb_reps=2, out_dir=str(tmp_path), dtype=jnp.float64,
        verbose=False)
    tag = "GramacyLee_d1_n60_smoke"
    assert tag in summary
    # GramacyLee oscillates ~10x over the domain: with a 50-iteration Rprop
    # the hp-opt basin is a lottery; just require clearly-better-than-mean
    assert summary[tag]["mse"] < 1.0


def test_plot_tools(tmp_path):
    """Plot helpers consume the harness .dat layouts (plot_bo_benchmarks
    parity; Agg backend, no display)."""
    from limbo_tpu.benchmarks.plots import (
        load_bo_results,
        plot_bo_benchmarks,
        plot_regression_benchmarks,
    )

    vdir = tmp_path / "bo" / "variantA"
    vdir.mkdir(parents=True)
    (vdir / "Sphere.dat").write_text("0.01 120.0\n0.02 130.0\n")
    (vdir / "Branin.dat").write_text("0.1 110.0\n0.05 115.0\n")
    res = load_bo_results(str(tmp_path / "bo"))
    assert res["variantA"]["Sphere"].shape == (2, 2)
    out = plot_bo_benchmarks(str(tmp_path / "bo"))
    assert out.endswith(".png")

    rdir = tmp_path / "reg"
    rdir.mkdir()
    (rdir / "F_d1_n50_m.dat").write_text("0.01 12.0 1.5\n0.02 13.0 1.6\n")
    out = plot_regression_benchmarks(str(rdir))
    assert out.endswith(".png")
