"""Multi-objective + constrained BO tests (mirrors examples
src/examples/experimental/{multi,cbo}.cpp and the experimental test
coverage of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.bo.cbo import CBOptimizer, ECI
from limbo_tpu.bo.multi import BoMulti, Ehvi, Nsbo, Parego
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.opt.nsga2 import Nsga2
from limbo_tpu.ops.pareto import hypervolume_2d, non_dominated_mask

F64 = jnp.float64


def schaffer_max(x):
    """Maximization 2-obj with front: f1 = 1 - x^2, f2 = 1 - (x-1)^2, x in R."""
    v = float(np.atleast_1d(x)[0]) * 2.0   # stretch [0,1] -> [0,2]
    return np.array([1.0 - v ** 2 / 4.0, 1.0 - (v - 2.0) ** 2 / 4.0])


def test_nsga2_finds_schaffer_front():
    def objs(x):
        v = x[0] * 2.0
        return jnp.asarray([1.0 - v ** 2 / 4.0, 1.0 - (v - 2.0) ** 2 / 4.0])

    ea = Nsga2(pop_size=48, generations=40)
    X, Y = jax.jit(lambda k: ea(objs, 1, k, dtype=F64))(jax.random.PRNGKey(0))
    nd = np.asarray(non_dominated_mask(Y))
    assert nd.sum() >= 20                       # a well-spread front
    # front covers the whole tradeoff: x in [0, 1]
    xs = np.asarray(X)[nd][:, 0]
    assert xs.min() < 0.12 and xs.max() > 0.88
    # hypervolume close to the true front's
    hv = float(hypervolume_2d(jnp.asarray(Y)[nd],
                              jnp.asarray([-1.0, -1.0], dtype=F64)))
    # true front: f1 = 1-t^2, f2 = 1-(t-2)^2/... parametrize t=v in [0,2]
    t = np.linspace(0, 2, 200)
    F = np.stack([1 - t ** 2 / 4, 1 - (t - 2) ** 2 / 4], axis=1)
    hv_true = float(hypervolume_2d(jnp.asarray(F),
                                   jnp.asarray([-1.0, -1.0], dtype=F64)))
    assert hv > 0.95 * hv_true


def test_ehvi_loop_improves_hypervolume():
    bo = Ehvi(ref=(-1.0, -1.0), stop=(MaxIterations(10),), dtype=F64)
    Xp, Yp = bo.optimize(schaffer_max, dim=1, key=jax.random.PRNGKey(1))
    assert len(Xp) >= 3
    hv = float(hypervolume_2d(jnp.asarray(Yp, dtype=F64),
                              jnp.asarray([-1.0, -1.0], dtype=F64)))
    t = np.linspace(0, 2, 200)
    F = np.stack([1 - t ** 2 / 4, 1 - (t - 2) ** 2 / 4], axis=1)
    hv_true = float(hypervolume_2d(jnp.asarray(F),
                                   jnp.asarray([-1.0, -1.0], dtype=F64)))
    assert hv > 0.85 * hv_true


def test_nsbo_loop_runs():
    bo = Nsbo(n_objs=2, stop=(MaxIterations(5),), dtype=F64,
              nsga2=Nsga2(pop_size=32, generations=10))
    Xp, Yp = bo.optimize(schaffer_max, dim=1, key=jax.random.PRNGKey(2))
    assert len(Xp) >= 2
    assert np.all(np.isfinite(Yp))


def test_parego_loop():
    bo = Parego(n_objs=2, iterations=12, dtype=F64)
    Xp, Yp = bo.optimize(schaffer_max, dim=1, key=jax.random.PRNGKey(3))
    hv = float(hypervolume_2d(jnp.asarray(Yp, dtype=F64),
                              jnp.asarray([-1.0, -1.0], dtype=F64)))
    assert hv > 1.0                              # found a decent front
    assert len(Xp) >= 3


def constrained_f(x):
    """Maximize -(x-0.75)^2; feasible iff x <= 0.5 (constraint obs 1/0)."""
    v = float(np.atleast_1d(x)[0])
    obj = -(v - 0.75) ** 2
    feas = 1.0 if v <= 0.5 else 0.0
    return np.array([obj, feas])


def test_cbo_respects_constraint():
    bo = CBOptimizer(nb_constraints=1, stop=(MaxIterations(40),), dtype=F64)
    bo.optimize(constrained_f, dim=1, key=jax.random.PRNGKey(4))
    # constrained optimum is at x = 0.5 (boundary)
    assert bo._feasible_mask().any()
    best = float(np.atleast_1d(bo.best_sample)[0])
    assert best <= 0.55
    assert abs(best - 0.5) < 0.15


def test_bo_multi_pareto_model(rng):
    bo = BoMulti(n_objs=2, dtype=F64, nsga2=Nsga2(pop_size=32, generations=10))
    for _ in range(12):
        x = rng.uniform(size=1)
        bo.add_sample(x, schaffer_max(x))
    bo.update_models()
    Xp, mu, var = bo.pareto_model(jax.random.PRNGKey(5))
    assert Xp.shape[1] == 1 and mu.shape[1] == 2 and var.shape[1] == 2
    assert len(Xp) >= 2


def test_imgpo_finds_optimum():
    from limbo_tpu.bo.imgpo import IMGPO

    def f(x):
        return -np.sum((np.asarray(x) - 0.3) ** 2)

    opt = IMGPO(max_evals=40, dtype=F64)
    opt.optimize(f, dim=2)
    assert opt.best_value > -2e-3
    np.testing.assert_allclose(opt.best_sample, [0.3, 0.3], atol=0.06)


def test_config_system():
    from limbo_tpu.config import Config

    cfg = Config()
    assert cfg.acqui_ucb.alpha == 0.5          # limbo default
    assert cfg.stop_maxiterations.iterations == 190
    cfg2 = cfg.override("acqui_ucb.alpha", 0.7)
    assert cfg2.acqui_ucb.alpha == 0.7 and cfg.acqui_ucb.alpha == 0.5
    cfg3 = Config.from_cli(["--opt_rprop.iterations=500", "--kernel.noise=0.1"])
    assert cfg3.opt_rprop.iterations == 500
    assert cfg3.kernel.noise == 0.1
    assert cfg3.diff() == {"opt_rprop.iterations": 500, "kernel.noise": 0.1}
    assert "acqui_ucb.alpha = 0.5" in cfg3.pretty()
    import pytest as _pytest
    with _pytest.raises(KeyError):
        cfg.override("bogus", 1)


def test_imgpo_fidelity_branin():
    """Full-fidelity IMGPO (UCB_IMGPO + M counter + xi-lookahead) finds
    Branin's optimum data-efficiently and actually exercises the GP screen
    (imgpo.hpp:86-417)."""
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.benchmarks.functions import BRANIN
    from limbo_tpu.bo.imgpo import IMGPO

    f = BRANIN.as_max_objective()
    algo = IMGPO(max_evals=45, dtype=jnp.float64)
    algo.optimize(lambda x: np.asarray(f(jnp.asarray(x))), dim=2)
    acc = BRANIN.accuracy(-algo.best_value)
    assert acc < 0.1, acc
    # the GP screen must have replaced at least one evaluation
    assert algo.M > 1
    # and the evaluation budget is respected
    assert len(algo.Y) <= 45
