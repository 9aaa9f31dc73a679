"""End-to-end BO tests (mirrors src/tests/test_boptimizer.cpp):

- finds the optimum of -(x - 0.25)^2 within tolerance with UCB and EI
  (:202,229,256), with and without hyperparameter optimization
- NaN observations raise EvaluationError (bo_base.hpp:232-238)
- the fully-jitted lax.scan loop agrees in capability with the host loop
- reset=False resume keeps samples (bo_base.hpp:249-260)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.acqui import EI, GP_UCB, UCB
from limbo_tpu.bo import BOptimizer, EvaluationError, MaxIterations, RandomSampling
from limbo_tpu.kernels import MaternFiveHalves, SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models.hp_opt import KernelLFOpt
from limbo_tpu.opt import RandomRestarts, Rprop

OPT_X = 0.25


def quad(x):
    x = np.asarray(x)
    return np.array([-np.sum((x - OPT_X) ** 2)])


def make_bo(acqui, iters=40, hp=False, dtype=jnp.float64):
    kwargs = dict(
        acqui=acqui,
        init=RandomSampling(6),
        stop=(MaxIterations(iters),),
        acqui_optimizer=RandomRestarts(sub=Rprop(iterations=40), repeats=8,
                                       sweep_samples=256),
        stats_enabled=False,
        dtype=dtype,
    )
    if hp:
        kwargs["kernel"] = SquaredExpARD.create(dim=2, dtype=dtype)
        kwargs["hp_opt"] = KernelLFOpt(optimizer=Rprop(iterations=50))
        kwargs["hp_period"] = 10
    return BOptimizer(**kwargs)


@pytest.mark.parametrize("acqui", [UCB(alpha=0.5), EI(), GP_UCB()])
def test_bo_finds_optimum(acqui):
    bo = make_bo(acqui)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)
    assert state.best_value > -1e-2


def test_bo_with_hp_opt():
    bo = make_bo(UCB(alpha=0.5), iters=40, hp=True)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)


def test_nan_observation_raises():
    bo = make_bo(UCB(), iters=5)

    def bad(x):
        return np.array([np.nan])

    with pytest.raises(EvaluationError):
        bo.optimize(bad, dim_in=2, key=jax.random.PRNGKey(0))


def test_resume_keeps_samples():
    bo = make_bo(UCB(), iters=10)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(5))
    n_after_first = int(state.gp.n)
    assert n_after_first == 6 + 10
    state2 = bo.optimize(quad, dim_in=2, reset=False, state=state,
                         key=jax.random.PRNGKey(6))
    assert int(state2.gp.n) == n_after_first + 10
    assert state2.total_iterations == 20


def test_optimize_jit_full_scan():
    """The whole BO loop under one jit (device objective)."""
    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo = make_bo(UCB(alpha=0.5), iters=30)
    state, history = bo.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(7))
    assert history["samples"].shape == (30, 2)
    assert float(history["best"][-1]) > -1e-2
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)
    # best trajectory is monotone
    best = np.asarray(history["best"])
    assert np.all(np.diff(best) >= -1e-12)


def test_optimize_jit_with_hp_opt():
    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo = make_bo(UCB(alpha=0.5), iters=25, hp=True)
    state, history = bo.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(8))
    assert float(history["best"][-1]) > -5e-2


@pytest.mark.parametrize("acqui", [UCB(alpha=0.5), EI()])
def test_bo_query_cache_path(acqui):
    """use_query_cache=True (matmul-only large-n path) matches capability."""
    bo = make_bo(acqui, iters=30)
    bo.use_query_cache = True
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)


def test_bo_query_cache_jit_path():
    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo = make_bo(UCB(alpha=0.5), iters=25)
    bo.use_query_cache = True
    state, history = bo.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(9))
    assert float(history["best"][-1]) > -1e-2


def test_bo_query_cache_bf16_mirror_path():
    """cache_query_dtype=bf16 (low-precision Kinv query mirror) still finds
    the optimum through both the host loop and the jitted scan loop."""
    bo = make_bo(UCB(alpha=0.5), iters=30)
    bo.use_query_cache = True
    bo.cache_query_dtype = jnp.bfloat16
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)

    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo2 = make_bo(UCB(alpha=0.5), iters=25)
    bo2.use_query_cache = True
    bo2.cache_query_dtype = jnp.bfloat16
    state, history = bo2.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(9))
    assert float(history["best"][-1]) > -1e-2


def test_bo_query_cache_lite():
    """cache_lite=True (no f32 K^{-1} master; mirror-only) drives both loops
    to the optimum; lite requires the deferred mode."""
    with pytest.raises(ValueError, match="cache_lite"):
        BOptimizer(use_query_cache=True, cache_fast_update="linv",
                   cache_lite=True)
    bo = make_bo(UCB(alpha=0.5), iters=30)
    bo.use_query_cache = True
    bo.cache_fast_update = "deferred"
    bo.cache_lite = True
    bo.cache_defer_m = 8
    bo.cache_query_dtype = jnp.bfloat16
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)

    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo2 = make_bo(UCB(alpha=0.5), iters=25)
    bo2.use_query_cache = True
    bo2.cache_fast_update = "deferred"
    bo2.cache_lite = True
    bo2.cache_defer_m = 8
    bo2.cache_query_dtype = jnp.bfloat16
    state, history = bo2.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(9))
    assert float(history["best"][-1]) > -1e-2


@pytest.mark.parametrize("mode", ["refined", "linv", "deferred", True])
def test_bo_query_cache_fast_update_modes(mode):
    """Every cached-add mode drives the BO loop to the optimum through both
    the host loop and the jitted scan loop (gp.add_sample_cached modes).
    "deferred" also exercises a flush boundary (cache_defer_m=8 < iters)."""
    bo = make_bo(UCB(alpha=0.5), iters=30)
    bo.use_query_cache = True
    bo.cache_fast_update = mode
    bo.cache_defer_m = 8
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)

    def f(x):
        return jnp.asarray([-jnp.sum((x - OPT_X) ** 2)])

    bo2 = make_bo(UCB(alpha=0.5), iters=25)
    bo2.use_query_cache = True
    bo2.cache_fast_update = mode
    bo2.cache_defer_m = 8
    state, history = bo2.optimize_jit(f, dim_in=2, key=jax.random.PRNGKey(9))
    assert float(history["best"][-1]) > -1e-2


def test_ask_tell_finds_optimum():
    """The ask/tell (hardware-in-the-loop) flow drives the same machinery
    as optimize(): init design first, then acquisition proposals."""
    bo = make_bo(UCB(alpha=0.5), iters=30)
    state = bo.init_state(dim_in=2, key=jax.random.PRNGKey(3))
    n_init = len(state.pending_init)
    assert n_init == 6
    for _ in range(n_init):
        x = bo.ask(state)
        state = bo.tell(state, x, quad(x))
    assert state.iteration == 0            # init points don't count
    assert int(state.gp.n) == n_init
    for _ in range(30):
        x = bo.ask(state)
        state = bo.tell(state, x, quad(x))
    assert state.iteration == 30
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.1)


def test_ask_tell_with_query_cache_and_foreign_points():
    """tell() accepts points the optimizer did not propose (the whole point
    of ask/tell), and the cached-K^{-1} path stays consistent."""
    bo = make_bo(UCB(alpha=0.5), iters=20, dtype=jnp.float32)
    bo.use_query_cache = True
    bo.cache_fast_update = "linv"
    state = bo.init_state(dim_in=2, key=jax.random.PRNGKey(0))
    while state.pending_init:
        x = bo.ask(state)
        state = bo.tell(state, x, quad(x))
    rng = np.random.default_rng(0)
    for i in range(20):
        # alternate proposals with externally chosen points
        x = bo.ask(state) if i % 2 == 0 else rng.uniform(size=2)
        state = bo.tell(state, x, quad(x))
    assert state.iteration == 20
    # posterior through the maintained cache agrees with an exact rebuild
    from limbo_tpu.models import gp as gp_mod
    Xq = jnp.asarray(rng.uniform(size=(16, 2)), dtype=jnp.float32)
    mu_c, _ = gp_mod.query_cached(state.gp, state.cache, Xq)
    gp_x = gp_mod.recompute(state.gp)
    mu_e, _ = gp_mod.query(gp_x, Xq)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_e), atol=5e-3)


def test_ask_tell_rejects_nan():
    bo = make_bo(UCB(alpha=0.5), iters=5)
    state = bo.init_state(dim_in=2, key=jax.random.PRNGKey(0))
    x = bo.ask(state)
    with pytest.raises(EvaluationError):
        bo.tell(state, x, np.array([np.nan]))


def test_bo_cache_mode_switch_not_stale():
    """Regression: flipping cache_fast_update between optimize() calls was
    ignored (the cache-build/update jits were memoized for the first mode)."""
    bo = make_bo(UCB(alpha=0.5), iters=8)
    bo.use_query_cache = True
    bo.cache_fast_update = False
    bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(0))
    assert bo._add_cached_jit_key is False
    bo.cache_fast_update = "linv"
    bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(1))
    assert bo._add_cached_jit_key == "linv"
    assert bo._cache_jit_key[0] == "linv"


def test_bo_unbounded():
    """Unbounded search finds an optimum outside [0,1]^d
    (limbo test_boptimizer.cpp:168 with CMA-ES unbounded)."""
    from limbo_tpu.opt import Cmaes

    def f(x):
        return np.array([-np.sum((np.asarray(x) - 2.5) ** 2)])

    bo = BOptimizer(
        acqui=UCB(alpha=1.0),
        acqui_optimizer=Cmaes(iterations=60, sigma0=2.0),
        init=RandomSampling(8),
        stop=(MaxIterations(25),),
        bounded=False,
        stats_enabled=False,
        dtype=jnp.float64,
    )
    state = bo.optimize(f, dim_in=1, key=jax.random.PRNGKey(11))
    np.testing.assert_allclose(state.best_sample, [2.5], atol=0.3)


def test_bo_with_sparsified_model():
    """≙ limbo modelfun<SparsifiedGP>: model dataset stays within budget."""
    bo = make_bo(UCB(alpha=0.5), iters=20)
    bo.max_model_points = 15
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(12))
    assert int(state.gp.n) <= 15
    np.testing.assert_allclose(state.best_sample, [OPT_X, OPT_X], atol=0.15)


def test_optimize_jit_stop_mask():
    """MaxPredictedValue inside the jitted scan freezes remaining iterations
    (stop/max_predicted_value.hpp:71 parity for the device loop)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.bo.optimizer import BOptimizer
    from limbo_tpu.bo.stop import MaxIterations, MaxPredictedValue

    def f(x):
        return -jnp.sum((x - 0.4) ** 2)[None]

    bo = BOptimizer(stop=(MaxIterations(30), MaxPredictedValue(ratio=0.9)),
                    stats_enabled=False)
    state, hist = bo.optimize_jit(f, dim_in=1, key=jax.random.PRNGKey(3),
                                  n_iterations=30)
    n_eff = int(hist["effective_iterations"])
    # on a smooth 1-D quadratic the model max is met well before 30 iters
    assert n_eff < 30
    # frozen iterations emit NaN samples; live ones are finite
    finite = np.isfinite(np.asarray(hist["samples"])[:, 0])
    assert finite.sum() == n_eff
    # best history is monotone and the optimum was found
    best = np.asarray(hist["best"])
    assert np.all(np.diff(best) >= 0)
    assert best[-1] > -1e-3


def test_optimize_jit_rejects_host_only_criterion():
    import pytest

    from limbo_tpu.bo.optimizer import BOptimizer

    class HostOnly:
        def __call__(self, state):
            return False

    bo = BOptimizer(stop=(HostOnly(),), stats_enabled=False)
    with pytest.raises(TypeError):
        bo.optimize_jit(lambda x: x[:1], dim_in=1)


def test_model_type_feature_validation():
    """Exact-GP-only features fail at construction for spgp/iterative
    (they carry no Cholesky state), not with an AttributeError mid-run."""
    from limbo_tpu.models.hp_opt import KernelLFOpt

    with pytest.raises(ValueError, match="use_query_cache"):
        BOptimizer(model_type="iterative", use_query_cache=True)
    with pytest.raises(ValueError, match="hp_opt"):
        BOptimizer(model_type="spgp", hp_opt=KernelLFOpt(), hp_period=5)
    with pytest.raises(ValueError, match="max_model_points"):
        BOptimizer(model_type="iterative", max_model_points=50)
    # optimize_jit is the exact-GP scan loop only
    bo = BOptimizer(model_type="iterative", stop=(MaxIterations(3),))
    with pytest.raises(NotImplementedError, match="optimize_jit"):
        bo.optimize_jit(lambda x: -jnp.sum(x**2)[None], dim_in=2)
