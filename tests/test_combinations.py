"""Combination-matrix test: every plug-in slot composes with every other.

Reference: src/tests/create_all_combinations_test.py:8-60 generates ~1000s
of C++ files over {kernels x means x hp-opts x acquis x acqui-opts x inits x
stats x stops} and compiles+runs 10 BO iterations of each.  Here the slots
are runtime values, so pytest parametrization covers the axes directly; each
combination runs a tiny end-to-end BO.  Axes are varied one at a time
against a fast base config (the cartesian explosion is unnecessary when
composition is structural, but every pair {axis value, loop} is exercised).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.acqui import EI, GP_UCB, UCB
from limbo_tpu.bo import (
    LHS,
    BOptimizer,
    GridSampling,
    MaxIterations,
    MaxPredictedValue,
    NoInit,
    RandomSampling,
    RandomSamplingGrid,
)
from limbo_tpu.kernels import Exp, MaternFiveHalves, MaternThreeHalves, SquaredExpARD
from limbo_tpu.means import ConstantMean, DataMean, FunctionARD, NullMean
from limbo_tpu.models.hp_opt import (
    KernelLFOpt,
    KernelLooOpt,
    KernelMeanLFOpt,
    MeanLFOpt,
    NoLFOpt,
)
from limbo_tpu.opt import (
    Cmaes,
    GridSearch,
    ParallelRepeater,
    RandomRestarts,
    RandomSweep,
    Rprop,
)

F64 = jnp.float64


def quad(x):
    return np.array([-np.sum((np.asarray(x) - 0.4) ** 2)])


def run_bo(**overrides):
    kwargs = dict(
        init=RandomSampling(4),
        stop=(MaxIterations(2),),
        acqui_optimizer=RandomSweep(samples=128),
        stats_enabled=False,
        dtype=F64,
    )
    kwargs.update(overrides)
    bo = BOptimizer(**kwargs)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(0))
    assert np.isfinite(state.best_value)
    return state


KERNELS = [Exp.create(dtype=F64), SquaredExpARD.create(dim=2, dtype=F64),
           MaternThreeHalves.create(dtype=F64),
           MaternFiveHalves.create(dtype=F64)]
MEANS = [NullMean(), ConstantMean.create(0.5, dtype=F64),
         DataMean.create(dtype=F64),
         FunctionARD.create(ConstantMean.create(0.5, dtype=F64))]


@pytest.mark.parametrize("kernel", KERNELS,
                         ids=lambda k: type(k).__name__)
@pytest.mark.parametrize("mean", MEANS, ids=lambda m: type(m).__name__)
def test_kernel_x_mean(kernel, mean):
    run_bo(kernel=kernel, mean=mean)


@pytest.mark.parametrize("acqui", [UCB(), GP_UCB(), EI(jitter=0.01)],
                         ids=lambda a: type(a).__name__)
@pytest.mark.parametrize("opt", [
    RandomSweep(samples=128),
    GridSearch(bins=6),
    RandomRestarts(sub=Rprop(iterations=15), repeats=2, sweep_samples=32),
    ParallelRepeater(sub=Rprop(iterations=15), repeats=2),
    Cmaes(iterations=10, pop_size=8),
], ids=lambda o: type(o).__name__)
def test_acqui_x_optimizer(acqui, opt):
    run_bo(acqui=acqui, acqui_optimizer=opt)


@pytest.mark.parametrize("init", [
    RandomSampling(4), RandomSamplingGrid(samples=4, bins=4),
    GridSampling(bins=2), LHS(samples=4),
], ids=lambda i: type(i).__name__)
def test_inits(init):
    run_bo(init=init)


@pytest.mark.parametrize("hp_cls", [
    NoLFOpt, KernelLFOpt, KernelLooOpt, KernelMeanLFOpt, MeanLFOpt,
], ids=lambda c: c.__name__)
def test_hp_opts(hp_cls):
    hp = (hp_cls() if hp_cls is NoLFOpt
          else hp_cls(optimizer=Rprop(iterations=15)))
    run_bo(kernel=SquaredExpARD.create(dim=2, dtype=F64),
           mean=ConstantMean.create(0.5, dtype=F64),
           hp_opt=hp, hp_period=2)


def test_stop_max_predicted_value():
    run_bo(stop=(MaxIterations(3), MaxPredictedValue(ratio=5.0)))


# ---------------------------------------------------------------------------
# model-slot parity (limbo modelfun<...>, bo_base.hpp:113): every model
# family drives the BO loop
# ---------------------------------------------------------------------------

import jax as _jax
import jax.numpy as _jnp
import numpy as _np
import pytest as _pytest


@_pytest.mark.parametrize("model_type,options", [
    ("spgp", {"m": 8}),
    ("iterative", {"block": 64, "cg_maxiter": 64}),
])
def test_bo_loop_with_alt_models(model_type, options):
    from limbo_tpu.bo.init_designs import RandomSampling
    from limbo_tpu.bo.optimizer import BOptimizer
    from limbo_tpu.bo.stop import MaxIterations

    def f(x):
        return _np.array([-(float(x[0]) - 0.6) ** 2])

    bo = BOptimizer(model_type=model_type, model_options=options,
                    init=RandomSampling(6), stop=(MaxIterations(12),),
                    stats_enabled=False, dtype=_jnp.float64)
    state = bo.optimize(f, dim_in=1, key=_jax.random.PRNGKey(5))
    assert int(state.gp.n) == 18
    assert abs(float(state.best_sample[0]) - 0.6) < 0.15
    assert state.best_value > -0.02


# ---------------------------------------------------------------------------
# Sampled full-cartesian matrix (≙ create_all_combinations_test.py:8-60):
# the reference compiles ~1000s of slot combinations; here a seeded random
# sample of 100 FULL products {kernel x mean x hp-opt x acqui x acqui-opt x
# init x stop x cache-mode x loop} runs 2-3 BO iterations each, so
# cross-slot interactions (not just one-axis variations) are exercised.
# Declared incompatibilities are repaired deterministically, mirroring the
# reference generator's exclusion lists.
# ---------------------------------------------------------------------------


def _combo_axes():
    return dict(
        kernel=[
            lambda: Exp.create(dtype=F64),
            lambda: SquaredExpARD.create(dim=2, dtype=F64),
            lambda: SquaredExpARD.create(dim=2, rank=1, dtype=F64),
            lambda: MaternThreeHalves.create(dtype=F64),
            lambda: MaternFiveHalves.create(dtype=F64),
        ],
        mean=[
            lambda: NullMean(),
            lambda: ConstantMean.create(0.5, dtype=F64),
            lambda: DataMean.create(dtype=F64),
            lambda: FunctionARD.create(ConstantMean.create(0.5, dtype=F64)),
        ],
        hp=[
            lambda: NoLFOpt(),
            lambda: KernelLFOpt(optimizer=Rprop(iterations=10)),
            lambda: KernelLooOpt(optimizer=Rprop(iterations=10)),
            lambda: KernelMeanLFOpt(optimizer=Rprop(iterations=10)),
            lambda: MeanLFOpt(optimizer=Rprop(iterations=10)),
        ],
        acqui=[lambda: UCB(), lambda: GP_UCB(), lambda: EI(jitter=0.01)],
        aopt=[
            lambda: RandomSweep(samples=64),
            lambda: GridSearch(bins=5),
            lambda: RandomRestarts(sub=Rprop(iterations=10), repeats=2,
                                   sweep_samples=16),
            lambda: ParallelRepeater(sub=Rprop(iterations=10), repeats=2),
            lambda: Cmaes(iterations=8, pop_size=8),
        ],
        init=[
            lambda: RandomSampling(4),
            lambda: RandomSamplingGrid(samples=4, bins=4),
            lambda: GridSampling(bins=2),
            lambda: LHS(samples=4),
        ],
        stop=[
            lambda: (MaxIterations(2),),
            lambda: (MaxIterations(3), MaxPredictedValue(ratio=5.0)),
        ],
        cache=[
            lambda: {},
            lambda: {"use_query_cache": True},
            lambda: {"use_query_cache": True, "cache_fast_update": "deferred",
                     "cache_defer_m": 2},
            lambda: {"use_query_cache": True, "cache_fast_update": "deferred",
                     "cache_defer_m": 2, "cache_lite": True,
                     "cache_query_dtype": jnp.bfloat16},
        ],
        loop=["optimize", "optimize_jit"],
    )


def _sample_combos(n=100, seed=813):
    axes = _combo_axes()
    rng = np.random.default_rng(seed)
    combos = []
    for _ in range(n):
        c = {k: int(rng.integers(len(v))) for k, v in axes.items()}
        # repair declared incompatibilities (deterministic):
        # mean-parameter hp-opts need a parametric mean
        if c["hp"] in (3, 4) and c["mean"] not in (1, 3):
            c["mean"] = 1
        # deferred/lite cached appends support constant-type means only
        if c["cache"] in (2, 3) and c["mean"] == 3:
            c["mean"] = 2
        combos.append(tuple(c[k] for k in axes))
    return list(dict.fromkeys(combos))        # drop exact duplicates


_COMBOS = _sample_combos()


def _combo_id(c):
    names = ["k", "m", "hp", "a", "o", "i", "s", "c", "l"]
    return "-".join(f"{n}{v}" for n, v in zip(names, c))


@pytest.mark.slow
@pytest.mark.parametrize("combo", _COMBOS, ids=_combo_id)
def test_sampled_full_product(combo):
    axes = _combo_axes()
    ki, mi, hi, ai, oi, ii, si, ci, li = combo
    hp = axes["hp"][hi]()
    kwargs = dict(
        kernel=axes["kernel"][ki](),
        mean=axes["mean"][mi](),
        acqui=axes["acqui"][ai](),
        acqui_optimizer=axes["aopt"][oi](),
        init=axes["init"][ii](),
        stop=axes["stop"][si](),
        stats_enabled=False,
        dtype=F64,
        hp_opt=None if isinstance(hp, NoLFOpt) else hp,
        hp_period=2,
        **axes["cache"][ci](),
    )
    bo = BOptimizer(**kwargs)
    loop = axes["loop"][li]
    if loop == "optimize":
        state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(7))
    else:
        state, history = bo.optimize_jit(
            lambda x: -jnp.sum((x - 0.4) ** 2)[None], dim_in=2,
            key=jax.random.PRNGKey(7))
        assert bool(jnp.isfinite(history["best"][-1]))
    n = int(state.gp.n)
    assert n > 0 and np.all(np.isfinite(np.asarray(state.gp.x[:n])))


def test_bo_loop_spgp_with_hp_opt():
    from limbo_tpu.bo.init_designs import RandomSampling
    from limbo_tpu.bo.optimizer import BOptimizer
    from limbo_tpu.bo.stop import MaxIterations
    from limbo_tpu.models.spgp import SPGPHpOpt
    from limbo_tpu.opt.gradient import Rprop

    def f(x):
        return _np.array([-(float(x[0]) - 0.3) ** 2])

    bo = BOptimizer(model_type="spgp", model_options={"m": 6},
                    init=RandomSampling(6), stop=(MaxIterations(10),),
                    hp_opt=SPGPHpOpt(optimizer=Rprop(iterations=30)),
                    hp_period=5, stats_enabled=False, dtype=_jnp.float64)
    state = bo.optimize(f, dim_in=1, key=_jax.random.PRNGKey(6))
    assert int(state.gp.n) == 16
    assert state.best_value > -0.05
