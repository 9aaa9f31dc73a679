"""Inner-optimizer tests (mirrors src/tests/test_optimizers.cpp):

- random/grid search hit known optima on simple functions (:120-166)
- classic gradient optimizers (Rprop/Adam/GradientAscent + momentum/nesterov)
  on standard test functions (:196-272)
- ParallelRepeater and Chained combinators (:274-305)
- CMA-ES bounded/unbounded (src/tests/test_cmaes.cpp:66-92)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.opt import (
    Adam,
    Chained,
    Cmaes,
    GradientAscent,
    GridSearch,
    ParallelRepeater,
    RandomPoint,
    RandomRestarts,
    RandomSweep,
    Rprop,
)

KEY = jax.random.PRNGKey(7)


def sphere_max(x):
    """Maximize -(x - 0.5)^2 summed: optimum at 0.5 with value 0."""
    return -jnp.sum((x - 0.5) ** 2)


def test_grid_search():
    res = GridSearch(bins=20)(sphere_max, jnp.zeros(2), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-6)


def test_random_sweep():
    res = RandomSweep(samples=4096)(sphere_max, jnp.zeros(2), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=0.05)


def test_random_point_in_bounds():
    res = RandomPoint()(sphere_max, jnp.zeros(3), KEY, True)
    x = np.asarray(res.x)
    assert np.all(x >= 0) and np.all(x <= 1)


@pytest.mark.parametrize("opt", [
    Rprop(iterations=150),
    Adam(iterations=3000, alpha=0.05),
    GradientAscent(iterations=2000, alpha=0.02),
    GradientAscent(iterations=2000, alpha=0.02, gamma=0.7),
    GradientAscent(iterations=2000, alpha=0.02, gamma=0.7, nesterov=True),
])
def test_classic_optimizers_bounded(opt):
    res = opt(sphere_max, jnp.asarray([0.1, 0.9]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-2)
    assert float(res.value) > -1e-3


def test_rprop_unbounded():
    """Optimum outside [0,1] reachable when bounded=False."""
    f = lambda x: -jnp.sum((x - 2.5) ** 2)
    res = Rprop(iterations=300)(f, jnp.zeros(2), KEY, False)
    np.testing.assert_allclose(np.asarray(res.x), [2.5, 2.5], atol=1e-2)


def test_parallel_repeater():
    opt = ParallelRepeater(sub=Rprop(iterations=100), repeats=8, epsilon=0.1)
    res = opt(sphere_max, jnp.asarray([0.3, 0.3]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-2)


def test_random_restarts_escapes_local_max():
    """Multi-modal: restarts find the global maximum."""
    def f(x):
        # two bumps, global at 0.8
        return (jnp.exp(-100 * jnp.sum((x - 0.2) ** 2)) * 0.5
                + jnp.exp(-100 * jnp.sum((x - 0.8) ** 2)))

    opt = RandomRestarts(sub=Rprop(iterations=80), repeats=24,
                         sweep_samples=512)
    res = opt(f, jnp.asarray([0.2]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.8], atol=5e-2)


def test_rprop_run_resume_matches_single_run():
    """Rprop.run with a carried state == one uninterrupted run (the polish
    phase must continue the ascent exactly, adapted step sizes included)."""
    opt = Rprop(iterations=40)
    full, _ = opt.run(sphere_max, jnp.asarray([0.9, 0.1]), bounded=True)
    _, st = Rprop(iterations=25).run(sphere_max, jnp.asarray([0.9, 0.1]),
                                     bounded=True)
    resumed, _ = opt.run(sphere_max, None, bounded=True, state=st,
                         iterations=15)
    # the split run pays one extra final-candidate eval at step 25, which
    # only updates the best-seen tracker — iterates match to fp tolerance
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               atol=1e-6)
    assert float(resumed.value) >= float(full.value) - 1e-6


def test_random_restarts_polish_multimodal():
    """Wide-then-deep (polish) schedule still finds the global max and at
    least matches the phase-1-only result on a funnel."""
    def f(x):
        return (jnp.exp(-100 * jnp.sum((x - 0.2) ** 2)) * 0.5
                + jnp.exp(-100 * jnp.sum((x - 0.8) ** 2)))

    opt = RandomRestarts(sub=Rprop(iterations=12), repeats=32,
                         sweep_samples=512, polish_k=4, polish_steps=20)
    res = opt(f, jnp.asarray([0.2]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.8], atol=5e-2)

    shallow = RandomRestarts(sub=Rprop(iterations=12), repeats=32,
                             sweep_samples=512)
    res_shallow = shallow(f, jnp.asarray([0.2]), KEY, True)
    assert float(res.value) >= float(res_shallow.value) - 1e-6

    # polish is jit-safe (the whole acquisition program compiles)
    res_jit = jax.jit(lambda k: opt(f, jnp.asarray([0.2]), k, True))(KEY)
    np.testing.assert_allclose(np.asarray(res_jit.x), np.asarray(res.x),
                               atol=1e-6)


def test_polish_requires_resumable_sub():
    """Polish knobs on a non-resumable sub-optimizer raise instead of
    silently running a phase-1-only schedule."""
    opt = RandomRestarts(sub=Adam(iterations=12), repeats=8,
                         sweep_samples=64, polish_k=4, polish_steps=8)
    with pytest.raises(ValueError, match="resumable"):
        opt(sphere_max, jnp.asarray([0.5]), KEY, True)


def test_chained():
    opt = Chained(subs=(RandomSweep(samples=256), Rprop(iterations=100)))
    res = opt(sphere_max, jnp.asarray([0.9, 0.9]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-2)


def test_cmaes_bounded():
    res = Cmaes(iterations=80)(sphere_max, jnp.asarray([0.2, 0.2]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=2e-2)


def test_cmaes_unbounded():
    """limbo test_cmaes: unbounded CMA-ES finds x* = 2.5 (test_cmaes.cpp:85)."""
    f = lambda x: -jnp.sum((x - 2.5) ** 2)
    res = Cmaes(iterations=200, sigma0=1.0)(f, jnp.zeros(2), KEY, False)
    np.testing.assert_allclose(np.asarray(res.x), [2.5, 2.5], atol=5e-2)


def test_cmaes_rastrigin_multimodal():
    """CMA-ES with restarts on 2-D Rastrigin (global opt at 0.5 after shift)."""
    def f(x):
        z = (x - 0.5) * 2.0
        return -(10 * 2 + jnp.sum(z * z - 10 * jnp.cos(2 * jnp.pi * z)))

    res = Cmaes(iterations=150, pop_size=24, restarts=4)(
        f, jnp.asarray([0.9, 0.1]), KEY, True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=2e-2)


def test_vmappable():
    """Optimizers compose under vmap (the TBB-replacement property)."""
    opt = Rprop(iterations=50)
    inits = jnp.stack([jnp.full((2,), 0.1), jnp.full((2,), 0.9)])
    keys = jax.random.split(KEY, 2)
    res = jax.vmap(lambda x0, k: opt(sphere_max, x0, k, True))(inits, keys)
    assert res.x.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(res.x),
                               [[0.5, 0.5], [0.5, 0.5]], atol=1e-2)


# ---------------------------------------------------------------------------
# constrained optimization (reference: src/tests/test_nlopt.cpp:100-165)
# ---------------------------------------------------------------------------

def test_auglag_equality_constraint():
    """maximize -x0^2 - x1^2 s.t. x0 + 3 x1 - 10 = 0 -> (1, 3)
    (test_nlopt.cpp test_nlopt_no_grad_constraint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.opt.constrained import AugmentedLagrangian
    from limbo_tpu.opt.gradient import Rprop

    opt = AugmentedLagrangian(sub=Rprop(iterations=150),
                              outer_iterations=12)
    opt = opt.add_equality_constraint(lambda x: x[0] + 3.0 * x[1] - 10.0)

    def f(x):
        return -x[0] ** 2 - x[1] ** 2

    best = None
    for i in range(5):
        x0 = jax.random.uniform(jax.random.PRNGKey(i), (2,),
                                dtype=jnp.float64)
        res = jax.jit(lambda x0, k: opt(f, x0, k, False))(
            x0, jax.random.PRNGKey(100 + i))
        x = np.asarray(res.x)
        if best is None or (np.linalg.norm(x - [1.0, 3.0])
                            < np.linalg.norm(best - [1.0, 3.0])):
            best = x
    np.testing.assert_allclose(best, [1.0, 3.0], atol=1e-4)


def test_auglag_inequality_constraint():
    """maximize -x0^2 - x1^2 s.t. -x0 - 3 x1 + 10 <= 0 -> (1, 3)
    (test_nlopt.cpp test_nlopt_grad_constraint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.opt.constrained import AugmentedLagrangian
    from limbo_tpu.opt.gradient import Rprop

    opt = AugmentedLagrangian(sub=Rprop(iterations=150),
                              outer_iterations=12)
    opt = opt.add_inequality_constraint(
        lambda x: -x[0] - 3.0 * x[1] + 10.0)

    def f(x):
        return -x[0] ** 2 - x[1] ** 2

    best = None
    for i in range(5):
        x0 = jax.random.uniform(jax.random.PRNGKey(i), (2,),
                                dtype=jnp.float64)
        res = jax.jit(lambda x0, k: opt(f, x0, k, False))(
            x0, jax.random.PRNGKey(200 + i))
        x = np.asarray(res.x)
        if best is None or (np.linalg.norm(x - [1.0, 3.0])
                            < np.linalg.norm(best - [1.0, 3.0])):
            best = x
    np.testing.assert_allclose(best, [1.0, 3.0], atol=1e-3)


def test_auglag_inactive_inequality():
    """An inactive constraint must not perturb the unconstrained optimum."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.opt.constrained import AugmentedLagrangian
    from limbo_tpu.opt.gradient import Rprop

    opt = AugmentedLagrangian(sub=Rprop(iterations=150), outer_iterations=8)
    opt = opt.add_inequality_constraint(lambda x: x[0] + x[1] - 100.0)

    res = opt(lambda x: -jnp.sum((x - 0.5) ** 2),
              jnp.asarray([3.0, -2.0]), jax.random.PRNGKey(0), False)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-5)


def test_auglag_with_cmaes_sub():
    """The wrapper composes with gradient-free inner optimizers too
    (≙ COBYLA being NLOpt's derivative-free constrained solver)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from limbo_tpu.opt.cmaes import Cmaes
    from limbo_tpu.opt.constrained import AugmentedLagrangian

    opt = AugmentedLagrangian(sub=Cmaes(iterations=60, pop_size=16),
                              outer_iterations=6)
    opt = opt.add_equality_constraint(lambda x: x[0] + x[1] - 1.0)

    res = opt(lambda x: -jnp.sum(x ** 2),
              jnp.asarray([0.9, 0.9]), jax.random.PRNGKey(0), True)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=5e-2)


# ---------------------------------------------------------------------------
# DIRECT-L (opt/direct.py) — the deterministic global optimizer matching the
# reference's NLOpt GN_DIRECT_L_RAND default (boptimizer.hpp:120-127)
# ---------------------------------------------------------------------------


def test_direct_finds_smooth_optimum():
    from limbo_tpu.opt.direct import DirectL

    opt = DirectL(rounds=48, splits_per_round=8)
    res = opt(lambda x: -jnp.sum((x - 0.3) ** 2),
              jnp.full((3,), 0.5, jnp.float64), jax.random.PRNGKey(0), True)
    assert float(res.value) > -1e-6
    np.testing.assert_allclose(np.asarray(res.x), 0.3, atol=2e-3)


def test_direct_finds_multimodal_global():
    """Rastrigin-4D: the function class the sweep+ascent replacement lost
    to CMA-ES (benchmark_results/acqopt_ab.json); DIRECT's systematic
    subdivision finds the global basin deterministically."""
    from limbo_tpu.opt.direct import DirectL

    def neg_rastrigin(x):
        z = (x - 0.5) * 10.24
        return -(10.0 * z.shape[0]
                 + jnp.sum(z * z - 10.0 * jnp.cos(2 * jnp.pi * z)))

    opt = DirectL(rounds=64, splits_per_round=16)
    res = opt(neg_rastrigin, jnp.full((4,), 0.5, jnp.float64),
              jax.random.PRNGKey(0), True)
    assert float(res.value) > -1e-6          # global optimum is 0 at x=0.5


def test_direct_deterministic_and_jittable():
    from limbo_tpu.opt.direct import DirectL

    def f(x):
        return -jnp.sum((x - 0.42) ** 2) + 0.1 * jnp.sin(20 * x[0])

    opt = DirectL(rounds=24, splits_per_round=8)
    run = jax.jit(lambda k: opt(f, jnp.full((2,), 0.5, jnp.float64), k, True))
    r1 = run(jax.random.PRNGKey(3))
    r2 = run(jax.random.PRNGKey(3))
    assert float(r1.value) == float(r2.value)
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x))


def test_direct_rejects_unbounded():
    import pytest

    from limbo_tpu.opt.direct import DirectL

    with pytest.raises(ValueError):
        DirectL()(lambda x: -jnp.sum(x ** 2), jnp.zeros((2,)),
                  jax.random.PRNGKey(0), False)
