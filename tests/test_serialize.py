"""Serialization round-trip tests (mirrors src/tests/test_serialize.cpp:181-201):
saved model == loaded model predictions, text & binary archives, and load with
recompute rebuilding the factorization from data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.utils.serialize import BinaryArchive, TextArchive, load_gp, save_gp

F64 = jnp.float64


@pytest.mark.parametrize("archive", [BinaryArchive, TextArchive])
def test_roundtrip(tmp_path, rng, archive):
    X = jnp.asarray(rng.uniform(size=(20, 2)))
    Y = jnp.asarray(np.sin(np.asarray(X).sum(1, keepdims=True)))
    kern = SquaredExpARD.create(dim=2, dtype=F64)
    gp = gp_mod.fit(kern, DataMean.create(dtype=F64), X, Y)
    d = str(tmp_path / "model")
    save_gp(gp, d, archive=archive)

    template = gp_mod.empty(SquaredExpARD.create(dim=2, dtype=F64),
                            DataMean.create(dtype=F64), dim_in=2,
                            capacity=gp.capacity, dtype=F64)
    gp2 = load_gp(template, d)
    Xq = jnp.asarray(rng.uniform(size=(9, 2)))
    for a, b in zip(gp_mod.query(gp, Xq), gp_mod.query(gp2, Xq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_load_with_recompute(tmp_path, rng):
    X = jnp.asarray(rng.uniform(size=(15, 2)))
    Y = jnp.asarray(rng.normal(size=(15, 1)))
    kern = SquaredExpARD.create(dim=2, dtype=F64)
    gp = gp_mod.fit(kern, DataMean.create(dtype=F64), X, Y)
    d = str(tmp_path / "model")
    save_gp(gp, d)
    template = gp_mod.empty(SquaredExpARD.create(dim=2, dtype=F64),
                            DataMean.create(dtype=F64), dim_in=2,
                            capacity=gp.capacity, dtype=F64)
    gp2 = load_gp(template, d, recompute=True)
    np.testing.assert_allclose(np.asarray(gp2.L), np.asarray(gp.L), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gp2.alpha), np.asarray(gp.alpha),
                               atol=1e-10)


def test_bo_checkpoint_resume(tmp_path, rng):
    """Save a BO run mid-flight, reload, and continue with reset=False
    (limbo's optimize(reset=false) + archive combination)."""
    import jax.numpy as jnp
    from limbo_tpu.bo import BOptimizer, MaxIterations, RandomSampling
    from limbo_tpu.bo.checkpoint import load_state, save_state
    from limbo_tpu.opt import RandomSweep

    def quad(x):
        return np.array([-np.sum((np.asarray(x) - 0.3) ** 2)])

    bo = BOptimizer(init=RandomSampling(4), stop=(MaxIterations(5),),
                    acqui_optimizer=RandomSweep(samples=64),
                    stats_enabled=False, dtype=F64)
    state = bo.optimize(quad, dim_in=2, key=jax.random.PRNGKey(0))
    n_before = int(state.gp.n)
    save_state(state, str(tmp_path / "ckpt"))

    template = gp_mod.empty(bo._make_gp(2, 1, state.gp.capacity).kernel,
                            DataMean.create(dtype=F64), dim_in=2,
                            capacity=state.gp.capacity, dtype=F64)
    restored = load_state(template, str(tmp_path / "ckpt"))
    assert int(restored.gp.n) == n_before
    assert restored.total_iterations == 5

    state2 = bo.optimize(quad, dim_in=2, reset=False, state=restored)
    assert int(state2.gp.n) == n_before + 5
    assert state2.total_iterations == 10
