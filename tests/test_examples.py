"""Examples/tutorials stay importable and API-correct (cheap bit-rot guard;
full runs are exercised on TPU / by hand)."""

import importlib.util
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = [
    *sorted((ROOT / "examples").glob("*.py")),
    *sorted((ROOT / "examples" / "experimental").glob("*.py")),
    *sorted((ROOT / "tutorials").glob("*.py")),
]


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.stem)
def test_example_imports(path):
    spec = importlib.util.spec_from_file_location(f"_ex_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)          # __main__ guard keeps it cheap
    assert hasattr(mod, "main") or path.parent.name == "tutorials"


def test_basic_example_runs():
    """The cheapest end-to-end example actually executes."""
    import numpy as np
    import jax

    from limbo_tpu.bo import BOptimizer, MaxIterations
    from limbo_tpu.opt import RandomSweep

    bo = BOptimizer(stop=(MaxIterations(3),),
                    acqui_optimizer=RandomSweep(samples=64),
                    stats_enabled=False)
    state = bo.optimize(
        lambda x: np.array([-(np.atleast_1d(x)[0] - 0.75) ** 2]),
        dim_in=1, key=jax.random.PRNGKey(0))
    assert np.isfinite(state.best_value)
