"""Config-system parity tests (reference: src/tests/test_macros.cpp).

The reference checks its compile-time BO_PARAM family: static values,
BO_DYN_PARAM set/get, array/vector params, string params, and the
BO_PARAMS printer (tools/macros.hpp:53-112).  Here the equivalents are the
frozen-dataclass Config tree, `override` (BO_DYN_PARAM), `from_cli`, and
`pretty`/`diff` (BO_PARAMS / waf output_params).
"""

import dataclasses

import pytest

from limbo_tpu.config import Config


def test_defaults_match_reference():
    """Spot-check defaults::* values (kernel.hpp:55, ucb.hpp:56,
    rprop.hpp:58, max_iterations.hpp:53, boptimizer.hpp:71)."""
    cfg = Config()
    assert cfg.kernel.noise == 0.01
    assert cfg.kernel.optimize_noise is False
    assert cfg.acqui_ucb.alpha == 0.5
    assert cfg.acqui_gpucb.delta == 0.1
    assert cfg.acqui_ei.jitter == 0.0
    assert cfg.opt_rprop.iterations == 300
    assert cfg.stop_maxiterations.iterations == 190
    assert cfg.bayes_opt_boptimizer.hp_period == -1
    assert cfg.init_randomsampling.samples == 10


def test_dyn_param_override():
    """BO_DYN_PARAM semantics: set, read back, set again (test_macros.cpp:72)."""
    cfg = Config()
    c2 = cfg.override("acqui_ucb.alpha", 2.0)
    assert c2.acqui_ucb.alpha == 2.0
    c3 = c2.override("acqui_ucb.alpha", 3.0)
    assert c3.acqui_ucb.alpha == 3.0
    # original untouched (frozen tree, unlike the mutable BO_DYN_PARAM —
    # functional style is the JAX-idiomatic equivalent)
    assert cfg.acqui_ucb.alpha == 0.5


def test_override_is_typed():
    """Values coerce to the declared param type; unknown names raise."""
    cfg = Config().override("opt_rprop.iterations", "100")
    assert cfg.opt_rprop.iterations == 100
    assert isinstance(cfg.opt_rprop.iterations, int)
    with pytest.raises(AttributeError):
        Config().override("opt_rprop.not_a_param", 1)
    with pytest.raises(AttributeError):
        Config().override("no_such_namespace.x", 1)
    with pytest.raises(KeyError):
        Config().override("flat_name_no_dot", 1)


def test_from_cli():
    cfg = Config.from_cli([
        "--acqui_ucb.alpha=0.125",
        "--stop_maxiterations.iterations=40",
        "--kernel.optimize_noise=true",
        "positional-ignored",
    ])
    assert cfg.acqui_ucb.alpha == 0.125
    assert cfg.stop_maxiterations.iterations == 40
    assert cfg.kernel.optimize_noise is True


def test_pretty_prints_all_params():
    """BO_PARAMS parity (macros.hpp:112): every namespace.param appears."""
    text = Config().pretty()
    assert "kernel.noise = 0.01" in text
    assert "acqui_ucb.alpha = 0.5" in text
    assert "stop_maxiterations.iterations = 190" in text
    # one line per leaf param across the whole tree
    n_leaves = sum(len(dataclasses.fields(getattr(Config(), f.name)))
                   for f in dataclasses.fields(Config))
    assert len(text.splitlines()) == n_leaves


def test_diff_reports_only_overrides():
    cfg = Config().override_many({"acqui_ucb.alpha": 0.125,
                                  "opt_cmaes.restarts": 3})
    d = cfg.diff()
    assert d == {"acqui_ucb.alpha": 0.125, "opt_cmaes.restarts": 3}
    assert Config().diff() == {}
