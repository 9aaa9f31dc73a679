"""Test configuration: run on a virtual 8-device CPU mesh with x64 available.

Multi-chip sharding tests use XLA's host-platform device virtualization
(the driver separately dry-runs the real multi-chip path; see
__graft_entry__.py).  Env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment pre-sets jax_platforms="axon,cpu" (TPU tunnel); tests run on
# the virtual CPU mesh, so force cpu before any backend initializes
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Test tiers.
#
#   pytest -m smoke   — the pre-commit gate: one fast test per subsystem,
#                       <60 s total on this host.  Run this before EVERY
#                       commit; the full suite stays the CI/merge gate.
#   pytest -m "not slow" — everything except the compile-heavy sharded-mesh
#                       tests (which dominate full-suite wall time).
#
# Selection is centralized here (not scattered @pytest.mark.smoke) so the
# tier stays auditable; a stale name below fails collection loudly instead
# of silently shrinking the tier.

_SMOKE = {
    "test_acqui.py": {"test_ucb_formula", "test_ei_zero_variance_is_zero"},
    "test_benchmarks.py": {"test_known_values"},
    "test_boptimizer.py": {"test_nan_observation_raises"},
    "test_chol.py": {"test_blocked_f32_reconstruction"},
    "test_combinations.py": {"test_inits"},
    "test_config.py": {"test_defaults_match_reference"},
    "test_determinism.py": {"test_same_seed_same_trajectory"},
    "test_ehvi3d.py": {"test_boxes_partition_volume"},
    "test_experiment.py": {"test_create_exp"},
    "test_gp.py": {"test_exact_interpolation"},
    "test_init_designs.py": {"test_random_sampling_count_and_bounds"},
    "test_integrations.py": {"test_marshalling_roundtrip"},
    "test_kernels.py": {"test_params_roundtrip"},
    "test_mo_bo.py": {"test_parego_loop"},
    "test_mo_ops.py": {"test_hypervolume_2d_exact"},
    "test_models_extra.py": {"test_multi_gp_add_sample"},
    "test_optimizers.py": {"test_grid_search", "test_random_point_in_bounds"},
    "test_oracle.py": {"test_oracle_lml_gradient_matches_fd"},
    "test_pallas_gram.py": {"test_gram_train_masked_method_matches_two_pass"},
    "test_parallel.py": {"test_sharded_restart_opt_matches_global_opt"},
    "test_qei.py": {"test_q1_matches_ei"},
    "test_serialize.py": {"test_roundtrip"},
    "test_stats.py": {"test_stats_disabled_writes_nothing"},
    "test_trimv.py": {"test_trimv_dispatch_fallback"},
}

# whole files whose tests are compile-bound on the 8-virtual-device mesh
_SLOW_FILES = {
    "test_sharded_big.py",
    "test_distributed_bo.py",
    "test_sharded_acq.py",
    "test_sharded_chol.py",
    "test_multihost.py",
}


def pytest_collection_modifyitems(config, items):
    seen = {f: set() for f in _SMOKE}
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[", 1)[0]
        if fname in _SMOKE and base in _SMOKE[fname]:
            item.add_marker(pytest.mark.smoke)
            seen[fname].add(base)
        if fname in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
    # fail loudly if a listed smoke test was renamed away — only when the
    # whole suite was collected (file-scoped runs see a subset)
    if config.args in ([], ["tests"], ["tests/"]) or not config.args:
        missing = {f: _SMOKE[f] - seen[f] for f in _SMOKE
                   if _SMOKE[f] - seen[f]}
        if missing:
            raise pytest.UsageError(f"stale smoke-tier entries: {missing}")
