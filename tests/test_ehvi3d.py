"""Exact 3-D EHVI + batch (q-point) EHVI: cross-validation tests.

Oracle: a NumPy f64 Monte-Carlo estimator whose per-sample improvement is
computed by inclusion-exclusion over *front subsets* — a different
derivation from the shipped box decomposition, so agreement is meaningful
(≙ the reference cross-checks ehvi_sliceupdate against ehvi_montecarlo,
src/ehvi/).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limbo_tpu.ops.ehvi import (ehvi_2d_max, ehvi_3d_max, ehvi_max,
                                nondominated_boxes_3d, qehvi_mc_max)


def _hvi_min_oracle(y, front, ref):
    """Exact improvement vol([y,ref] \\ dominated(front)) by inclusion-
    exclusion over front subsets (minimization)."""
    base = np.prod(np.maximum(ref - y, 0.0))
    union = 0.0
    k = len(front)
    for r in range(1, k + 1):
        for S in itertools.combinations(range(k), r):
            corner = np.maximum(y, np.max(front[list(S)], axis=0))
            vol = np.prod(np.maximum(ref - corner, 0.0))
            union += (1.0 if r % 2 == 1 else -1.0) * vol
    return base - union


def _ehvi_mc_oracle(mu, sigma, front, ref, n=400_000, seed=0):
    rng = np.random.default_rng(seed)
    ys = mu[None, :] + sigma[None, :] * rng.standard_normal((n, len(mu)))
    # vectorized inclusion-exclusion
    base = np.prod(np.maximum(ref[None, :] - ys, 0.0), axis=1)
    union = np.zeros(n)
    k = len(front)
    for r in range(1, k + 1):
        for S in itertools.combinations(range(k), r):
            corner = np.maximum(ys, np.max(front[list(S)], axis=0)[None, :])
            vol = np.prod(np.maximum(ref[None, :] - corner, 0.0), axis=1)
            union += (1.0 if r % 2 == 1 else -1.0) * vol
    return float(np.mean(base - union))


FRONT3_MIN = np.array([[0.2, 0.8, 0.5],
                       [0.5, 0.5, 0.7],
                       [0.8, 0.2, 0.3],
                       [0.4, 0.6, 0.2]])
REF3_MIN = np.array([1.0, 1.0, 1.0])


def test_boxes_partition_volume():
    """Box volumes within [0,1]^3 must sum to 1 - dominated volume."""
    lower, upper = nondominated_boxes_3d(jnp.asarray(FRONT3_MIN),
                                         jnp.asarray(REF3_MIN))
    lo = np.maximum(np.asarray(lower), 0.0)     # clip to the unit box
    up = np.asarray(upper)
    vols = np.prod(np.maximum(up - lo, 0.0), axis=1)
    # improvement of y=0 over the front inside [0,1]^3 = non-dominated volume
    nondom = _hvi_min_oracle(np.zeros(3), FRONT3_MIN, REF3_MIN)
    assert abs(vols.sum() - nondom) < 1e-12


@pytest.mark.parametrize("mu,sigma", [
    ([0.4, 0.4, 0.4], [0.2, 0.2, 0.2]),
    ([0.1, 0.9, 0.5], [0.3, 0.1, 0.2]),
    ([0.9, 0.9, 0.9], [0.05, 0.05, 0.05]),
])
def test_ehvi_3d_exact_vs_mc_oracle(mu, sigma):
    mu = np.asarray(mu, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    # maximization convention: negate the minimization setup
    val = float(ehvi_3d_max(jnp.asarray(-mu), jnp.asarray(sigma),
                            jnp.asarray(-FRONT3_MIN), jnp.asarray(-REF3_MIN)))
    ref_val = _ehvi_mc_oracle(mu, sigma, FRONT3_MIN, REF3_MIN)
    assert val >= 0.0
    scale = max(ref_val, 1e-3)
    assert abs(val - ref_val) / scale < 0.05, (val, ref_val)


def test_ehvi_3d_padding_invariance():
    mu = jnp.asarray([-0.4, -0.4, -0.4])
    sigma = jnp.asarray([0.2, 0.2, 0.2])
    front = jnp.asarray(-FRONT3_MIN)
    ref = jnp.asarray(-REF3_MIN)
    v0 = float(ehvi_3d_max(mu, sigma, front, ref))
    fpad = jnp.concatenate([front, jnp.zeros((3, 3))], axis=0)
    mask = jnp.concatenate([jnp.ones(4), jnp.zeros(3)])
    v1 = float(ehvi_3d_max(mu, sigma, fpad, ref, front_mask=mask))
    assert abs(v0 - v1) < 1e-10


def test_generic_box_path_matches_2d_stripes():
    """ehvi_max (box decomposition) == ehvi_2d_max (stripe formula)."""
    front = jnp.asarray([[-0.2, -0.8], [-0.5, -0.5], [-0.8, -0.2]])
    ref = jnp.asarray([-1.0, -1.0])
    for mu, sg in [([-0.4, -0.4], [0.2, 0.3]), ([-0.9, -0.1], [0.1, 0.1])]:
        mu = jnp.asarray(mu)
        sg = jnp.asarray(sg)
        v_stripe = float(ehvi_2d_max(mu, sg, front, ref))
        v_boxes = float(ehvi_max(mu, sg, front, ref))
        assert abs(v_stripe - v_boxes) < 1e-10


def test_qehvi_q1_matches_exact():
    mu = np.array([-0.4, -0.5, -0.45])
    sigma = np.array([0.2, 0.15, 0.25])
    front = jnp.asarray(-FRONT3_MIN)
    ref = jnp.asarray(-REF3_MIN)
    exact = float(ehvi_3d_max(jnp.asarray(mu), jnp.asarray(sigma), front, ref))
    key = jax.random.PRNGKey(0)
    ys = (mu[None, None, :]
          + sigma[None, None, :]
          * np.asarray(jax.random.normal(key, (60_000, 1, 3))))
    mc = float(qehvi_mc_max(jnp.asarray(ys), front, ref))
    assert abs(mc - exact) / max(exact, 1e-3) < 0.05, (mc, exact)


def test_qehvi_batch_dominates_single():
    """EHVI of {c1, c2} >= EHVI of c1 (same samples): more candidates can
    only add improvement (union monotonicity of ehvi_multi.cc semantics)."""
    front = jnp.asarray(-FRONT3_MIN)
    ref = jnp.asarray(-REF3_MIN)
    key = jax.random.PRNGKey(1)
    mu = jnp.asarray([[-0.4, -0.5, -0.45], [-0.7, -0.3, -0.6]])
    sigma = jnp.asarray([[0.2, 0.15, 0.25], [0.1, 0.2, 0.15]])
    zs = jax.random.normal(key, (20_000, 2, 3))
    ys = mu[None, :, :] + sigma[None, :, :] * zs
    v2 = float(qehvi_mc_max(ys, front, ref))
    v1 = float(qehvi_mc_max(ys[:, :1, :], front, ref))
    assert v2 >= v1 - 1e-9


def test_ehvi_3d_differentiable():
    front = jnp.asarray(-FRONT3_MIN)
    ref = jnp.asarray(-REF3_MIN)
    g = jax.grad(lambda m: ehvi_3d_max(m, jnp.asarray([0.2, 0.2, 0.2]),
                                       front, ref))(
        jnp.asarray([-0.4, -0.4, -0.4]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0.0)


def test_native_3d_matches_device():
    """Host C++ cell-grid vs device box decomposition (the reference
    cross-validates its slice-update scheme the same way)."""
    from limbo_tpu.native import ehvi3d_host

    front = -FRONT3_MIN
    ref = -REF3_MIN
    mus = np.array([[-0.4, -0.5, -0.45], [-0.1, -0.9, -0.5],
                    [-0.9, -0.9, -0.9]])
    sigmas = np.array([[0.2, 0.15, 0.25], [0.3, 0.1, 0.2],
                       [0.05, 0.05, 0.05]])
    host = ehvi3d_host(mus, sigmas, front, ref)
    for i in range(len(mus)):
        dev = float(ehvi_3d_max(jnp.asarray(mus[i]), jnp.asarray(sigmas[i]),
                                jnp.asarray(front), jnp.asarray(ref)))
        assert abs(host[i] - dev) < 1e-8 * max(1.0, abs(dev)), (host[i], dev)
