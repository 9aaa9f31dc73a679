"""Collective-volume audit (parallel/comm_audit.py): the per-iteration
psum/all_gather payloads of the sharded pipeline, pinned to closed forms.

On one chip nothing multi-device can be timed, but the communication
volume is statically derivable — these tests assert the audited volumes
of sharded_chol/sharded_big programs match the formulas documented in
docs/BENCHMARKS.md, so any accidental extra collective (e.g. an
all_gather of a full panel) fails loudly.
"""

import jax
import jax.numpy as jnp
import pytest

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.parallel.comm_audit import collective_volume
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded_big import sharded_cache_from_fit
from limbo_tpu.parallel.sharded_chol import sharded_fit

F32 = jnp.float32
WORD = 4


def test_audit_tool_exact_counts():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8, axis_name="r")

    def body(x):
        s = jax.lax.psum(x @ x.T, "r")            # (8, 8) psum
        g = jax.lax.all_gather(x[0], "r")         # (8, 16) gathered
        return s, g

    f = jax.shard_map(body, mesh=mesh, in_specs=(P("r", None),),
                      out_specs=(P(), P()), check_vma=False)
    stats = collective_volume(f, jnp.ones((64, 16), F32))
    assert stats["psum"] == {"count": 1, "bytes": 8 * 8 * WORD}
    assert stats["all_gather"] == {"count": 1, "bytes": 8 * 16 * WORD}


def test_audit_cond_counts_worst_branch_once():
    def f(x):
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(8, axis_name="r")

        def body(x):
            return jax.lax.cond(
                x[0, 0] > 0,
                lambda: jax.lax.psum(x, "r"),             # (8, 4): 128 B
                lambda: jax.lax.psum(x[:1], "r") * jnp.ones_like(x))  # 16 B
        return jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                             out_specs=P(), check_vma=False)(x)

    stats = collective_volume(f, jnp.ones((8, 4), F32))
    # only the heavier branch is charged, once
    assert stats["psum"] == {"count": 1, "bytes": 8 * 4 * WORD}


def _make_fit(N, block, d=3, p=1, n_dev=8):
    mesh = make_mesh(n_dev, axis_name="rows")
    kx = jax.random.PRNGKey(0)
    X = jax.random.uniform(kx, (N, d), dtype=F32)
    Y = jnp.sin(jnp.sum(X, axis=1, keepdims=True)) * jnp.ones((1, p))
    kernel = SquaredExpARD.create(dim=d, dtype=F32)
    mean = DataMean.create(dim_out=p, dtype=F32)
    return mesh, kernel, mean, X, Y


def fit_words(N, B, p):
    """sharded_fit psum payload in f32 words (docs/BENCHMARKS.md):
    factor strips B^2*k for k=1..nb-1 + nb diagonal blocks B^2
    + forward/backward solves 2*nb*(B*p) + the logdet scalar."""
    nb = N // B
    return (B * B * nb * (nb - 1) // 2 + nb * B * B
            + 2 * nb * B * p + 1)


@pytest.mark.parametrize("N,B,p", [(64, 8, 1), (128, 16, 2)])
def test_sharded_fit_volume_matches_formula(N, B, p):
    mesh, kernel, mean, X, Y = _make_fit(N, B, p=p)
    stats = collective_volume(
        lambda X, Y: sharded_fit(mesh, kernel, mean, X, Y, block=B,
                                 axis="rows"), X, Y)
    assert set(stats) == {"psum"}            # no other collective families
    assert stats["psum"]["bytes"] == WORD * fit_words(N, B, p)


def cache_words(N, B, p, n_dev, strip=2048):
    """sharded_cache_from_fit: every K^{-1} panel is n_loc columns solved
    by distributed two-triangular solves (2*N words per column), all
    devices cooperating on every strip, + one exact (y|1) solve."""
    from limbo_tpu.models.gp import _panel_width

    nloc = N // n_dev
    w_s = _panel_width(nloc, strip)
    strips = nloc // w_s
    per_panel = strips * 2 * N * w_s
    return n_dev * per_panel + 2 * N * (p + 1)


@pytest.mark.parametrize("N,B,p", [(64, 8, 1), (128, 16, 2)])
def test_big_cache_volume_matches_formula(N, B, p):
    mesh, kernel, mean, X, Y = _make_fit(N, B, p=p)
    sgp = sharded_fit(mesh, kernel, mean, X, Y, block=B, axis="rows")
    stats = collective_volume(
        lambda s: sharded_cache_from_fit(mesh, s, defer_m=4), sgp)
    assert set(stats) == {"psum"}
    assert stats["psum"]["bytes"] == WORD * cache_words(N, B, p, 8)


def add_words(N, B, p, n_dev):
    """_big_add: pivot = forward + backward distributed solves against the
    factor (2*N words at q=1), one (B, B) diagonal-block refresh psum, and
    the worst-case (flush) branch's (N, p+1) alpha re-derivation psum."""
    return 2 * N + B * B + N * (p + 1)


@pytest.mark.parametrize("N,B,p", [(64, 8, 1), (128, 16, 2)])
def test_big_add_volume_matches_formula(N, B, p):
    from jax.sharding import PartitionSpec as P

    from limbo_tpu.parallel.sharded_big import _big_add, _specs

    mesh, kernel, mean, X, Y = _make_fit(N, B, p=p)
    sgp = sharded_fit(mesh, kernel, mean, X, Y, n=jnp.asarray(N - 4),
                      block=B, axis="rows")
    big = sharded_cache_from_fit(mesh, sgp, defer_m=4)
    spec = _specs(big)
    x_new = jnp.full((X.shape[1],), 0.5, F32)
    y_new = jnp.zeros((p,), F32)

    def add(big, x, y):
        return jax.shard_map(
            lambda b, x, y: _big_add(b, x, y, b.axis),
            mesh=mesh, check_vma=False,
            in_specs=(spec, P(), P()), out_specs=spec)(big, x, y)

    stats = collective_volume(add, big, x_new, y_new)
    assert set(stats) == {"psum"}
    assert stats["psum"]["bytes"] == WORD * add_words(N, B, p, 8)
