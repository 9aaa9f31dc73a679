"""Model-protocol dispatch: one query entry point for every model family.

limbo's BO loop takes the model as a template parameter (modelfun<...>,
bo_base.hpp:113) so acquisitions work over GP, SparsifiedGP, SPGP, ...
Here the same genericity is a type dispatch: `query_any(model, Xq)` routes
to the family's query, so acquisitions and the BO driver accept any model.
"""

from __future__ import annotations

from typing import Tuple

import jax


def query_any(model, Xq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    from limbo_tpu.models import gp as gp_mod
    from limbo_tpu.models import iterative, multi_gp, sparse_gp, spgp

    if isinstance(model, gp_mod.GP):
        return gp_mod.query(model, Xq)
    if isinstance(model, gp_mod.CachedGPView):
        return gp_mod.query_cached(model.gp, model.cache, Xq)
    # sharded per-device views carry their query as a protocol method
    # (keeps the parallel layer unimported here, and renames fail loudly
    # at the view class instead of silently falling through a name check)
    query_posterior = getattr(model, "query_posterior", None)
    if query_posterior is not None:
        return query_posterior(Xq)
    if isinstance(model, sparse_gp.SparsifiedGP):
        return gp_mod.query(model.gp, Xq)
    if isinstance(model, spgp.SPGP):
        return spgp.query(model, Xq)
    if isinstance(model, multi_gp.MultiGP):
        return multi_gp.query(model, Xq)
    if isinstance(model, iterative.IterativeGP):
        return iterative.query(model, Xq)
    raise TypeError(f"unknown model type {type(model)}")


def add_sample_any(model, x, y):
    """Incremental update for families that support it."""
    from limbo_tpu.models import gp as gp_mod
    from limbo_tpu.models import multi_gp, sparse_gp

    if isinstance(model, gp_mod.GP):
        return gp_mod.add_sample(model, x, y)
    if isinstance(model, sparse_gp.SparsifiedGP):
        return sparse_gp.add_sample(model, x, y)
    if isinstance(model, multi_gp.MultiGP):
        return multi_gp.add_sample(model, x, y)
    from limbo_tpu.models import iterative, spgp

    if isinstance(model, spgp.SPGP):
        return spgp.add_sample(model, x, y)
    if isinstance(model, iterative.IterativeGP):
        return iterative.add_sample(model, x, y)
    raise TypeError(f"add_sample not supported for {type(model)}")
