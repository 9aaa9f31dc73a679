"""Device-mesh utilities — the framework's distribution layer.

The reference has NO distributed communication (limbo is single-process
shared-memory; its only multi-node story is communication-free replication
via cluster job scripts, waf_tools/limbo.py:169-357).  Here distribution is
first-class: a `jax.sharding.Mesh` plus collectives over ICI/DCN replace TBB
threads (tools/parallel.hpp) *and* the job-array layer.

Axis naming convention:
  "restarts" — acquisition restart / candidate fan-out (data-parallel);
  "rows"     — kernel-matrix row sharding for large-n regression
               (tensor-parallel-style with psum reductions).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "restarts") -> Mesh:
    """1-D mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def make_mesh_2d(n_restarts: int, n_rows: int) -> Mesh:
    devs = np.array(jax.devices()[: n_restarts * n_rows])
    return Mesh(devs.reshape(n_restarts, n_rows), ("restarts", "rows"))


def shard_batch(mesh: Mesh, axis: str = "restarts") -> NamedSharding:
    """Sharding for a leading batch axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
