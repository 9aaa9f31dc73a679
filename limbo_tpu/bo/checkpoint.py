"""BO run checkpoint/resume.

Reference capability: limbo's two resume mechanisms (SURVEY section 5) —
model serialization (serialize/*_archive.hpp) plus `optimize(reset=false)`
loop resumption keeping samples and total_iterations (bo_base.hpp:249-260).

Here a checkpoint is a directory: the GP pytree (utils.serialize) plus a
small JSON of loop state (iteration counters, PRNG key), restoring a BOState
that `BOptimizer.optimize(..., reset=False, state=...)` continues from.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.bo.optimizer import BOState
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.utils.serialize import BinaryArchive, load_gp, save_gp


def save_state(state: BOState, directory: str,
               archive=BinaryArchive) -> None:
    os.makedirs(directory, exist_ok=True)
    save_gp(state.gp, os.path.join(directory, "model"), archive=archive)
    meta = {
        "iteration": int(state.iteration),
        "total_iterations": int(state.total_iterations),
        "key": np.asarray(jax.random.key_data(state.key)).tolist()
        if hasattr(jax.random, "key_data") else np.asarray(state.key).tolist(),
    }
    with open(os.path.join(directory, "state.json"), "w") as fh:
        json.dump(meta, fh)


def load_state(template_gp: gp_mod.GP, directory: str,
               aggregator=None) -> BOState:
    gp = load_gp(template_gp, os.path.join(directory, "model"))
    with open(os.path.join(directory, "state.json")) as fh:
        meta = json.load(fh)
    # raw uint32 key arrays work directly with jax.random APIs
    key = jnp.asarray(np.asarray(meta["key"], dtype=np.uint32))
    from limbo_tpu.acqui.acqui import FirstElem

    state = BOState(gp=gp, key=key,
                    aggregator=aggregator if aggregator is not None else FirstElem)
    state.iteration = meta["iteration"]
    state.total_iterations = meta["total_iterations"]
    return state
