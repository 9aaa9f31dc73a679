"""Standalone inner-optimizer tutorial (mirrors src/tutorials/opt.cpp):
use the opt:: layer directly, without any GP/BO machinery."""

import jax
import jax.numpy as jnp

from limbo_tpu.opt import Cmaes, DirectL, GridSearch, ParallelRepeater, Rprop


def my_function(x):
    """Maximize -(x - 0.6)^2 over [0,1]^2 (differentiable)."""
    return -jnp.sum((x - 0.6) ** 2)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    init = jnp.full((2,), 0.5)
    for name, opt in [
        ("rprop", Rprop(iterations=100)),
        ("repeated rprop", ParallelRepeater(sub=Rprop(iterations=100),
                                            repeats=8)),
        ("grid", GridSearch(bins=20)),
        ("cmaes", Cmaes(iterations=60)),
        ("direct-l", DirectL(rounds=32, splits_per_round=8)),
    ]:
        res = opt(my_function, init, key, True)
        print(f"{name:16s} -> x={res.x} value={float(res.value):.6f}")
