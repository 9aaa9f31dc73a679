"""Basic BO tutorial (mirrors src/tutorials/basic_example.cpp):
maximize a simple 1-D function with all defaults."""

import jax
import numpy as np

from limbo_tpu.bo import BOptimizer, MaxIterations


def eval_fn(x):
    return np.array([-(np.atleast_1d(x)[0] - 0.75) ** 2])


if __name__ == "__main__":
    bo = BOptimizer(stop=(MaxIterations(30),), stats_enabled=False)
    state = bo.optimize(eval_fn, dim_in=1, key=jax.random.PRNGKey(0))
    print("best sample:", state.best_sample, "->", state.best_value)
