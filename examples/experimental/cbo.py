"""Constrained BO example (mirrors src/examples/experimental/cbo.cpp):
maximize a 1-D objective subject to a binary feasibility constraint."""

import jax
import numpy as np

from limbo_tpu.bo.cbo import CBOptimizer
from limbo_tpu.bo.stop import MaxIterations


def eval_fn(x):
    """Returns [objective, constraint]; constraint obs 1 = feasible."""
    v = float(np.atleast_1d(x)[0])
    obj = np.exp(-((v - 0.8) ** 2) / 0.05)
    feasible = 1.0 if v < 0.6 else 0.0
    return np.array([obj, feasible])


def main():
    bo = CBOptimizer(nb_constraints=1, stop=(MaxIterations(30),))
    bo.optimize(eval_fn, dim=1, key=jax.random.PRNGKey(0))
    print("best feasible sample:", bo.best_sample,
          "obs:", bo.best_observation)


if __name__ == "__main__":
    main()
