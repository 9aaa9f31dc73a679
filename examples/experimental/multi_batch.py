"""Batch multi-objective BO: exact q-EHVI proposals on mop2.

Each iteration proposes a q-point batch by jointly maximizing the EXACT
q-EHVI (ops/ehvi.qehvi_exact_max: inclusion-exclusion over the shared box
decomposition, Gauss-Hermite over the true joint posterior covariance) —
the exact-batch capability of the reference's src/ehvi/ehvi_multi.cc
extended to joint proposals.  Useful when the objective can be evaluated
q at a time (parallel hardware runs, wet-lab batches).
"""

import jax
import numpy as np

from limbo_tpu.bo.multi import Ehvi
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.ops.pareto import hypervolume_2d


def mop2(x):
    x = np.asarray(x) * 4.0 - 2.0
    n = len(x)
    f1 = 1.0 - np.exp(-np.sum((x - 1.0 / np.sqrt(n)) ** 2))
    f2 = 1.0 - np.exp(-np.sum((x + 1.0 / np.sqrt(n)) ** 2))
    return np.array([-f1, -f2])


def main():
    import jax.numpy as jnp

    ref = (-1.1, -1.1)
    print("== exact q-EHVI (q=2) on mop2 ==")
    loop = Ehvi(ref=ref, q=2, gh_nodes=12, stop=(MaxIterations(10),))
    Xp, Yp = loop.optimize(mop2, dim=2, key=jax.random.PRNGKey(0))
    hv = float(hypervolume_2d(jnp.asarray(Yp), jnp.asarray(ref)))
    print(f"evaluations: {len(loop.X)} (10 init + 10 iters x q=2)")
    print(f"front size: {len(Xp)}, hypervolume vs ref {ref}: {hv:.4f}")


if __name__ == "__main__":
    main()
