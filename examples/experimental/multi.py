"""Multi-objective BO on mop2 / zdt2 with EHVI, NSBO and ParEGO.

Mirrors src/examples/experimental/multi.cpp (Ehvi/Nsbo/Parego on the mop2
and zdt benchmark problems).  Objectives are MAXIMIZED (negated mop2).
"""

import jax
import numpy as np

from limbo_tpu.bo.multi import Ehvi, Nsbo, Parego
from limbo_tpu.bo.stop import MaxIterations


def mop2(x):
    """Classic mop2 (2 objectives, maximization as -f)."""
    x = np.asarray(x) * 4.0 - 2.0     # [0,1]^d -> [-2,2]^d
    n = len(x)
    f1 = 1.0 - np.exp(-np.sum((x - 1.0 / np.sqrt(n)) ** 2))
    f2 = 1.0 - np.exp(-np.sum((x + 1.0 / np.sqrt(n)) ** 2))
    return np.array([-f1, -f2])


def zdt2(x):
    x = np.asarray(x)
    f1 = x[0]
    g = 1.0 + 9.0 * np.mean(x[1:]) if len(x) > 1 else 1.0
    f2 = g * (1.0 - (f1 / g) ** 2)
    return np.array([-f1, -f2])


def main():
    print("== EHVI on mop2 ==")
    ehvi = Ehvi(ref=(-1.1, -1.1), stop=(MaxIterations(20),))
    Xp, Yp = ehvi.optimize(mop2, dim=2, key=jax.random.PRNGKey(0))
    print(f"front size: {len(Xp)}")

    print("== NSBO on mop2 ==")
    nsbo = Nsbo(n_objs=2, stop=(MaxIterations(10),))
    Xp, Yp = nsbo.optimize(mop2, dim=2, key=jax.random.PRNGKey(1))
    print(f"front size: {len(Xp)}")

    print("== ParEGO on zdt2 ==")
    parego = Parego(n_objs=2, iterations=15)
    Xp, Yp = parego.optimize(zdt2, dim=3, key=jax.random.PRNGKey(2))
    print(f"front size: {len(Xp)}")


if __name__ == "__main__":
    main()
