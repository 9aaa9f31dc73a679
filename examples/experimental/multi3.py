"""3-objective EHVI BO on DTLZ2 — the exact 3-D EHVI loop.

The reference only ships 2-objective EHVI examples (its exact 3-D
calculator, src/ehvi/ehvi_sliceupdate.cc, is reachable but unused by
examples); here the device box-decomposition EHVI (limbo_tpu/ops/ehvi.py)
drives a 3-objective run end to end.
"""

import jax
import numpy as np

from limbo_tpu.bo.multi import Ehvi
from limbo_tpu.bo.stop import MaxIterations


def dtlz2_3(x):
    """DTLZ2 with 3 objectives on [0,1]^d (maximization as -f)."""
    x = np.asarray(x, dtype=np.float64)
    g = np.sum((x[2:] - 0.5) ** 2)
    c1, s1 = np.cos(0.5 * np.pi * x[0]), np.sin(0.5 * np.pi * x[0])
    c2, s2 = np.cos(0.5 * np.pi * x[1]), np.sin(0.5 * np.pi * x[1])
    f1 = (1 + g) * c1 * c2
    f2 = (1 + g) * c1 * s2
    f3 = (1 + g) * s1
    return np.array([-f1, -f2, -f3])


def main():
    print("== exact 3-D EHVI on DTLZ2 (3 objectives) ==")
    ehvi = Ehvi(ref=(-1.2, -1.2, -1.2), stop=(MaxIterations(15),))
    Xp, Yp = ehvi.optimize(dtlz2_3, dim=3, key=jax.random.PRNGKey(0))
    print(f"front size: {len(Xp)}")
    # every front point should be near the unit sphere (the DTLZ2 front)
    radii = np.linalg.norm(Yp, axis=1)
    print(f"front radii: min={radii.min():.3f} max={radii.max():.3f} "
          f"(true front: 1.0)")


if __name__ == "__main__":
    main()
