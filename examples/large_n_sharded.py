"""BO past one chip's HBM with the plain BOptimizer surface.

`DistributedBOptimizer(mesh, ...)` is the user-facing wrapper over the
sharded large-n stack (row-sharded Cholesky fit -> column-sharded K^{-1}
panels -> distributed-solve appends): same optimize/ask/tell/stats/stop
surface as BOptimizer, model sharded over the mesh so no N x N buffer
lives on one device.  An 8-device v5e slice holds n ~ 100k where one chip
tops out near 32k (docs/BENCHMARKS.md large-n ladder).

Runnable anywhere: on a CPU host this demonstrates the API on a virtual
8-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8); on a
TPU slice the same code uses the real chips.
"""

import os

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", "") and len(os.environ.get("JAX_PLATFORMS", "")) == 0:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

from limbo_tpu.acqui.acqui import UCB
from limbo_tpu.bo.distributed import DistributedBOptimizer
from limbo_tpu.bo.init_designs import RandomSampling
from limbo_tpu.bo.stop import MaxIterations
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.parallel.mesh import make_mesh


def objective(x):
    """Host-evaluated objective (a robot episode, a simulation, ...)."""
    x = np.asarray(x)
    return -np.sum((x - 0.3) ** 2)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, axis_name="rows")
    # block=8 keeps this demo's capacity small; production uses the
    # default block=256 (capacity rounds to n_dev * block multiples)
    bo = DistributedBOptimizer(
        mesh, block=8,
        acqui=UCB(alpha=0.5),
        acqui_optimizer=RandomRestarts(sub=Rprop(iterations=10),
                                       repeats=4, sweep_samples=64),
        init=RandomSampling(20),
        stop=(MaxIterations(10),),
        stats_enabled=False)
    state = bo.optimize(objective, dim_in=3, key=jax.random.PRNGKey(0))
    print(f"devices: {n_dev}, capacity: {state.gp.capacity} "
          f"(factor sharded {n_dev} x {state.gp.capacity // n_dev} rows)")
    print(f"n = {int(state.gp.n)}, best = {state.best_value:.5f} "
          f"at {state.best_sample}")


if __name__ == "__main__":
    main()
