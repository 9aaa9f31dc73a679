"""Worker process for the 2-process jax.distributed loopback test.

Run as:  python multihost_worker.py <process_id> <num_processes> <port>
Each process hosts 4 virtual CPU devices, so 2 processes form an 8-device
global mesh — the same topology (hosts x local devices) a DCN-connected TPU
pod presents, with Gloo standing in for DCN.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.parallel import multihost
from limbo_tpu.parallel.sharded import sharded_restart_opt


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    info = multihost.initialize(coordinator_address=f"localhost:{port}",
                                num_processes=nproc, process_id=pid)
    assert info["num_processes"] == nproc, info
    assert info["global_devices"] == 4 * nproc, info

    # ---- cross-host restart fan-out + global argmax (DCN all_gather) ----
    mesh = multihost.global_mesh(axis_name="restarts")
    target = jnp.asarray([0.3, 0.7], dtype=jnp.float32)

    def fun(x):
        return -jnp.sum((x - target) ** 2)

    res = sharded_restart_opt(mesh, Rprop(iterations=60), fun,
                              jnp.full((2,), 0.5, dtype=jnp.float32),
                              jax.random.PRNGKey(0), True,
                              restarts_per_device=2)
    x = np.asarray(res.x)
    assert np.allclose(x, np.asarray(target), atol=1e-2), x

    # ---- 2-D (hosts, devices) mesh: psum over both axes ----
    mesh2 = multihost.host_data_mesh()
    total = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(jax.lax.psum(jnp.sum(a), "hosts"), "devices"),
        mesh=mesh2, in_specs=P("hosts", "devices"), out_specs=P(),
        check_vma=False))(
            jnp.ones((nproc, 4), dtype=jnp.float32))
    assert float(total) == 4 * nproc, total

    print(f"WORKER_OK {pid}", flush=True)
    multihost.shutdown()


if __name__ == "__main__":
    main()
