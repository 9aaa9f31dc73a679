"""Multi-host execution: jax.distributed bring-up + cross-host meshes.

The reference's only multi-node story is communication-free cluster
replication (waf_tools/limbo.py:169-357 writes per-replicate job scripts for
OAR/Torque).  The TPU-native design replaces that with a first-class
distributed backend (SURVEY.md §2.4): every host calls
`jax.distributed.initialize`, after which the global device mesh spans all
hosts — ICI collectives inside a slice, DCN across hosts — and one experiment
(or a batched restart sweep) shards over everything.

Bring-up resolves coordinates in this order:
  1. explicit arguments,
  2. SLURM environment (SLURM_JOB_NODELIST / SLURM_PROCID / SLURM_NTASKS —
     what experiment/launcher.py's generated sbatch scripts provide),
  3. single-process fallback (no-op, local devices only).

Verified by a real 2-process Gloo loopback test on CPU
(tests/test_multihost.py) — the same code path TPU pods take over DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def is_initialized() -> bool:
    return _INITIALIZED


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None,
               port: int = 12321) -> dict:
    """Bring up the cross-host runtime; safe to call in single-process runs.

    Returns a summary dict {num_processes, process_id, local_devices,
    global_devices} for logging.  ≙ the reference's `mpirun` launch prefix
    slot (waf_tools/limbo.py:186), except processes actually form one
    communicator instead of running in isolation.
    """
    global _INITIALIZED
    if coordinator_address is None and "SLURM_JOB_NODELIST" in os.environ:
        nodelist = os.environ["SLURM_JOB_NODELIST"]
        head = _first_slurm_node(nodelist)
        coordinator_address = f"{head}:{port}"
        num_processes = (num_processes if num_processes is not None
                         else int(os.environ.get("SLURM_NTASKS", "1")))
        process_id = (process_id if process_id is not None
                      else int(os.environ.get("SLURM_PROCID", "0")))
    # With an explicit coordinator, always join — jax.distributed can infer
    # num_processes itself; skipping on `num_processes is None` would
    # silently leave the caller as an isolated single-process run.  Only the
    # explicit single-process case (num_processes=1) is a no-op.
    if coordinator_address is not None and num_processes != 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
        _INITIALIZED = True
    return {
        "num_processes": jax.process_count(),
        "process_id": jax.process_index(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def shutdown() -> None:
    global _INITIALIZED
    if _INITIALIZED:
        jax.distributed.shutdown()
        _INITIALIZED = False


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist ('n[001-004]' -> 'n001').

    Minimal expansion (no scontrol dependency): handles 'a,b', 'pre[x-y]',
    and plain hostnames.
    """
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        first = rng.split("-")[0].split(",")[0].rstrip("]")
        return prefix + first
    return head


def global_mesh(axis_name: str = "devices"):
    """A 1-D mesh over every device on every host (restart fan-out axis)."""
    from jax.sharding import Mesh

    return Mesh(jax.devices(), (axis_name,))


def host_data_mesh(replicate_axis: str = "hosts", device_axis: str = "devices"):
    """A 2-D (hosts, devices-per-host) mesh: DCN-friendly outer axis for
    replicate/restart parallelism, ICI inner axis for sharded algebra."""
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = max(1, len(devs) // n_local)
    return Mesh(devs.reshape(n_hosts, n_local), (replicate_axis, device_axis))
