"""Weak-scaling benchmark over the device mesh (SURVEY.md §2.4).

Measures, across 1..N devices (virtual CPU devices by default — set
JAX_PLATFORMS/XLA_FLAGS accordingly; on a real slice the same code rides
ICI):

  * restart axis: `sharded_restart_opt` with a fixed per-device restart
    budget (weak scaling) — reports restarts/s and parallel efficiency
    vs the 1-device rate;
  * rows axis: `row_sharded_posterior_mean` with fixed rows per device —
    reports effective GFLOP/s of the psum-reduced kernel matvec.

Writes scaling_results/scaling.json (+ a markdown table on stdout).

NOTE when run with virtual devices: efficiency is only meaningful up to the
physical core count (this image: 4 cores for 8 virtual devices) — virtual
devices beyond that timeshare cores by construction.  The json records
`physical_cores` so the table can be read honestly.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py [out_dir]
"""

import json
import os
import sys
import time

# one thread per virtual device: XLA CPU otherwise multithreads even a
# single device across every core, which would inflate the 1-device
# baseline and make weak-scaling efficiency meaningless on one host
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_multi_thread_eigen" not in _flags:
    _flags += " --xla_cpu_multi_thread_eigen=false"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.opt.gradient import Rprop
from limbo_tpu.parallel.mesh import make_mesh
from limbo_tpu.parallel.sharded import (row_sharded_posterior_mean,
                                        sharded_restart_opt)


def _time(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_restarts(nd: int, restarts_per_device: int = 512,
                   ascent_steps: int = 100, d: int = 6):
    mesh = make_mesh(nd, axis_name="restarts")
    target = jnp.linspace(0.2, 0.8, d)

    def fun(x):
        return -jnp.sum((x - target) ** 2)

    sub = Rprop(iterations=ascent_steps)
    key = jax.random.PRNGKey(0)
    init = jnp.full((d,), 0.5, dtype=jnp.float32)

    run = jax.jit(lambda k: sharded_restart_opt(
        mesh, sub, fun, init, k, True,
        restarts_per_device=restarts_per_device))
    t = _time(run, key)
    total = nd * restarts_per_device
    return total / t, t


def bench_rows(nd: int, rows_per_device: int = 4096, d: int = 16,
               q: int = 1024):
    mesh = make_mesh(nd, axis_name="rows")
    N = nd * rows_per_device
    key = jax.random.PRNGKey(1)
    kx, ka, kq = jax.random.split(key, 3)
    X = jax.random.uniform(kx, (N, d), dtype=jnp.float32)
    alpha = jax.random.normal(ka, (N, 1), dtype=jnp.float32)
    Xq = jax.random.uniform(kq, (q, d), dtype=jnp.float32)
    mean_q = jnp.zeros((q, 1), dtype=jnp.float32)
    kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)

    run = jax.jit(lambda X, a, Xq: row_sharded_posterior_mean(
        mesh, kernel, X, a, mean_q, Xq, axis="rows"))
    t = _time(run, X, alpha, Xq)
    # gram build ~ q*N*(3d) flops + matvec 2*q*N
    flops = q * N * (3 * d + 2)
    return flops / t / 1e9, t


def bench_big_iter(nd: int, rows_per_device: int = 256, block: int = 64,
                   d: int = 4):
    """Weak scaling of the beyond-one-chip BO iterate (sharded_big):
    N grows with the mesh at fixed rows/device.  Reports per-iteration
    wall time and the statically audited per-device psum payload — the
    only multi-chip perf evidence derivable on a one-chip host."""
    from limbo_tpu.acqui.acqui import UCB
    from limbo_tpu.kernels import SquaredExpARD as SE
    from limbo_tpu.means import DataMean
    from limbo_tpu.opt.compose import RandomRestarts
    from limbo_tpu.parallel.comm_audit import collective_volume
    from limbo_tpu.parallel.sharded_big import (make_big_bo_iter,
                                                sharded_cache_from_fit)
    from limbo_tpu.parallel.sharded_chol import sharded_fit

    mesh = make_mesh(nd, axis_name="rows")
    N = nd * rows_per_device
    n = N - 8
    key = jax.random.PRNGKey(2)
    kx, kstep = jax.random.split(key)
    X = jax.random.uniform(kx, (N, d), dtype=jnp.float32)
    Y = jnp.sin(3.0 * jnp.sum(X, axis=1, keepdims=True))
    kernel = SE.create(dim=d, dtype=jnp.float32)
    sgp = sharded_fit(mesh, kernel, DataMean.create(dim_out=1,
                                                    dtype=jnp.float32),
                      X, Y, n=jnp.asarray(n), block=block, axis="rows")
    big = sharded_cache_from_fit(mesh, sgp, defer_m=16)
    it = make_big_bo_iter(
        mesh, lambda x: jnp.sin(jnp.sum(x))[None], UCB(alpha=0.5),
        RandomRestarts(sub=Rprop(iterations=10), repeats=8,
                       sweep_samples=64))
    run = jax.jit(lambda b, k: it(b, k, jnp.asarray(0)))
    t = _time(run, big, kstep, reps=5)
    audit = collective_volume(lambda b, k: it(b, k, jnp.asarray(0)),
                              big, kstep)
    psum = audit.get("psum", {"count": 0, "bytes": 0})
    return t, psum


def main(out_dir: str = "scaling_results"):
    os.makedirs(out_dir, exist_ok=True)
    n_dev = len(jax.devices())
    cores = os.cpu_count()
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    results = {"platform": jax.default_backend(),
               "devices": n_dev, "physical_cores": cores,
               "restart_axis": {}, "rows_axis": {}}
    results["big_iter_axis"] = {}
    base_rate = None
    print("| devices | restarts/s | efficiency | matvec GFLOP/s |"
          " big-iter ms (N) | psum KiB/iter |")
    print("|---|---|---|---|---|---|")
    for nd in sizes:
        rate, t = bench_restarts(nd)
        gfs, t2 = bench_rows(nd)
        t_big, psum = bench_big_iter(nd)
        if base_rate is None:
            base_rate = rate
        eff = rate / (nd * base_rate)
        results["restart_axis"][str(nd)] = {
            "restarts_per_s": rate, "time_s": t, "efficiency": eff}
        results["rows_axis"][str(nd)] = {"gflops": gfs, "time_s": t2}
        results["big_iter_axis"][str(nd)] = {
            "iter_s": t_big, "N": nd * 256,
            "psum_count": psum["count"], "psum_bytes": psum["bytes"]}
        print(f"| {nd} | {rate:.1f} | {eff*100:.0f}% | {gfs:.2f} "
              f"| {t_big*1e3:.1f} (N={nd*256}) "
              f"| {psum['bytes']/1024:.0f} |")
    with open(os.path.join(out_dir, "scaling.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_dir}/scaling.json")


if __name__ == "__main__":
    main(*sys.argv[1:])
