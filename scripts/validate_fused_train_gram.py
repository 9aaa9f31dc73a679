"""Real-TPU validation of the fused training-covariance Pallas kernel.

Checks, for each radial form at a capacity-padded size:
  * Mosaic compiles and runs gram_train_pallas on the hardware;
  * output matches the unfused jnp reference (train_assemble path) to f32
    matmul tolerance;
  * autodiff through the dispatcher (custom VJP, reference backward) is
    finite and matches the reference gradient;
  * timing vs the unfused path at n=10240 (fit-path matrix build).

Usage: python scripts/validate_fused_train_gram.py [N [n]]
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.ops.gram import _TRAIN_REFS, gram_train_masked
from limbo_tpu.ops.gram_pallas import gram_train_pallas


def log(msg):
    print(f"[fused-train] {msg}", file=sys.stderr, flush=True)


def main(N=2048, n=1900):
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    d = 8
    X = jnp.asarray(rng.uniform(size=(N, d)), dtype=jnp.float32)
    X = X.at[n:].set(0.0)
    sf2 = jnp.asarray(1.7, jnp.float32)
    inv_l = jnp.asarray(2.3, jnp.float32)
    diag_add = jnp.asarray(0.01 + 1e-6, jnp.float32)
    nf = jnp.asarray(n, jnp.float32)

    for form in ("se", "matern32", "matern52"):
        fused = jax.jit(lambda X: gram_train_pallas(
            X, sf2, inv_l, diag_add, nf, form=form))(X)
        ref = jax.jit(lambda X: _TRAIN_REFS[form](
            X, sf2, inv_l, diag_add, nf))(X)
        err = float(jnp.max(jnp.abs(fused - ref)))
        assert err < 1e-5 * float(sf2), (form, err)
        # grad through the public dispatcher (custom VJP)
        gfn = jax.jit(jax.grad(lambda X: jnp.sum(
            gram_train_masked(form, X, sf2, inv_l, diag_add, n) ** 2)))
        gref = jax.jit(jax.grad(lambda X: jnp.sum(
            _TRAIN_REFS[form](X, sf2, inv_l, diag_add, nf) ** 2)))
        ga, gb = gfn(X), gref(X)
        gerr = float(jnp.max(jnp.abs(ga - gb)))
        denom = float(jnp.max(jnp.abs(gb))) + 1e-12
        assert gerr / denom < 1e-4, (form, gerr, denom)
        log(f"{form:9s} fwd max|err| {err:.2e}  grad rel err {gerr/denom:.2e}  OK")

    # timing at bench size
    Nb = 10240
    Xb = jnp.asarray(rng.uniform(size=(Nb, d)), dtype=jnp.float32)
    nb = jnp.asarray(Nb - 200, jnp.float32)
    f_fused = jax.jit(lambda X: gram_train_pallas(
        X, sf2, inv_l, diag_add, nb, form="se"))
    f_ref = jax.jit(lambda X: _TRAIN_REFS["se"](X, sf2, inv_l, diag_add, nb))
    for name, f in (("fused", f_fused), ("unfused", f_ref)):
        out = f(Xb); float(out[0, 0])          # compile + sync
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = f(Xb)
        float(out[0, 0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        gbps = (Nb * Nb * 4) / (dt / 1e3) / 1e9
        log(f"{name:8s} n={Nb}: {dt:6.2f} ms  ({gbps:.0f} GB/s write)")
    print("FUSED TRAIN GRAM VALIDATION PASSED")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
