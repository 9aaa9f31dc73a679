"""Compare restart/depth tradeoffs for the bo_iter acquisition search."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from limbo_tpu.kernels import SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.opt.compose import RandomRestarts
from limbo_tpu.opt.gradient import Rprop

def log(m): print(m, file=sys.stderr, flush=True)

n, d = 10240, 8
key = jax.random.PRNGKey(0)
kx, ky = jax.random.split(key)
X = jax.random.uniform(kx, (n-30, d), dtype=jnp.float32)
Y = jnp.sin(3*jnp.sum(X, axis=1, keepdims=True))
kernel = SquaredExpARD.create(dim=d, dtype=jnp.float32)
mean = DataMean.create(dim_out=1, dtype=jnp.float32)
gp = jax.jit(lambda X, Y: gp_mod.fit(kernel, mean, X, Y, capacity=n))(X, Y)
float(gp.L[0,0]); log("fit done")
cache = jax.jit(gp_mod.QueryCache.build)(gp); float(cache.Kinv[0,0]); log("cache done")

def make(restarts, steps, sweep):
    opt = RandomRestarts(sub=Rprop(iterations=steps), repeats=restarts,
                         sweep_samples=sweep)
    @jax.jit
    def bo_iter(gp, cache, key):
        def acq(x):
            mu, var = gp_mod.query_cached(gp, cache, x[None, :])
            return mu[0,0] + 0.5*jnp.sqrt(var[0])
        res = opt(acq, jnp.full((d,), 0.5, jnp.float32), key, True)
        y = jnp.sin(3.0*jnp.sum(res.x))[None]
        return gp_mod.add_sample_cached(gp, cache, res.x, y)
    return bo_iter

for (r, s, w) in [(16, 60, 1024), (32, 30, 1024), (64, 15, 1024), (128, 8, 2048)]:
    f = make(r, s, w)
    g, c = f(gp, cache, key); float(g.L[0,0])
    t0 = time.perf_counter()
    g, c = gp, cache
    for i in range(10):
        g, c = f(g, c, jax.random.fold_in(key, i))
    float(g.n)
    log(f"restarts={r} steps={s} sweep={w}: {(time.perf_counter()-t0)/10*1e3:.1f} ms/iter")
