import time, sys
import jax, jax.numpy as jnp, numpy as np
from limbo_tpu.ops.gram_pallas import gram_pallas
from limbo_tpu.ops.gram import se_gram_ref

def log(m): print(m, file=sys.stderr, flush=True)

n, d = 10240, 8
key = jax.random.PRNGKey(0)
X = jax.random.uniform(key, (n, d), dtype=jnp.float32)
sf2 = jnp.asarray(1.0, jnp.float32); il = jnp.asarray(1.0, jnp.float32)

palj = jax.jit(lambda X: jnp.sum(gram_pallas(X, X, sf2, il, form="se"), axis=1))
t0=time.perf_counter(); o=palj(X); _=np.asarray(o[0])
log(f"pallas gram compile+run: {time.perf_counter()-t0:.1f}s")
for i in range(3):
    t0=time.perf_counter(); o=palj(X+(i+1)*1e-7); _=np.asarray(o[0])
    log(f"pallas gram steady: {time.perf_counter()-t0:.3f}s")

refj = jax.jit(lambda X: jnp.sum(se_gram_ref(X, X, sf2), axis=1))
t0=time.perf_counter(); o=refj(X); _=np.asarray(o[0])
log(f"jnp gram compile+run: {time.perf_counter()-t0:.1f}s")
for i in range(3):
    t0=time.perf_counter(); o=refj(X+(i+1)*1e-7); _=np.asarray(o[0])
    log(f"jnp gram steady: {time.perf_counter()-t0:.3f}s")

# pure write-bandwidth calibration: broadcast fill of the same size
fillj = jax.jit(lambda s: jnp.sum(jnp.full((n, n), s, jnp.float32), axis=1))
o=fillj(jnp.asarray(1.0)); _=np.asarray(o[0])
for i in range(3):
    t0=time.perf_counter(); o=fillj(jnp.asarray(float(i))); _=np.asarray(o[0])
    log(f"fill+sum 10240^2 steady: {time.perf_counter()-t0:.3f}s")
