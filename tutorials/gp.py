"""GP regression tutorial (mirrors src/tutorials/gp.cpp:46-135):

fit a GP to noisy cos(x) samples, query a dense grid, hyperparameter-optimize
an ARD variant, and save/load the model.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from limbo_tpu.kernels import Exp, SquaredExpARD
from limbo_tpu.means import DataMean
from limbo_tpu.models import gp as gp_mod
from limbo_tpu.models.hp_opt import KernelLFOpt
from limbo_tpu.opt import Rprop
from limbo_tpu.utils.serialize import TextArchive, load_gp, save_gp


def main():
    rng = np.random.default_rng(0)
    N = 40
    X = jnp.asarray(rng.uniform(0, 1, size=(N, 1)), dtype=jnp.float32)
    Y = jnp.asarray(np.cos(10 * np.asarray(X))
                    + 0.1 * rng.normal(size=(N, 1)), dtype=jnp.float32)

    # 1) basic GP with a fixed-hyperparameter Exp kernel
    gp = gp_mod.fit(Exp.create(noise=1e-2, l=0.15), DataMean.create(), X, Y)
    Xq = jnp.linspace(0, 1, 100, dtype=jnp.float32)[:, None]
    mu, var = gp_mod.query(gp, Xq)
    print("basic GP: mean abs error",
          float(jnp.mean(jnp.abs(mu[:, 0] - jnp.cos(10 * Xq[:, 0])))))

    # 2) ARD kernel + likelihood-maximized hyperparameters
    gp_ard = gp_mod.fit(SquaredExpARD.create(dim=1), DataMean.create(), X, Y)
    gp_ard = KernelLFOpt(optimizer=Rprop(iterations=150))(
        gp_ard, jax.random.PRNGKey(0))
    mu2, _ = gp_mod.query(gp_ard, Xq)
    print("ARD GP (hp-opt): mean abs error",
          float(jnp.mean(jnp.abs(mu2[:, 0] - jnp.cos(10 * Xq[:, 0])))))
    print("log-lik:", float(gp_mod.log_lik(gp_ard)))

    # 3) serialization round trip (gp.cpp:120-135; the reference saves to
    # ./myGP — use a temp dir so repeated runs don't litter the cwd)
    import tempfile
    mydir = os.path.join(tempfile.mkdtemp(), "myGP")
    save_gp(gp_ard, mydir, archive=TextArchive)
    template = gp_mod.empty(SquaredExpARD.create(dim=1), DataMean.create(),
                            dim_in=1, capacity=gp_ard.capacity)
    gp_loaded = load_gp(template, mydir)
    mu3, _ = gp_mod.query(gp_loaded, Xq)
    assert float(jnp.max(jnp.abs(mu3 - mu2))) < 1e-6
    print("saved + loaded OK")


if __name__ == "__main__":
    main()
