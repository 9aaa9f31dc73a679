"""Mean-function library: Null, Constant, Data, FunctionARD.

A mean is a pytree dataclass with hyperparameters as fields; `mean(X)` maps a
(q, d) batch of inputs to (q, p) prior means.  Reference behaviour:
src/limbo/mean/mean.hpp:61 (BaseMean), constant.hpp:67, data.hpp:56,
null_function.hpp:56, function_ard.hpp:59.

Unlike limbo, means do not receive the GP as an argument; the one mean that
depends on the data (DataMean = mean of observations, data.hpp:63) is
refreshed by `prepare_mean` whenever the dataset changes — a pure-functional
version of limbo's `gp.mean_observation()` coupling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NullMean:
    """m(x) = 0 (limbo mean::NullFunction, null_function.hpp:56)."""

    dim_out: int = struct.field(pytree_node=False, default=1)

    @property
    def params(self) -> jax.Array:
        return jnp.zeros((0,))

    @property
    def params_size(self) -> int:
        return 0

    def with_params(self, p: jax.Array) -> "NullMean":
        return self

    def __call__(self, X: jax.Array) -> jax.Array:
        return jnp.zeros((X.shape[0], self.dim_out), dtype=X.dtype)


@struct.dataclass
class ConstantMean:
    """m(x) = c (limbo mean::Constant, constant.hpp:67; default c = 1).

    The constant is a hyperparameter (grad = 1) usable with mean optimization.
    """

    value: jax.Array  # scalar
    dim_out: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def create(cls, value: float = 1.0, dim_out: int = 1, dtype=jnp.float32):
        return cls(value=jnp.asarray(value, dtype=dtype), dim_out=dim_out)

    @property
    def params(self) -> jax.Array:
        return jnp.reshape(self.value, (1,))

    @property
    def params_size(self) -> int:
        return 1

    def with_params(self, p: jax.Array) -> "ConstantMean":
        return self.replace(value=p[0])

    def __call__(self, X: jax.Array) -> jax.Array:
        return jnp.full((X.shape[0], self.dim_out), self.value, dtype=X.dtype)


@struct.dataclass
class DataMean:
    """m(x) = mean of the observations (limbo mean::Data, data.hpp:56).

    `value` is refreshed by `prepare_mean` from the current (masked) dataset;
    it carries no optimizable hyperparameters.
    """

    value: jax.Array  # (p,)

    @classmethod
    def create(cls, dim_out: int = 1, dtype=jnp.float32):
        return cls(value=jnp.zeros((dim_out,), dtype=dtype))

    @property
    def dim_out(self) -> int:
        return self.value.shape[0]

    @property
    def params(self) -> jax.Array:
        return jnp.zeros((0,))

    @property
    def params_size(self) -> int:
        return 0

    def with_params(self, p: jax.Array) -> "DataMean":
        return self

    def __call__(self, X: jax.Array) -> jax.Array:
        return jnp.broadcast_to(self.value[None, :], (X.shape[0], self.value.shape[0])).astype(X.dtype)


@struct.dataclass
class FunctionARD:
    """Learned affine transform of an inner mean: m(x) = T [inner(x); 1].

    T is (p, p+1); initialised to [I | 0].  Parameter vector is T row-major
    followed by the inner mean's parameters, matching limbo mean::FunctionARD
    (function_ard.hpp:59-97: p[r * cols + c] = T(r, c)).
    """

    inner: object
    tr: jax.Array  # (p, p+1)

    @classmethod
    def create(cls, inner, dim_out: int = 1, dtype=None):
        if dtype is None:
            # follow the inner mean's dtype: a mixed-precision T would
            # change the pytree's dtypes under with_params (caught by the
            # sampled combination matrix under lax.cond's type check)
            inner_p = getattr(inner, "params", None)
            dtype = (inner_p.dtype if inner_p is not None and inner_p.size
                     else jnp.float32)
        tr = jnp.concatenate(
            [jnp.eye(dim_out, dtype=dtype), jnp.zeros((dim_out, 1), dtype=dtype)],
            axis=1)
        return cls(inner=inner, tr=tr)

    @property
    def dim_out(self) -> int:
        return self.tr.shape[0]

    @property
    def params(self) -> jax.Array:
        inner_p = self.inner.params
        return jnp.concatenate([jnp.ravel(self.tr), inner_p])

    @property
    def params_size(self) -> int:
        return int(self.tr.size) + self.inner.params_size

    def with_params(self, p: jax.Array) -> "FunctionARD":
        nt = self.tr.size
        tr = jnp.reshape(p[:nt], self.tr.shape)
        inner = self.inner.with_params(p[nt:]) if self.inner.params_size else self.inner
        return self.replace(inner=inner, tr=tr)

    def __call__(self, X: jax.Array) -> jax.Array:
        m = self.inner(X)                               # (q, p)
        ones = jnp.ones((X.shape[0], 1), dtype=m.dtype)
        aug = jnp.concatenate([m, ones], axis=1)        # (q, p+1)
        return jnp.dot(aug, self.tr.T, preferred_element_type=m.dtype)


def prepare_mean(mean, Y: jax.Array, mask: jax.Array):
    """Refresh data-dependent means from the (padded, masked) observations.

    DataMean <- column means over valid rows (limbo gp.mean_observation(),
    model/gp.hpp pushes this via _compute_obs_mean); recursive for FunctionARD.
    Other means are returned unchanged.
    """
    if isinstance(mean, DataMean):
        n = jnp.maximum(jnp.sum(mask), 1.0)
        value = jnp.sum(Y * mask[:, None], axis=0) / n
        return mean.replace(value=value.astype(mean.value.dtype))
    if isinstance(mean, FunctionARD):
        return mean.replace(inner=prepare_mean(mean.inner, Y, mask))
    return mean
