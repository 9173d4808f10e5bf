"""General-purpose utilities.

Mirrors the API of ``differt.utils`` (reference: differt/src/differt/utils.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Float, Num, PRNGKeyArray


@partial(jax.jit, static_argnames=("shape",))
def sample_points_in_bounding_box(
    bounding_box: Float[ArrayLike, "2 3"],
    shape: tuple[int, ...] = (),
    *,
    key: PRNGKeyArray,
) -> Float[Array, "*shape 3"]:
    """Sample uniform random points inside a 3D bounding box.

    Reference parity: ``differt.utils.sample_points_in_bounding_box``
    (utils.py:8-33).
    """
    bounding_box = jnp.asarray(bounding_box)
    lo = bounding_box[0, :]
    hi = bounding_box[1, :]
    u = jax.random.uniform(key, shape=(*shape, 3), dtype=lo.dtype)
    return lo + u * (hi - lo)


@jax.jit
def safe_divide(
    num: Num[ArrayLike, " *#batch"],
    den: Num[ArrayLike, " *#batch"],
) -> Num[Array, " *batch"]:
    """Elementwise division that returns 0 where the denominator is 0.

    Reference parity: ``differt.utils.safe_divide`` (utils.py:36-67).
    """
    num = jnp.asarray(num)
    den = jnp.asarray(den)
    zero = den == 0
    den_safe = jnp.where(zero, jnp.ones_like(den), den)
    out = num / den_safe
    return jnp.where(zero, jnp.zeros_like(out), out)


@jax.jit
def smoothing_function(
    x: Float[ArrayLike, " *#batch"],
    /,
    smoothing_factor: Float[ArrayLike, " *#batch"] = 1.0,
) -> Float[Array, " *batch"]:
    r"""Smooth approximation of the Heaviside step: ``sigmoid(x * alpha)``.

    This is the differentiable-RT relaxation used to replace hard hit/validity
    tests with soft confidence values (reference: utils.py:70-89; per the
    fully-eucap2024 technique).
    """
    return jax.nn.sigmoid(jnp.asarray(x) * smoothing_factor)
