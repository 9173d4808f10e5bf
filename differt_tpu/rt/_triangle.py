"""Batched Moeller-Trumbore ray-triangle intersection (pure JAX).

Reference parity: ``differt.rt.ray_intersect_triangle``
(differt/src/differt/geometry/_utils.py:1135-1322), including the
sigmoid-smoothed differentiable variant of fully-eucap2024.
"""

import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Bool, Float

from ..utils import smoothing_function


def ray_intersect_triangle(
    ray_origins: Float[ArrayLike, "*#batch 3"],
    ray_directions: Float[ArrayLike, "*#batch 3"],
    triangle_vertices: Float[ArrayLike, "*#batch 3 3"],
    *,
    epsilon: Float[ArrayLike, ""] | None = None,
    smoothing_factor: Float[ArrayLike, ""] | None = None,
) -> tuple[Float[Array, " *batch"], Bool[Array, " *batch"] | Float[Array, " *batch"]]:
    """Moeller-Trumbore intersection test, batched over leading dimensions.

    Returns ``(t, hit)`` where ``t`` scales ``ray_directions`` to reach the
    triangle plane, and ``hit`` says whether the intersection lies inside the
    triangle with ``t > epsilon``. With ``smoothing_factor`` set, every hard
    comparison is replaced by a sigmoid and ``hit`` becomes a confidence in
    [0, 1] (min-combined), keeping the test differentiable.

    ``epsilon`` defaults to ``10 * eps(dtype)`` (dtype-derived, per the
    reference convention so float32-TPU and float64-CPU agree after scaling).

    Examples:
        >>> import jax.numpy as jnp
        >>> from differt_tpu.rt import ray_intersect_triangle
        >>> tri = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        >>> t, hit = ray_intersect_triangle(
        ...     jnp.array([0.2, 0.2, 1.0]), jnp.array([0.0, 0.0, -2.0]), tri
        ... )
        >>> float(t), bool(hit)
        (0.5, True)
    """
    ray_origins = jnp.asarray(ray_origins)
    ray_directions = jnp.asarray(ray_directions)
    triangle_vertices = jnp.asarray(triangle_vertices)

    if epsilon is None:
        dtype = jnp.result_type(ray_origins, ray_directions, triangle_vertices)
        epsilon = 10.0 * jnp.finfo(dtype).eps
    epsilon = jnp.asarray(epsilon)

    v0 = triangle_vertices[..., 0, :]
    edge_1 = triangle_vertices[..., 1, :] - v0
    edge_2 = triangle_vertices[..., 2, :] - v0

    h = jnp.cross(ray_directions, edge_2)
    det = jnp.sum(h * edge_1, axis=-1)
    det = jnp.where(det == 0.0, jnp.inf, det)  # Parallel ray: push t to 0 via 1/inf

    inv_det = 1.0 / det
    s = ray_origins - v0
    u = inv_det * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, edge_1)
    v = inv_det * jnp.sum(q * ray_directions, axis=-1)
    t = inv_det * jnp.sum(q * edge_2, axis=-1)

    if smoothing_factor is not None:
        conds = jnp.stack(
            (
                smoothing_function(jnp.abs(det) - epsilon, smoothing_factor),
                smoothing_function(u, smoothing_factor),
                smoothing_function(1.0 - u, smoothing_factor),
                smoothing_function(v, smoothing_factor),
                smoothing_function(1.0 - (u + v), smoothing_factor),
                smoothing_function(t - epsilon, smoothing_factor),
            ),
            axis=-1,
        )
        hit = conds.min(axis=-1, initial=1.0)
        return t, hit

    hit = (
        (jnp.abs(det) > epsilon)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > epsilon)
    )
    return t, hit


@jax.jit
def triangle_contains_vertex_assuming_inside_same_plane(
    triangle_vertices: Float[ArrayLike, "*#batch 3 3"],
    vertex: Float[ArrayLike, "*#batch 3"],
) -> Bool[Array, " *batch"]:
    """Whether a coplanar vertex lies inside the triangle (same-side test).

    Reference parity: _mesh.py:81-141.
    """
    triangle_vertices = jnp.asarray(triangle_vertices)
    vertex = jnp.asarray(vertex)

    p0 = triangle_vertices[..., 0, :]
    p1 = triangle_vertices[..., 1, :]
    p2 = triangle_vertices[..., 2, :]

    normal = jnp.cross(p1 - p0, p2 - p0)

    def same_side(a: Array, b: Array) -> Array:
        c = jnp.cross(b - a, vertex - a)
        return jnp.sum(c * normal, axis=-1) >= 0.0

    return same_side(p0, p1) & same_side(p1, p2) & same_side(p2, p0)
