"""Memory-bounded scans over all scene triangles (pure JAX).

These implement occlusion (any-hit), closest-hit, and visibility estimation
by tiling the triangle axis through a ``fori_loop`` map/reduce, bounding peak
memory at ``batch * tile`` while XLA keeps the whole loop on device.

Reference parity: ``ray_intersect_any_triangle`` (_utils.py:1325-1537),
``first_triangle_hit_by_ray`` (_utils.py:1775-1961), and
``triangles_visible_from_vertex`` (_utils.py:1540-1772). The Pallas TPU
kernels in :mod:`differt_tpu.ops` implement the same contracts; these
pure-JAX versions are the portable fallback and the correctness oracles.
"""

from typing import Any

import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Bool, Float, Int

from ..geometry._lattice import fibonacci_lattice, viewing_frustum
from ..utils import smoothing_function
from ._triangle import ray_intersect_triangle


def _tile_bounds(total: int, batch_size: int | None) -> tuple[int, int, int]:
    if batch_size is None:
        batch_size = total
    batch_size = max(min(batch_size, total), 1)
    num_tiles, rem = divmod(total, batch_size)
    return batch_size, num_tiles, rem


def ray_intersect_any_triangle(
    ray_origins: Float[ArrayLike, "*#batch 3"],
    ray_directions: Float[ArrayLike, "*#batch 3"],
    triangle_vertices: Float[ArrayLike, "*#batch num_triangles 3 3"],
    active_triangles: Bool[ArrayLike, "*#batch num_triangles"] | None = None,
    *,
    hit_tol: Float[ArrayLike, ""] | None = None,
    smoothing_factor: Float[ArrayLike, ""] | None = None,
    batch_size: int | None = 512,
    **kwargs: Any,
) -> Bool[Array, " *batch"] | Float[Array, " *batch"]:
    """Whether each ray hits *any* triangle before ``t = 1 - hit_tol``.

    A triangle counts as blocking when ``(t < 1 - hit_tol) & hit``. With
    ``smoothing_factor``, returns a clipped sum of per-triangle confidences.
    ``hit_tol`` defaults to ``100 * eps(dtype)``.
    """
    ray_origins = jnp.asarray(ray_origins)
    ray_directions = jnp.asarray(ray_directions)
    triangle_vertices = jnp.asarray(triangle_vertices)

    if hit_tol is None:
        dtype = jnp.result_type(ray_origins, ray_directions, triangle_vertices)
        hit_tol = 100.0 * jnp.finfo(dtype).eps
    hit_threshold = 1.0 - jnp.asarray(hit_tol)

    num_triangles = triangle_vertices.shape[-3]
    if active_triangles is not None:
        active_triangles = jnp.asarray(active_triangles)

    batch = jnp.broadcast_shapes(
        ray_origins.shape[:-1],
        ray_directions.shape[:-1],
        triangle_vertices.shape[:-3],
        active_triangles.shape[:-1] if active_triangles is not None else (),
    )

    smooth = smoothing_factor is not None
    if num_triangles == 0:
        if smooth:
            dtype = jnp.result_type(ray_origins, ray_directions, triangle_vertices)
            return jnp.zeros(batch, dtype=dtype)
        return jnp.zeros(batch, dtype=bool)

    def tile_fn(tri: Array, active: Array | None) -> Array:
        t, hit = ray_intersect_triangle(
            ray_origins[..., None, :],
            ray_directions[..., None, :],
            tri,
            smoothing_factor=smoothing_factor,
            **kwargs,
        )
        if smooth:
            conf = jnp.minimum(
                hit, smoothing_function(hit_threshold - t, smoothing_factor)
            )
            return conf.sum(axis=-1, where=active)
        return ((t < hit_threshold) & hit).any(axis=-1, where=active)

    def combine(left: Array, right: Array) -> Array:
        if smooth:
            return (left + right).clip(max=1.0)
        return left | right

    batch_size, num_tiles, rem = _tile_bounds(num_triangles, batch_size)

    def body(i: Array, acc: Array) -> Array:
        start = i * batch_size
        tri = jax.lax.dynamic_slice_in_dim(
            triangle_vertices, start, batch_size, axis=-3, allow_negative_indices=False
        )
        active = (
            jax.lax.dynamic_slice_in_dim(
                active_triangles, start, batch_size, axis=-1,
                allow_negative_indices=False,
            )
            if active_triangles is not None
            else None
        )
        return combine(acc, tile_fn(tri, active))

    init = jnp.zeros(batch) if smooth else jnp.zeros(batch, dtype=bool)
    acc = jax.lax.fori_loop(0, num_tiles, body, init)

    if rem > 0:
        acc = combine(
            acc,
            tile_fn(
                triangle_vertices[..., -rem:, :, :],
                active_triangles[..., -rem:] if active_triangles is not None else None,
            ),
        )
    return acc


def first_triangle_hit_by_ray(
    ray_origins: Float[ArrayLike, "*#batch 3"],
    ray_directions: Float[ArrayLike, "*#batch 3"],
    triangle_vertices: Float[ArrayLike, "*#batch num_triangles 3 3"],
    active_triangles: Bool[ArrayLike, "*#batch num_triangles"] | None = None,
    batch_size: int | None = 512,
    **kwargs: Any,
) -> tuple[Int[Array, " *batch"], Float[Array, " *batch"]]:
    """Index of and distance to the first triangle hit by each ray.

    Returns ``(-1, inf)`` when nothing is hit.
    """
    ray_origins = jnp.asarray(ray_origins)
    ray_directions = jnp.asarray(ray_directions)
    triangle_vertices = jnp.asarray(triangle_vertices)
    t_dtype = jnp.result_type(ray_origins, ray_directions, triangle_vertices)

    num_triangles = triangle_vertices.shape[-3]
    if active_triangles is not None:
        active_triangles = jnp.asarray(active_triangles)

    batch = jnp.broadcast_shapes(
        ray_origins.shape[:-1],
        ray_directions.shape[:-1],
        triangle_vertices.shape[:-3],
        active_triangles.shape[:-1] if active_triangles is not None else (),
    )

    if num_triangles == 0:
        return (
            jnp.full(batch, -1, dtype=jnp.int32),
            jnp.full(batch, jnp.inf, dtype=t_dtype),
        )

    def tile_fn(tri: Array, active: Array | None) -> tuple[Array, Array]:
        t, hit = ray_intersect_triangle(
            ray_origins[..., None, :],
            ray_directions[..., None, :],
            tri,
            **kwargs,
        )
        if active is not None:
            hit = hit & active
        t = jnp.where(hit, t, jnp.inf)
        idx = jnp.argmin(t, axis=-1)
        t_min = jnp.min(t, axis=-1)
        idx = jnp.where(jnp.isinf(t_min), -1, idx)
        return idx.astype(jnp.int32), t_min

    def combine(
        left: tuple[Array, Array], right: tuple[Array, Array]
    ) -> tuple[Array, Array]:
        closer = left[1] < right[1]
        return (
            jnp.where(closer, left[0], right[0]),
            jnp.where(closer, left[1], right[1]),
        )

    batch_size, num_tiles, rem = _tile_bounds(num_triangles, batch_size)

    def body(i: Array, carry: tuple[Array, Array]) -> tuple[Array, Array]:
        start = i * batch_size
        tri = jax.lax.dynamic_slice_in_dim(
            triangle_vertices, start, batch_size, axis=-3, allow_negative_indices=False
        )
        active = (
            jax.lax.dynamic_slice_in_dim(
                active_triangles, start, batch_size, axis=-1,
                allow_negative_indices=False,
            )
            if active_triangles is not None
            else None
        )
        idx, t = tile_fn(tri, active)
        return combine(carry, (idx + start, t))

    init = (
        -jnp.ones(batch, dtype=jnp.int32),
        jnp.full(batch, jnp.inf, dtype=t_dtype),
    )
    idx, t = jax.lax.fori_loop(0, num_tiles, body, init)

    if rem > 0:
        ridx, rt = tile_fn(
            triangle_vertices[..., -rem:, :, :],
            active_triangles[..., -rem:] if active_triangles is not None else None,
        )
        idx, t = combine((idx, t), (ridx + num_tiles * batch_size, rt))

    finite = jnp.isfinite(t)
    return jnp.where(finite, idx, -1), jnp.where(finite, t, jnp.inf)


def triangles_visible_from_vertex(
    vertex: Float[ArrayLike, "*#batch 3"],
    triangle_vertices: Float[ArrayLike, "*#batch num_triangles 3 3"],
    active_triangles: Bool[ArrayLike, "*#batch num_triangles"] | None = None,
    num_rays: int = int(1e6),
    batch_size: int | None = 512,
    **kwargs: Any,
) -> Bool[Array, "*batch num_triangles"]:
    """Estimate per-triangle visibility from a vertex by ray launching.

    Launches a frustum-restricted Fibonacci lattice of ``num_rays`` rays and
    scatter-marks each first-hit triangle as visible.
    """
    vertex = jnp.asarray(vertex)
    triangle_vertices = jnp.asarray(triangle_vertices)

    centers = triangle_vertices.mean(axis=-2, keepdims=True)
    world_vertices = jnp.concatenate((triangle_vertices, centers), axis=-2).reshape(
        *triangle_vertices.shape[:-3], -1, 3
    )

    if active_triangles is not None:
        active_triangles = jnp.asarray(active_triangles)
        active_vertices = jnp.repeat(active_triangles, 4, axis=-1)
    else:
        active_vertices = None

    frustum = viewing_frustum(vertex, world_vertices, active_vertices=active_vertices)

    ray_directions = jnp.vectorize(
        lambda f: fibonacci_lattice(num_rays, frustum=f),
        signature="(2,3)->(n,3)",
    )(frustum)

    batch = jnp.broadcast_shapes(
        vertex.shape[:-1],
        ray_directions.shape[:-2],
        triangle_vertices.shape[:-3],
        active_triangles.shape[:-1] if active_triangles is not None else (),
    )
    num_triangles = triangle_vertices.shape[-3]

    def mark(visible: Array, hit_indices: Array) -> Array:
        grid = jnp.indices(visible.shape, sparse=True)
        grid = (*grid[:-1], hit_indices)
        return visible.at[grid].set(True, mode="drop", wrap_negative_indices=False)

    def tile_fn(ray_dirs: Array) -> Array:
        idx, _ = first_triangle_hit_by_ray(
            vertex[..., None, :],
            ray_dirs,
            triangle_vertices[..., None, :, :, :],
            active_triangles=active_triangles[..., None, :]
            if active_triangles is not None
            else None,
            batch_size=None,
            **kwargs,
        )
        return idx

    batch_size, num_tiles, rem = _tile_bounds(num_rays, batch_size)

    def body(i: Array, visible: Array) -> Array:
        start = i * batch_size
        ray_dirs = jax.lax.dynamic_slice_in_dim(
            ray_directions, start, batch_size, axis=-2, allow_negative_indices=False
        )
        return mark(visible, tile_fn(ray_dirs))

    init = jnp.zeros((*batch, num_triangles), dtype=bool)
    visible = jax.lax.fori_loop(0, num_tiles, body, init)

    if rem > 0:
        visible = mark(visible, tile_fn(ray_directions[..., -rem:, :]))
    return visible
