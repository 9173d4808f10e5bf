"""Multipath Lifetime Map (MLM) via shooting-and-bouncing rays.

Reference parity: ``Scene.compute_tx_mlm``
(differt/src/differt/geometry/_scene.py:62-302, 1250-1371), which uses a Warp
CUDA kernel with per-cell ``atomic_or`` of a path hash. Here the same
computation is expressed as pure XLA: a ``lax.scan`` over bounces, a
vectorized receiver-plane crossing test, and a bit-planed scatter-max that
emulates the atomic OR (OR of a set == per-bit any == per-bit max), which
XLA lowers to a single deterministic scatter on TPU.

Each grid cell accumulates the OR of 32-bit hashes of the triangle-index
sequences of all ray paths crossing it: cells with equal values share the
same multipath structure (the MLM fingerprint of mlm-eucap2025).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jaxtyping import Array, ArrayLike, Float, Int

from ..geometry._lattice import fibonacci_lattice, viewing_frustum


def _hash_int(x: Array) -> Array:
    """32-bit integer avalanche hash (murmur3 finalizer)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def _combine_hashes(h1: Array, h2: Array) -> Array:
    """Boost-style hash combiner."""
    return h1 ^ (h2 + jnp.uint32(0x9E3779B9) + (h1 << 6) + (h1 >> 2))


@partial(jax.jit, static_argnames=("order", "grid_size"))
def _compute_tx_mlm(
    mesh,
    tx_vertices: Float[Array, "num_tx 3"],
    ray_directions: Float[Array, "num_tx num_rays 3"],
    receiver_plane_z: Float[Array, ""],
    grid_min: Float[Array, "2"],
    grid_max: Float[Array, "2"],
    *,
    order: int,
    grid_size: tuple[int, int],
) -> Int[Array, "num_tx grid_m grid_n"]:
    num_tx, num_rays = ray_directions.shape[:2]
    m, n = grid_size
    extent = grid_max - grid_min

    def bounce(carry, _):
        origins, directions, valid, path_hash = carry
        triangles, t_hit = mesh.first_triangle_hit_by_ray(origins, directions)

        # Receiver-plane crossing within this bounce segment.
        dz = directions[..., 2]
        dz_safe = jnp.where(dz == 0.0, jnp.ones_like(dz), dz)
        t_plane = (receiver_plane_z - origins[..., 2]) / dz_safe
        crosses = (dz != 0.0) & (t_plane > 0.0) & (t_plane < t_hit) & valid

        hit_xy = origins[..., :2] + t_plane[..., None] * directions[..., :2]
        uv = (hit_xy - grid_min) / extent
        cell_i = jnp.floor(uv[..., 0] * m).astype(jnp.int32)
        cell_j = jnp.floor(uv[..., 1] * n).astype(jnp.int32)
        in_grid = (
            crosses & (cell_i >= 0) & (cell_i < m) & (cell_j >= 0) & (cell_j < n)
        )

        # Advance rays.
        inside = jnp.isfinite(t_hit)
        valid = valid & inside
        t_step = jnp.where(inside, t_hit, jnp.zeros_like(t_hit))
        origins = origins + t_step[..., None] * directions
        normals = jnp.take(mesh.normals, triangles, axis=0)
        directions = (
            directions
            - 2.0 * jnp.sum(directions * normals, axis=-1, keepdims=True) * normals
        )
        new_hash = _combine_hashes(path_hash, _hash_int(triangles.astype(jnp.int32)))
        path_hash = jnp.where(inside, new_hash, path_hash)

        return (origins, directions, valid, path_hash), (
            in_grid,
            cell_i,
            cell_j,
            jnp.where(in_grid, path_hash, jnp.zeros_like(path_hash)),
        )

    origins = jnp.broadcast_to(tx_vertices[:, None, :], ray_directions.shape)
    valid = jnp.ones((num_tx, num_rays), dtype=bool)
    path_hash = jnp.zeros((num_tx, num_rays), dtype=jnp.uint32)

    _, (in_grid, cell_i, cell_j, hashes) = jax.lax.scan(
        bounce, (origins, ray_directions, valid, path_hash), None, length=order + 1
    )

    # Emulated atomic OR: expand the hash into 32 bit-planes, scatter-max
    # each bit, then recombine. A single scatter per TX, deterministic.
    bits = jnp.arange(32, dtype=jnp.uint32)
    # [bounces num_tx num_rays 32]
    bit_values = ((hashes[..., None] >> bits) & jnp.uint32(1)).astype(jnp.uint32)
    bit_values = jnp.where(in_grid[..., None], bit_values, jnp.uint32(0))

    flat_cell = jnp.where(in_grid, cell_i * n + cell_j, 0)

    def scatter_tx(cells, values):
        # cells: [bounces num_rays], values: [bounces num_rays 32]
        acc = jnp.zeros((m * n, 32), dtype=jnp.uint32)
        acc = acc.at[cells.reshape(-1), :].max(values.reshape(-1, 32))
        return acc

    # vmap over TX axis (axis 1 of the scan outputs).
    acc = jax.vmap(scatter_tx, in_axes=(1, 1))(flat_cell, bit_values)
    combined = jnp.sum(acc << bits, axis=-1, dtype=jnp.uint32)
    return combined.reshape(num_tx, m, n).astype(jnp.int32)


def compute_tx_mlm(
    scene,
    *,
    num_rays: int = int(1e4),
    order: int = 2,
    receiver_plane_z: Float[ArrayLike, ""] = 0.0,
    grid_bounds: Float[ArrayLike, "2 2"] | None = None,
    grid_size: tuple[int, int] = (100, 100),
) -> Int[Array, "num_tx grid_m grid_n"]:
    """Compute a per-transmitter multipath lifetime map.

    Rays are launched on a frustum-restricted Fibonacci lattice from each
    transmitter, bounced ``order + 1`` times, and every crossing of the
    horizontal receiver plane records a hash of the path's triangle sequence
    into the crossed grid cell (OR-accumulated).

    Args:
        scene: The scene (transmitters + mesh are used).
        num_rays: Number of rays per transmitter.
        order: Maximum number of bounces.
        receiver_plane_z: Height of the receiver plane.
        grid_bounds: ``[[min_x, min_y], [max_x, max_y]]`` of the map;
            defaults to the mesh footprint.
        grid_size: Number of cells along x and y.

    Returns:
        The per-cell multipath hash map, one per transmitter.
    """
    tx_vertices = scene.transmitters.reshape(-1, 3)
    mesh = scene.mesh

    if grid_bounds is None:
        bbox = mesh.bounding_box
        grid_min = bbox[0, :2]
        grid_max = bbox[1, :2]
    else:
        grid_bounds = jnp.asarray(grid_bounds)
        grid_min = grid_bounds[0]
        grid_max = grid_bounds[1]

    world_vertices = mesh.triangle_vertices.reshape(-1, 3)
    frustums = jax.vmap(viewing_frustum, in_axes=(0, None))(
        tx_vertices, world_vertices
    )
    ray_directions = jax.vmap(lambda f: fibonacci_lattice(num_rays, frustum=f))(
        frustums
    )

    return _compute_tx_mlm(
        mesh,
        tx_vertices,
        ray_directions,
        jnp.asarray(receiver_plane_z),
        grid_min,
        grid_max,
        order=order,
        grid_size=grid_size,
    )
