"""Fused Pallas TPU kernels for brute-force ray casting.

Replaces the reference's Warp CUDA BVH kernels (_mesh.py:142-401) with a
TPU-first design: instead of a pointer-chasing BVH (hostile to the TPU's
vector units), rays and triangles are tiled into VMEM and every ray-triangle
pair in a (ray_tile x tri_tile) block is tested with a fully vectorized
Moeller-Trumbore evaluation on the VPU. The grid walks triangle tiles
innermost so per-ray accumulators (any-hit flags, running closest hit) stay
resident in VMEM across the whole sweep — zero HBM traffic for
intermediates, one pass over the mesh per ray tile.

Layout: coordinates are stored structure-of-arrays ([3, num_rays] and
[9, num_triangles]) so the last (lane) dimension is the 128-wide
ray/triangle axis and every arithmetic op is a dense [TILE_R, TILE_T]
vector op.

On non-TPU backends the same kernels run in interpreter mode (slow but
exact), which is how the unit tests validate them against the pure-JAX
oracles in :mod:`differt_tpu.rt`.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jaxtyping import Array, Bool, Float, Int

try:  # pragma: no cover - pltpu only resolves fully on TPU builds.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

TILE_R = 1024
TILE_T = 512
T_SUB = 64  # Triangle sublane-chunk size inside a tile.

_NEG = -1.0  # Inactive-triangle marker handled via the active row.


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_spec(block_shape, index_map):
    if _HAS_PLTPU and not _interpret():
        return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block_shape, index_map)


def _mt_chunk(o, d, tris_ref, active_ref, sl, epsilon):
    """Vectorized Moeller-Trumbore over a [T_SUB, TILE_R] chunk.

    Rays ride the 128-wide lane axis (no relayout from the input block);
    the triangle chunk rides the sublane axis, so triangle counts pad to a
    multiple of T_SUB instead of 128 and blocks stay small in VMEM.
    Returns ``(t, hit)`` where padded/inactive triangles never hit.
    """
    # Triangles: [9, TILE_T] -> v0 rows 0..2, e1 rows 3..5, e2 rows 6..8.
    v0 = [tris_ref[i, sl].reshape(-1, 1) for i in range(3)]
    e1 = [tris_ref[3 + i, sl].reshape(-1, 1) for i in range(3)]
    e2 = [tris_ref[6 + i, sl].reshape(-1, 1) for i in range(3)]
    active = active_ref[0, sl].reshape(-1, 1) > 0

    # h = d x e2  -> [T_SUB, TILE_R] per component.
    h0 = d[1] * e2[2] - d[2] * e2[1]
    h1 = d[2] * e2[0] - d[0] * e2[2]
    h2 = d[0] * e2[1] - d[1] * e2[0]

    det = h0 * e1[0] + h1 * e1[1] + h2 * e1[2]
    det_ok = jnp.abs(det) > epsilon
    # Fast reciprocal + one Newton-Raphson step: full f32 accuracy at a
    # fraction of the VPU divide latency. det == 0 -> inv = 0 (no hit, since
    # det_ok is false anyway).
    safe_det = jnp.where(det == 0.0, 1.0, det)
    if _HAS_PLTPU and not _interpret():
        r = pl.reciprocal(safe_det, approx=True)
        r = r * (2.0 - safe_det * r)
    else:
        r = 1.0 / safe_det
    inv = jnp.where(det == 0.0, 0.0, r)

    s0 = o[0] - v0[0]
    s1 = o[1] - v0[1]
    s2 = o[2] - v0[2]

    u = inv * (s0 * h0 + s1 * h1 + s2 * h2)

    # q = s x e1.
    q0 = s1 * e1[2] - s2 * e1[1]
    q1 = s2 * e1[0] - s0 * e1[2]
    q2 = s0 * e1[1] - s1 * e1[0]

    v = inv * (q0 * d[0] + q1 * d[1] + q2 * d[2])
    t = inv * (q0 * e2[0] + q1 * e2[1] + q2 * e2[2])

    hit = (
        det_ok
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > epsilon)
        & active
    )
    return t, hit


def _ray_lanes(rays_ref):
    o = [rays_ref[i, :].reshape(1, -1) for i in range(3)]
    d = [rays_ref[3 + i, :].reshape(1, -1) for i in range(3)]
    return o, d


def _anyhit_kernel(rays_ref, tris_ref, active_ref, thresh_ref, out_ref, *, epsilon):
    j = pl.program_id(1)
    tile_t = tris_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Early exit: once every ray in this tile is blocked, later triangle
    # tiles have nothing to add — skip the whole MT block.
    @pl.when((j == 0) | jnp.logical_not(out_ref[...].all()))
    def _compute():
        o, d = _ray_lanes(rays_ref)
        thresh = thresh_ref[0, :].reshape(1, -1)
        for chunk in range(tile_t // T_SUB):
            sl = slice(chunk * T_SUB, (chunk + 1) * T_SUB)

            # Fully padded / masked-out chunks cost one reduce, not an MT.
            @pl.when(jnp.any(active_ref[0, sl] > 0))
            def _chunk(sl=sl):
                t, hit = _mt_chunk(o, d, tris_ref, active_ref, sl, epsilon)
                out_ref[0, :] = out_ref[0, :] | (hit & (t < thresh)).any(axis=0)


def _closest_kernel(
    rays_ref, tris_ref, active_ref, idx_out_ref, t_out_ref, *, epsilon
):
    j = pl.program_id(1)
    tile_t = tris_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        idx_out_ref[...] = jnp.full_like(idx_out_ref, -1)
        t_out_ref[...] = jnp.full_like(t_out_ref, jnp.inf)

    o, d = _ray_lanes(rays_ref)
    for chunk in range(tile_t // T_SUB):
        sl = slice(chunk * T_SUB, (chunk + 1) * T_SUB)

        @pl.when(jnp.any(active_ref[0, sl] > 0))
        def _chunk(sl=sl, chunk=chunk):
            t, hit = _mt_chunk(o, d, tris_ref, active_ref, sl, epsilon)
            t = jnp.where(hit, t, jnp.inf)
            chunk_min = jnp.min(t, axis=0)
            chunk_arg = (
                jnp.argmin(t, axis=0).astype(jnp.int32)
                + j * tile_t
                + chunk * T_SUB
            )

            # Ties prefer the later chunk, matching the tiled pure-JAX
            # reference combine (first_triangle_hit_by_ray) so results are
            # bit-identical when tile sizes line up.
            best_t = t_out_ref[0, :]
            closer = chunk_min <= best_t
            t_out_ref[0, :] = jnp.where(closer, chunk_min, best_t)
            idx_out_ref[0, :] = jnp.where(
                closer & jnp.isfinite(chunk_min), chunk_arg, idx_out_ref[0, :]
            )


def _pad_to(x: Array, size: int, axis: int, value) -> Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _prepare(
    ray_origins: Float[Array, "num_rays 3"],
    ray_directions: Float[Array, "num_rays 3"],
    triangle_vertices: Float[Array, "num_triangles 3 3"],
    active_triangles: Bool[Array, " num_triangles"] | None,
):
    num_rays = ray_origins.shape[0]
    num_tris = triangle_vertices.shape[0]
    rays_padded = pl.cdiv(num_rays, TILE_R) * TILE_R
    # Triangles pad to T_SUB granularity (sublane chunks); only past one
    # full tile do they round up to TILE_T multiples for the grid.
    tris_padded = pl.cdiv(max(num_tris, 1), T_SUB) * T_SUB
    if tris_padded > TILE_T:
        tris_padded = pl.cdiv(tris_padded, TILE_T) * TILE_T

    rays = jnp.concatenate((ray_origins, ray_directions), axis=-1).T  # [6, R]
    rays = _pad_to(rays, rays_padded, 1, 0.0)

    v0 = triangle_vertices[:, 0, :]
    e1 = triangle_vertices[:, 1, :] - v0
    e2 = triangle_vertices[:, 2, :] - v0
    tris = jnp.concatenate((v0, e1, e2), axis=-1).T  # [9, T]
    tris = _pad_to(tris, tris_padded, 1, 0.0)

    if active_triangles is None:
        active = jnp.ones((num_tris,), dtype=jnp.int32)
    else:
        active = active_triangles.astype(jnp.int32)
    active = _pad_to(active.reshape(1, -1), tris_padded, 1, 0)

    return rays, tris, active, num_rays, rays_padded, tris_padded


@functools.partial(jax.jit, static_argnames=("epsilon_static",))
def _run_anyhit(rays, tris, active, thresh, epsilon_static):
    rays_padded = rays.shape[1]
    tris_padded = tris.shape[1]
    tile_t = min(TILE_T, tris_padded)
    grid = (rays_padded // TILE_R, tris_padded // tile_t)

    out = pl.pallas_call(
        functools.partial(_anyhit_kernel, epsilon=epsilon_static),
        out_shape=jax.ShapeDtypeStruct((1, rays_padded), jnp.bool_),
        grid=grid,
        in_specs=[
            _vmem_spec((6, TILE_R), lambda i, j: (0, i)),
            _vmem_spec((9, tile_t), lambda i, j: (0, j)),
            _vmem_spec((1, tile_t), lambda i, j: (0, j)),
            _vmem_spec((1, TILE_R), lambda i, j: (0, i)),
        ],
        out_specs=_vmem_spec((1, TILE_R), lambda i, j: (0, i)),
        interpret=_interpret(),
    )(rays, tris, active, thresh)
    return out


@functools.partial(jax.jit, static_argnames=("epsilon_static",))
def _run_closest(rays, tris, active, epsilon_static):
    rays_padded = rays.shape[1]
    tris_padded = tris.shape[1]
    tile_t = min(TILE_T, tris_padded)
    grid = (rays_padded // TILE_R, tris_padded // tile_t)

    idx, t = pl.pallas_call(
        functools.partial(_closest_kernel, epsilon=epsilon_static),
        out_shape=(
            jax.ShapeDtypeStruct((1, rays_padded), jnp.int32),
            jax.ShapeDtypeStruct((1, rays_padded), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            _vmem_spec((6, TILE_R), lambda i, j: (0, i)),
            _vmem_spec((9, tile_t), lambda i, j: (0, j)),
            _vmem_spec((1, tile_t), lambda i, j: (0, j)),
        ],
        out_specs=(
            _vmem_spec((1, TILE_R), lambda i, j: (0, i)),
            _vmem_spec((1, TILE_R), lambda i, j: (0, i)),
        ),
        interpret=_interpret(),
    )(rays, tris, active)
    return idx, t


def pallas_ray_intersect_any_triangle(
    ray_origins: Float[Array, "*batch 3"],
    ray_directions: Float[Array, "*batch 3"],
    triangle_vertices: Float[Array, "num_triangles 3 3"],
    active_triangles: Bool[Array, " num_triangles"] | None = None,
    *,
    hit_threshold: Float[Array, ""] | float = 1.0,
    epsilon: Float[Array, ""] | float | None = None,
) -> Bool[Array, " *batch"]:
    """Any-hit occlusion test: does each ray hit anything before ``t = thr``.

    Same contract as :func:`differt_tpu.rt.ray_intersect_any_triangle` with
    ``hit_threshold = 1 - hit_tol``.
    """
    batch = jnp.broadcast_shapes(ray_origins.shape[:-1], ray_directions.shape[:-1])
    ray_origins = jnp.broadcast_to(ray_origins, (*batch, 3)).reshape(-1, 3)
    ray_directions = jnp.broadcast_to(ray_directions, (*batch, 3)).reshape(-1, 3)

    if epsilon is None:
        epsilon = 10.0 * float(jnp.finfo(jnp.float32).eps)
    else:
        epsilon = float(epsilon)

    rays, tris, active, num_rays, rays_padded, _ = _prepare(
        ray_origins, ray_directions, triangle_vertices, active_triangles
    )
    thresh = jnp.broadcast_to(
        jnp.asarray(hit_threshold, dtype=jnp.float32), (num_rays,)
    )
    thresh = _pad_to(thresh.reshape(1, -1), rays_padded, 1, 0.0)

    out = _run_anyhit(rays, tris, active, thresh, epsilon)
    return out[0, :num_rays].reshape(batch)


def pallas_first_triangle_hit_by_ray(
    ray_origins: Float[Array, "*batch 3"],
    ray_directions: Float[Array, "*batch 3"],
    triangle_vertices: Float[Array, "num_triangles 3 3"],
    active_triangles: Bool[Array, " num_triangles"] | None = None,
    *,
    epsilon: Float[Array, ""] | float | None = None,
) -> tuple[Int[Array, " *batch"], Float[Array, " *batch"]]:
    """Closest-hit query: ``(index, t)`` of the first triangle hit (-1/inf)."""
    batch = jnp.broadcast_shapes(ray_origins.shape[:-1], ray_directions.shape[:-1])
    ray_origins = jnp.broadcast_to(ray_origins, (*batch, 3)).reshape(-1, 3)
    ray_directions = jnp.broadcast_to(ray_directions, (*batch, 3)).reshape(-1, 3)

    if epsilon is None:
        epsilon = 10.0 * float(jnp.finfo(jnp.float32).eps)
    else:
        epsilon = float(epsilon)

    rays, tris, active, num_rays, _, _ = _prepare(
        ray_origins, ray_directions, triangle_vertices, active_triangles
    )
    idx, t = _run_closest(rays, tris, active, epsilon)
    idx = idx[0, :num_rays].reshape(batch)
    t = t[0, :num_rays].reshape(batch)
    finite = jnp.isfinite(t)
    return jnp.where(finite, idx, -1), jnp.where(finite, t, jnp.inf)
