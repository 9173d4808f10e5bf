"""Woop-layout ray-triangle intersection: MT on the MXU (prototype).

The production kernels (`_pallas_rt.py`) run classic Möller–Trumbore on
the VPU: cross products and per-pair divides, ~40 f32 ops per (ray,
triangle) test, none of it matmul-shaped. Woop's unit-triangle
transformation [Woop, Benthin & Wald, "Watertight Ray/Triangle
Intersection", JCGT 2(1), 2013 — the affine variant] refactors the test so
most of those ops become two `[T, 3, 4] x [4, R]` contractions that XLA
can place on the MXU:

- per triangle, precompute the affine map ``A`` sending the triangle to
  the unit triangle in the z = 0 plane (rows: barycentric u, v, and the
  scaled plane equation);
- per ray, ``o' = A [o; 1]`` and ``d' = A_lin d`` are matmuls;
- the epilogue is ~10 VPU ops: ``t = -o'_z / d'_z``,
  ``u = o'_x + t d'_x``, ``v = o'_y + t d'_y``, compares, and the
  running argmin.

This module exists to answer the MXU question with a measurement (see
docs/performance.md "MXU resolution"): the contraction must run in f32
(bf16 loses ~8 mantissa bits — centimeter-scale errors on a city mesh),
where the MXU's native bf16 multipliers need a multi-pass emulation.
`bench.py --mxu` times it against the Pallas VPU closest-hit on identical
workloads.
"""

import functools

import jax
import jax.numpy as jnp
from jaxtyping import Array, Bool, Float, Int


@jax.jit
def woop_transforms(
    triangle_vertices: Float[Array, "num_triangles 3 3"],
) -> Float[Array, "num_triangles 3 4"]:
    """Per-triangle affine world->unit-triangle maps.

    Rows 0/1 map a world point to its barycentric (u, v); row 2 is the
    plane equation scaled so ``row2 . [p; 1]`` is the signed distance
    along the (unnormalized) normal. Built by inverting the 3x3 frame
    [e1 e2 n] per triangle — one small batched inverse at setup time.

    >>> import jax.numpy as jnp
    >>> tri = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    >>> m = woop_transforms(tri)
    >>> m.shape
    (1, 3, 4)
    >>> p = jnp.array([0.25, 0.5, 0.0, 1.0])  # in-plane point, homogeneous
    >>> [round(float(x), 3) for x in m[0] @ p]  # (u, v, signed distance)
    [0.25, 0.5, 0.0]
    """
    v0 = triangle_vertices[:, 0, :]
    e1 = triangle_vertices[:, 1, :] - v0
    e2 = triangle_vertices[:, 2, :] - v0
    n = jnp.cross(e1, e2)
    frame = jnp.stack((e1, e2, n), axis=-1)  # [T, 3, 3], columns e1|e2|n
    # Degenerate triangles (zero normal) get an identity frame; their
    # plane hit test then never passes (d'_z == 0 forces t = inf below).
    det = jnp.linalg.det(frame)
    safe = jnp.where(
        (jnp.abs(det) > 1e-12)[:, None, None],
        frame,
        jnp.broadcast_to(jnp.eye(3), frame.shape),
    )
    inv = jnp.linalg.inv(safe)  # [T, 3, 3]: rows u, v, w
    offset = -jnp.einsum("tij,tj->ti", inv, v0)
    mapped = jnp.concatenate((inv, offset[:, :, None]), axis=-1)  # [T, 3, 4]
    return jnp.where(
        (jnp.abs(det) > 1e-12)[:, None, None], mapped, jnp.zeros_like(mapped)
    )


@functools.partial(jax.jit, static_argnames=("ray_chunk",))
def mxu_first_triangle_hit_by_ray(
    ray_origins: Float[Array, "num_rays 3"],
    ray_directions: Float[Array, "num_rays 3"],
    triangle_vertices: Float[Array, "num_triangles 3 3"],
    active_triangles: Bool[Array, " num_triangles"] | None = None,
    *,
    ray_chunk: int = 4096,
) -> tuple[Int[Array, " num_rays"], Float[Array, " num_rays"]]:
    """Closest hit via the Woop/MXU contraction (measurement prototype).

    Matches the semantics of
    :func:`differt_tpu.rt.first_triangle_hit_by_ray` — ``(-1, inf)`` on
    miss, lowest index on exact ties — up to f32 rounding differences in
    the (mathematically identical) intersection arithmetic. Rays are
    processed in ``ray_chunk`` blocks so the ``[T, R]`` intermediates stay
    on-chip-sized; the contraction runs at HIGHEST (f32) MXU precision.
    """
    num_rays = ray_origins.shape[0]
    num_tris = triangle_vertices.shape[0]
    transforms = woop_transforms(triangle_vertices)  # [T, 3, 4]
    flat = transforms.reshape(num_tris * 3, 4)

    if active_triangles is None:
        active = jnp.ones((num_tris,), dtype=bool)
    else:
        active = active_triangles

    eps = 10.0 * jnp.finfo(jnp.float32).eps

    pad = (-num_rays) % ray_chunk
    o = jnp.concatenate(
        (ray_origins, jnp.zeros((pad, 3), ray_origins.dtype)), axis=0
    )
    d = jnp.concatenate(
        (ray_directions, jnp.ones((pad, 3), ray_directions.dtype)), axis=0
    )
    o_h = jnp.concatenate((o, jnp.ones((o.shape[0], 1), o.dtype)), axis=-1)
    d_h = jnp.concatenate((d, jnp.zeros((d.shape[0], 1), d.dtype)), axis=-1)

    def chunk_hit(args):
        o_c, d_c = args  # [C, 4] each
        # THE two MXU contractions: [3T, 4] x [4, C].
        o_p = jax.lax.dot_general(
            flat,
            o_c.T,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(num_tris, 3, -1)
        d_p = jax.lax.dot_general(
            flat,
            d_c.T,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(num_tris, 3, -1)
        # VPU epilogue.
        dz = d_p[:, 2, :]
        t = -o_p[:, 2, :] / jnp.where(dz == 0.0, 1.0, dz)
        u = o_p[:, 0, :] + t * d_p[:, 0, :]
        v = o_p[:, 1, :] + t * d_p[:, 1, :]
        hit = (
            (dz != 0.0)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > eps)
            & active[:, None]
        )
        t_masked = jnp.where(hit, t, jnp.inf)
        best = jnp.argmin(t_masked, axis=0)
        best_t = jnp.take_along_axis(t_masked, best[None, :], axis=0)[0]
        return (
            jnp.where(jnp.isfinite(best_t), best, -1).astype(jnp.int32),
            best_t,
        )

    chunks_o = o_h.reshape(-1, ray_chunk, 4)
    chunks_d = d_h.reshape(-1, ray_chunk, 4)
    idx, t = jax.lax.map(chunk_hit, (chunks_o, chunks_d))
    return idx.reshape(-1)[:num_rays], t.reshape(-1)[:num_rays]
