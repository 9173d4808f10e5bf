"""Tests for the pure-JAX ray-casting kernels (oracles for Pallas)."""

import chex
import jax
import jax.numpy as jnp
import numpy as np

from differt_tpu.geometry import Mesh, fibonacci_lattice
from differt_tpu.rt import (
    first_triangle_hit_by_ray,
    ray_intersect_any_triangle,
    ray_intersect_triangle,
    triangles_visible_from_vertex,
)

TRIANGLE = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]])


def test_intersect_hits_center() -> None:
    origin = jnp.array([0.2, 0.2, 0.0])
    direction = jnp.array([0.0, 0.0, 2.0])
    t, hit = ray_intersect_triangle(origin, direction, TRIANGLE)
    assert bool(hit)
    chex.assert_trees_all_close(t, 0.5)  # Plane z=1 at half of direction.


def test_intersect_misses_outside() -> None:
    origin = jnp.array([2.0, 2.0, 0.0])
    direction = jnp.array([0.0, 0.0, 2.0])
    _, hit = ray_intersect_triangle(origin, direction, TRIANGLE)
    assert not bool(hit)


def test_intersect_parallel_ray() -> None:
    origin = jnp.array([0.2, 0.2, 0.0])
    direction = jnp.array([1.0, 0.0, 0.0])
    _, hit = ray_intersect_triangle(origin, direction, TRIANGLE)
    assert not bool(hit)


def test_intersect_behind_origin() -> None:
    origin = jnp.array([0.2, 0.2, 2.0])
    direction = jnp.array([0.0, 0.0, 1.0])
    _, hit = ray_intersect_triangle(origin, direction, TRIANGLE)
    assert not bool(hit)


def test_intersect_smoothed_matches_hard(key) -> None:
    origins = jax.random.uniform(key, (200, 3), minval=-1, maxval=1)
    directions = jnp.broadcast_to(jnp.array([0.0, 0.0, 3.0]), (200, 3))
    _, hard = ray_intersect_triangle(origins, directions, TRIANGLE)
    _, soft = ray_intersect_triangle(
        origins, directions, TRIANGLE, smoothing_factor=1e4
    )
    # With a steep slope, the soft test agrees with the hard one away from
    # edges.
    agree = (soft > 0.5) == hard
    assert float(agree.mean()) > 0.95


def test_anyhit_and_closest_hit_on_box() -> None:
    mesh = Mesh.box(with_top=True)
    tv = mesh.triangle_vertices
    origin = jnp.zeros(3)  # Inside the unit box.
    direction = jnp.array([4.0, 0.0, 0.0])

    blocked = ray_intersect_any_triangle(origin, direction, tv)
    assert bool(blocked)

    idx, t = first_triangle_hit_by_ray(origin, direction, tv)
    assert int(idx) >= 0
    chex.assert_trees_all_close(t * 4.0, 0.5, atol=1e-5)  # Wall at x=0.5.

    # A short segment that stops before the wall is not blocked.
    not_blocked = ray_intersect_any_triangle(
        origin, jnp.array([0.4, 0.0, 0.0]), tv
    )
    assert not bool(not_blocked)


def test_closest_hit_batching_invariance(key) -> None:
    mesh = Mesh.box(with_top=True)
    tv = mesh.triangle_vertices
    origins = jax.random.uniform(key, (64, 3), minval=-0.4, maxval=0.4)
    directions = fibonacci_lattice(64) * 10.0

    idx_full, t_full = first_triangle_hit_by_ray(
        origins, directions, tv, batch_size=None
    )
    idx_tiled, t_tiled = first_triangle_hit_by_ray(
        origins, directions, tv, batch_size=3
    )
    np.testing.assert_array_equal(np.asarray(idx_full), np.asarray(idx_tiled))
    chex.assert_trees_all_close(t_full, t_tiled)


def test_anyhit_active_mask() -> None:
    mesh = Mesh.box(with_top=True)
    tv = mesh.triangle_vertices
    origin = jnp.zeros(3)
    direction = jnp.array([4.0, 0.0, 0.0])
    idx, _ = first_triangle_hit_by_ray(origin, direction, tv)
    # Disable the hit triangle and its quad partner: nothing else lies in
    # the +x direction, so the ray reports no hit at all.
    active = jnp.ones(mesh.num_triangles, dtype=bool)
    quad = int(idx) // 2
    active = active.at[2 * quad].set(False).at[2 * quad + 1].set(False)
    idx2, t2 = first_triangle_hit_by_ray(origin, direction, tv, active)
    assert int(idx2) == -1
    assert bool(jnp.isinf(t2))


def test_visibility_box_interior() -> None:
    mesh = Mesh.box(with_top=True)
    visible = triangles_visible_from_vertex(
        jnp.zeros(3), mesh.triangle_vertices, num_rays=2000
    )
    # From the box center, every face is visible.
    assert bool(visible.all())


def test_visibility_occlusion() -> None:
    # A small box inside a big box: the big box's far walls are hidden only
    # partially, but a plane right next to the viewer hides everything
    # behind it.
    inner = Mesh.box(0.5, 0.5, 0.5, with_top=True)
    outer = Mesh.box(4.0, 4.0, 4.0, with_top=True)
    mesh = inner + outer
    visible = triangles_visible_from_vertex(
        jnp.zeros(3), mesh.triangle_vertices, num_rays=5000
    )
    # All inner faces visible, outer faces hidden by the inner box.
    assert bool(visible[: inner.num_triangles].all())
    assert not bool(visible[inner.num_triangles :].any())


def test_closest_hit_distance_gradient() -> None:
    mesh = Mesh.box(with_top=True)

    def distance(origin):
        _, t = mesh.first_triangle_hit_by_ray(
            origin, jnp.array([1.0, 0.0, 0.0])
        )
        return t

    g = jax.grad(distance)(jnp.zeros(3))
    # t = 0.5 - x0: d(t)/d(x0) = -1.
    chex.assert_trees_all_close(g, jnp.array([-1.0, 0.0, 0.0]), atol=1e-5)
