"""Tests for the image-method and Fermat path solvers against the corridor oracle."""

import chex
import jax
import jax.numpy as jnp

from differt_tpu.rt import (
    consecutive_vertices_are_on_same_side_of_mirror,
    fermat_path_on_planar_mirrors,
    image_method,
    image_of_vertex_with_respect_to_mirror,
    intersection_of_ray_with_plane,
)
from differt_tpu.geometry import assemble_path, path_length

from .utils import corridor_setup


def test_image_of_vertex() -> None:
    image = image_of_vertex_with_respect_to_mirror(
        jnp.array([0.0, 2.0, 0.0]),
        jnp.array([0.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )
    chex.assert_trees_all_close(image, jnp.array([0.0, -2.0, 0.0]))


def test_intersection_with_plane() -> None:
    point = intersection_of_ray_with_plane(
        jnp.array([0.0, 1.0, 0.0]),
        jnp.array([1.0, -1.0, 0.0]),
        jnp.zeros(3),
        jnp.array([0.0, 1.0, 0.0]),
    )
    chex.assert_trees_all_close(point, jnp.array([1.0, 0.0, 0.0]), atol=1e-6)


def test_corridor_oracle() -> None:
    setup = corridor_setup()
    got = image_method(
        setup.from_vertices,
        setup.to_vertices,
        setup.mirror_vertices,
        setup.mirror_normals,
    )
    chex.assert_trees_all_close(got, setup.paths, atol=1e-6)


def test_corridor_oracle_batched(key) -> None:
    setup = corridor_setup().broadcast_to(5, 7)
    got = image_method(
        setup.from_vertices,
        setup.to_vertices,
        setup.mirror_vertices,
        setup.mirror_normals,
    )
    chex.assert_trees_all_close(got, setup.paths, atol=1e-6)


def test_noeffect_noise_invariance(key) -> None:
    setup = corridor_setup().add_noeffect_noise(scale=2.0, key=key)
    got = image_method(
        setup.from_vertices,
        setup.to_vertices,
        setup.mirror_vertices,
        setup.mirror_normals,
    )
    chex.assert_trees_all_close(got, setup.paths, atol=1e-5)


def test_same_side_check() -> None:
    setup = corridor_setup()
    full = assemble_path(setup.from_vertices, setup.paths, setup.to_vertices)
    ok = consecutive_vertices_are_on_same_side_of_mirror(
        full, setup.mirror_vertices, setup.mirror_normals
    )
    assert bool(ok.all())


def test_fermat_matches_image_method() -> None:
    setup = corridor_setup()
    got = fermat_path_on_planar_mirrors(
        setup.from_vertices,
        setup.to_vertices,
        setup.mirror_vertices,
        setup.mirror_normals,
        steps=20,
    )
    chex.assert_trees_all_close(got, setup.paths, atol=1e-3)


def test_fermat_single_mirror_gradients() -> None:
    # Single ground reflection: solution is analytic (image method), and the
    # Fermat implicit-diff gradients must match the image-method gradients.
    mirror_vertex = jnp.zeros((1, 3))
    mirror_normal = jnp.array([[0.0, 0.0, 1.0]])
    tx = jnp.array([0.0, 0.0, 2.0])

    def fermat_len(rx):
        p = fermat_path_on_planar_mirrors(
            tx, rx, mirror_vertex, mirror_normal, steps=20
        )
        return path_length(assemble_path(tx, p, rx))

    def image_len(rx):
        p = image_method(tx, rx, mirror_vertex, mirror_normal)
        return path_length(assemble_path(tx, p, rx))

    rx = jnp.array([3.0, 1.0, 1.0])
    chex.assert_trees_all_close(fermat_len(rx), image_len(rx), rtol=1e-4)
    chex.assert_trees_all_close(
        jax.grad(fermat_len)(rx), jax.grad(image_len)(rx), rtol=1e-2, atol=1e-3
    )


def test_fermat_diffraction_keller_cone() -> None:
    # Diffraction on a straight edge: by Fermat's principle the angles
    # between the incident/diffracted rays and the edge are equal (Keller
    # cone condition).
    edge_origin = jnp.array([[0.0, 0.0, 0.0]])
    edge_vectors = jnp.array([[[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]]])
    tx = jnp.array([-1.0, -0.3, 0.8])
    rx = jnp.array([1.0, 0.9, 0.4])

    from differt_tpu.rt import fermat_path_on_linear_objects

    point = fermat_path_on_linear_objects(
        tx, rx, edge_origin, edge_vectors, steps=30
    )[0]
    edge_dir = jnp.array([0.0, 1.0, 0.0])
    k_in = (point - tx) / jnp.linalg.norm(point - tx)
    k_out = (rx - point) / jnp.linalg.norm(rx - point)
    cos_in = jnp.dot(k_in, edge_dir)
    cos_out = jnp.dot(k_out, edge_dir)
    chex.assert_trees_all_close(cos_in, cos_out, atol=1e-4)
