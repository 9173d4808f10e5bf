"""Tests for Mesh container operations."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt_tpu.geometry import Mesh, Scene


class TestConstructors:
    def test_plane_normal(self) -> None:
        normal = jnp.array([0.0, 0.0, 1.0])
        mesh = Mesh.plane(jnp.zeros(3), normal=normal, side_length=2.0)
        assert mesh.num_triangles == 2
        chex.assert_trees_all_close(
            mesh.normals, jnp.broadcast_to(normal, (2, 3)), atol=1e-6
        )
        # Area check: two triangles of a 2x2 square.
        tv = mesh.triangle_vertices
        areas = 0.5 * jnp.linalg.norm(
            jnp.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=-1
        )
        chex.assert_trees_all_close(areas.sum(), 4.0, rtol=1e-5)

    def test_plane_from_three_vertices(self) -> None:
        mesh = Mesh.plane(
            jnp.zeros(3),
            jnp.array([1.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
        chex.assert_trees_all_close(
            jnp.abs(mesh.normals[:, 2]), jnp.ones(2), atol=1e-6
        )

    def test_box_counts(self) -> None:
        assert Mesh.box().num_triangles == 10  # Bottom, no top.
        assert Mesh.box(with_top=True).num_triangles == 12
        assert Mesh.box(with_bottom=False).num_triangles == 8

    def test_box_normals_point_outward(self) -> None:
        mesh = Mesh.box(with_top=True)
        centers = mesh.triangle_vertices.mean(axis=-2)
        outward = jnp.sum(mesh.normals * centers, axis=-1)
        assert bool((outward > 0).all())

    def test_empty(self) -> None:
        assert Mesh.empty().is_empty


class TestOps:
    def test_append_offsets_and_materials(self) -> None:
        a = Mesh.box().set_materials("Concrete")
        b = Mesh.box().translate(jnp.array([5.0, 0.0, 0.0])).set_materials("Glass")
        merged = a + b
        assert merged.num_triangles == 20
        assert merged.material_names == ("Concrete", "Glass")
        np.testing.assert_array_equal(
            np.asarray(merged.face_materials),
            [0] * 10 + [1] * 10,
        )

    def test_append_same_material_names_merge(self) -> None:
        a = Mesh.box().set_materials("Concrete")
        b = Mesh.box().set_materials("Concrete")
        merged = a + b
        assert merged.material_names == ("Concrete",)
        assert np.asarray(merged.face_materials).max() == 0

    def test_dedup_vertices(self) -> None:
        mesh = Mesh.box() + Mesh.box()  # Duplicate vertex positions.
        dedup = mesh.dedup_vertices()
        assert dedup.vertices.shape[0] == 8
        chex.assert_trees_all_close(
            dedup.triangle_vertices, mesh.triangle_vertices
        )

    def test_drop_unused_vertices(self) -> None:
        mesh = Mesh.box(with_top=True)
        sub = mesh[:2]
        cleaned = sub.drop_unused_vertices()
        assert cleaned.vertices.shape[0] == 4
        chex.assert_trees_all_close(
            cleaned.triangle_vertices, sub.triangle_vertices
        )

    def test_drop_duplicates(self) -> None:
        mesh = Mesh.box()
        doubled = mesh + mesh
        dedup = doubled.dedup_vertices().drop_duplicates()
        assert dedup.num_triangles == mesh.num_triangles

    def test_center(self) -> None:
        mesh = Mesh.box().translate(jnp.array([3.0, -2.0, 7.0]))
        centered, offset = mesh.center()
        chex.assert_trees_all_close(
            centered.bounding_box.mean(axis=0), jnp.zeros(3), atol=1e-6
        )
        chex.assert_trees_all_close(offset, jnp.array([-3.0, 2.0, -7.0]))

    def test_iter_objects(self) -> None:
        mesh = Mesh.box(with_top=True)
        objects = list(mesh.iter_objects())
        assert len(objects) == 6
        assert all(o.num_triangles == 2 for o in objects)

    def test_sample_by_masking_is_fixed_shape(self, key) -> None:
        mesh = Mesh.box(with_top=True)
        sampled = mesh.sample(4, by_masking=True, key=key)
        assert sampled.num_triangles == 12
        assert int(sampled.num_active_triangles) == 4

    def test_clip(self) -> None:
        mesh = Mesh.box(with_top=True)
        clipped = mesh.clip(z_min=0.0)
        # Only upward-facing half of the faces keep their centroids above 0.
        assert int(clipped.num_active_triangles) < 12

    def test_add_ground(self) -> None:
        mesh = Mesh.box().translate(jnp.array([0.0, 0.0, 3.0]))
        grounded = mesh.add_ground()
        assert grounded.num_triangles == mesh.num_triangles + 2
        chex.assert_trees_all_close(
            grounded.vertices[-4:, 2], jnp.zeros(4), atol=1e-6
        )


class TestAtHelper:
    def test_translate_object_faces(self) -> None:
        # A box built from independent objects (no shared vertices).
        mesh = Mesh.empty()
        for obj in Mesh.box().iter_objects():
            mesh = mesh + obj.drop_unused_vertices()
        moved = mesh.at[0:2].add(jnp.array([1.0, 1.0, 0.0]))
        delta = np.asarray(moved.triangle_vertices - mesh.triangle_vertices)
        np.testing.assert_allclose(
            delta[:2], np.broadcast_to([1.0, 1.0, 0.0], (2, 3, 3))
        )
        np.testing.assert_allclose(delta[2:], 0.0)

    def test_shared_vertices_updated_once(self) -> None:
        mesh = Mesh.box()
        # Faces share vertices: updating face 0 moves neighbors too, and
        # shared vertices must be updated exactly once (not per-triangle).
        moved = mesh.at[jnp.array([0, 0, 1])].add(jnp.array([0.5, 0.0, 0.0]))
        delta = np.asarray(moved.vertices - mesh.vertices)
        moved_vertices = np.unique(np.nonzero(delta)[0])
        np.testing.assert_allclose(delta[moved_vertices, 0], 0.5)

    def test_gradient_through_vertex_update(self) -> None:
        mesh = Mesh.box()

        def total_height(shift):
            return mesh.at[0:2].add(
                jnp.array([0.0, 0.0, 1.0]) * shift
            ).vertices[:, 2].sum()

        g = jax.grad(total_height)(jnp.array(0.3))
        # Face 0-1 (a quad) touches 4 unique vertices.
        chex.assert_trees_all_close(g, 4.0)

    def test_get(self) -> None:
        mesh = Mesh.box()
        got = mesh.at[0:1].get()
        assert got.shape == (3, 3)


def test_compute_paths_deprecated() -> None:
    scene = Scene(
        transmitters=jnp.array([-1.0, 0.0, 0.0]),
        receivers=jnp.array([1.0, 0.0, 0.0]),
        mesh=Mesh.box(4.0, 4.0, 4.0, with_top=True),
    )
    with pytest.warns(DeprecationWarning):
        paths = scene.compute_paths(order=0)
    assert bool(paths.mask.all())
