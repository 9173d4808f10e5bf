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


class TestEmptyAndDegenerate:
    def test_empty_append_identity(self) -> None:
        mesh = Mesh.box().set_materials("Concrete")
        merged = Mesh.empty() + mesh
        assert merged.num_triangles == mesh.num_triangles
        chex.assert_trees_all_close(
            merged.triangle_vertices, mesh.triangle_vertices
        )
        assert merged.material_names == ("Concrete",)

    def test_append_empty_keeps_bounds_for_nonempty_side(self) -> None:
        box = Mesh.box()
        mesh = box + Mesh.empty()
        assert mesh.object_bounds is not None
        np.testing.assert_array_equal(
            np.asarray(mesh.object_bounds), np.asarray(box.object_bounds)
        )

    def test_empty_connectivity(self) -> None:
        adj_t, adj_e = Mesh.empty()._connectivity()
        assert adj_t.shape == (0, 3)
        assert adj_e.shape == (0, 3)

    def test_empty_diffraction_edges(self) -> None:
        assert Mesh.empty().diffraction_edges.shape == (0, 2, 3)

    def test_empty_bounding_box_raises(self) -> None:
        with pytest.raises(ValueError):
            Mesh.empty().bounding_box  # noqa: B018 - reduction over nothing.

    def test_degenerate_triangle_normal_is_zero_safe(self) -> None:
        verts = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        tris = jnp.array([[0, 1, 2]])
        mesh = Mesh(vertices=verts, triangles=tris)
        assert bool(jnp.isfinite(mesh.normals).all())

    def test_degenerate_wedge_angles_finite(self) -> None:
        # Two coplanar triangles: the shared edge must not diffract, and
        # wedge n must stay finite (n = 1 for non-diffracting edges).
        mesh = Mesh.plane(jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]))
        mesh = mesh.dedup_vertices()
        n = mesh.wedge_angles
        assert bool(jnp.isfinite(n).all())
        chex.assert_trees_all_close(n, jnp.ones_like(n))

    def test_getitem_empty_selection(self) -> None:
        sub = Mesh.box()[0:0]
        assert sub.num_triangles == 0
        assert sub.is_empty


class TestQuadsMaskBounds:
    """Interactions between assume_quads, mask, and object_bounds."""

    def test_box_quad_counts(self) -> None:
        mesh = Mesh.box(with_top=True).set_assume_quads()
        assert mesh.assume_quads
        assert mesh.num_quads == 6
        assert mesh.num_primitives == 6
        assert mesh.num_triangles == 12

    def test_num_quads_requires_flag(self) -> None:
        with pytest.raises(ValueError, match="assume_quads"):
            Mesh.box().num_quads  # noqa: B018 - flag not set.

    def test_masked_quad_counts_are_traceable(self) -> None:
        mesh = Mesh.box(with_top=True).set_assume_quads()
        mask = jnp.arange(12) < 6  # First three quads active.
        mesh = mesh.set_mask(mask)
        assert int(mesh.num_active_quads) == 3
        assert int(mesh.num_active_triangles) == 6

        def f(m):
            return m.num_active_primitives

        assert int(jax.jit(f)(mesh)) == 3

    def test_getitem_drops_quads_and_bounds(self) -> None:
        mesh = Mesh.box(with_top=True)
        assert mesh.object_bounds is not None
        sub = mesh[0:4]
        assert not sub.assume_quads
        assert sub.object_bounds is None

    def test_iter_objects_preserves_quadness(self) -> None:
        mesh = Mesh.box(with_top=True).set_assume_quads()
        for obj in mesh.iter_objects():
            assert obj.assume_quads  # Each face is one quad (2 triangles).
            assert obj.num_quads == 1

    def test_append_quads_flag_is_conjunction(self) -> None:
        quads = Mesh.box().set_assume_quads()
        tris = Mesh.plane(jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]))
        assert not tris.assume_quads
        assert (quads + quads).assume_quads
        assert not (quads + tris).assume_quads

    def test_append_object_bounds_offsets(self) -> None:
        a = Mesh.box()  # 10 triangles, 5 objects.
        b = Mesh.box(with_top=True)  # 12 triangles, 6 objects.
        merged = a + b
        bounds = np.asarray(merged.object_bounds)
        assert bounds.shape == (11, 2)
        assert bounds[0, 0] == 0
        assert bounds[-1, 1] == 22
        # Bounds are contiguous and non-overlapping.
        np.testing.assert_array_equal(bounds[1:, 0], bounds[:-1, 1])

    def test_mask_propagates_through_append(self) -> None:
        a = Mesh.box().set_mask(jnp.zeros(10, dtype=bool))
        b = Mesh.box()
        merged = a + b
        assert merged.mask is not None
        np.testing.assert_array_equal(
            np.asarray(merged.mask), [False] * 10 + [True] * 10
        )
        assert int(merged.num_active_triangles) == 10

    def test_masked_materializes_and_clears_mask(self) -> None:
        mesh = Mesh.box(with_top=True).set_mask(jnp.arange(12) % 2 == 0)
        materialized = mesh.masked()
        assert materialized.mask is None
        assert materialized.num_triangles == 6

    def test_sample_by_index_vs_masking(self, key) -> None:
        mesh = Mesh.box(with_top=True)
        by_index = mesh.sample(4, key=key)
        assert by_index.num_triangles == 4
        by_mask = mesh.sample(4, by_masking=True, key=key)
        assert by_mask.num_triangles == 12
        assert int(by_mask.num_active_triangles) == 4

    def test_sample_preserve_intersects_existing_mask(self, key) -> None:
        mesh = Mesh.box(with_top=True).set_mask(jnp.arange(12) < 4)
        sampled = mesh.sample(8, by_masking=True, preserve=True, key=key)
        # preserve=True: new mask is a subset of the old one.
        assert int(sampled.num_active_triangles) <= 4
        assert bool((np.asarray(sampled.mask) <= np.asarray(mesh.mask)).all())

    def test_clip_composes_with_mask(self) -> None:
        mesh = Mesh.box(with_top=True).set_mask(jnp.arange(12) < 6)
        clipped = mesh.clip(z_min=-10.0)  # No-op limit.
        np.testing.assert_array_equal(
            np.asarray(clipped.mask), np.asarray(mesh.mask)
        )

    def test_keep_all_vs_any_within(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0, with_top=True)
        # A box that cuts through the mesh: every triangle has some vertex
        # inside, few have all vertices inside.
        box = jnp.array([[-1.1, -1.1, -1.1], [1.1, 1.1, 0.0]])
        n_all = int(mesh.keep_all_within(box).num_active_triangles)
        n_any = int(mesh.keep_any_within(box).num_active_triangles)
        assert n_all < n_any <= mesh.num_triangles

    def test_shuffle_preserves_face_attribute_alignment(self, key) -> None:
        mesh = Mesh.box(with_top=True)
        mesh = mesh.set_materials("A").set_face_materials(jnp.arange(12) % 2)
        mesh = mesh.set_face_colors(jnp.arange(36, dtype=jnp.float32).reshape(12, 3))
        shuffled = mesh.shuffle(key=key)
        # Triangles keep their own colors/materials after shuffling.
        orig = {
            tuple(np.asarray(tv).reshape(-1).tolist()): (int(m), tuple(np.asarray(c)))
            for tv, m, c in zip(
                mesh.triangle_vertices, mesh.face_materials, mesh.face_colors
            )
        }
        for tv, m, c in zip(
            shuffled.triangle_vertices,
            shuffled.face_materials,
            shuffled.face_colors,
        ):
            assert orig[tuple(np.asarray(tv).reshape(-1).tolist())] == (
                int(m),
                tuple(np.asarray(c)),
            )


class TestAppendMaterials:
    def test_material_remap_overlapping_names(self) -> None:
        a = Mesh.box().set_materials("Concrete")
        b = Mesh.box()
        b = b.set_materials("Glass", "Concrete").set_face_materials(
            jnp.arange(10) % 2  # Alternating Glass(0)/Concrete(1).
        )
        merged = a + b
        assert merged.material_names == ("Concrete", "Glass")
        mats = np.asarray(merged.face_materials)
        np.testing.assert_array_equal(mats[:10], 0)
        # b's Glass(0) -> 1, b's Concrete(1) -> 0 after the remap.
        np.testing.assert_array_equal(mats[10:], [1, 0] * 5)

    def test_material_only_on_other_side(self) -> None:
        a = Mesh.box()
        b = Mesh.box().set_materials("Glass")
        merged = a + b
        mats = np.asarray(merged.face_materials)
        np.testing.assert_array_equal(mats[:10], -1)  # Unknown material.
        np.testing.assert_array_equal(mats[10:], 0)

    def test_colors_default_black_on_missing_side(self) -> None:
        a = Mesh.box()
        b = Mesh.box().set_face_colors(jnp.array([1.0, 0.0, 0.0]))
        merged = a + b
        colors = np.asarray(merged.face_colors)
        np.testing.assert_allclose(colors[:10], 0.0)
        np.testing.assert_allclose(
            colors[10:], np.broadcast_to([1.0, 0.0, 0.0], (10, 3))
        )

    def test_set_face_colors_random_per_object(self, key) -> None:
        mesh = Mesh.box(with_top=True).set_face_colors(key=key)
        colors = np.asarray(mesh.face_colors)
        # Both triangles of each quad-face object share one color.
        for start in range(0, 12, 2):
            np.testing.assert_allclose(colors[start], colors[start + 1])

    def test_set_face_colors_rejects_both_args(self, key) -> None:
        with pytest.raises(ValueError, match="one of"):
            Mesh.box().set_face_colors(jnp.zeros(3), key=key)


class TestConnectivityAndWedges:
    def test_box_wedges_are_convex(self) -> None:
        mesh = Mesh.box(1.0, 1.0, 1.0, with_top=True).dedup_vertices()
        edges, adj, wedge_n = mesh._diffraction_edges_info()
        assert edges.shape[0] == 12  # A cube has 12 geometric edges.
        assert bool((np.asarray(adj) >= 0).all())
        # All cube edges are right-angle convex wedges: n = 1.5.
        np.testing.assert_allclose(np.asarray(wedge_n), 1.5, atol=1e-5)

    def test_non_manifold_warning(self) -> None:
        verts = jnp.array(
            [
                [0.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, -1.0, 0.0],
            ]
        )
        tris = jnp.array([[0, 1, 2], [0, 1, 3], [0, 1, 4]])
        mesh = Mesh(vertices=verts, triangles=tris, assume_unique_vertices=True)
        with pytest.warns(UserWarning, match="non-manifold"):
            jax.block_until_ready(mesh._connectivity())

    def test_manifold_mesh_does_not_warn(self) -> None:
        import warnings as _warnings

        mesh = Mesh.box(with_top=True).dedup_vertices()
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", UserWarning)
            jax.block_until_ready(mesh._connectivity())

    def test_non_manifold_edge_excluded_from_diffraction(self) -> None:
        verts = jnp.array(
            [
                [0.0, 0.0, 0.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [0.0, -1.0, 0.0],
            ]
        )
        tris = jnp.array([[0, 1, 2], [0, 1, 3], [0, 1, 4]])
        mesh = Mesh(vertices=verts, triangles=tris, assume_unique_vertices=True)
        with pytest.warns(UserWarning, match="non-manifold"):
            edges = jax.block_until_ready(mesh.diffraction_edges)
        # The shared 0-1 edge is non-manifold; remaining edges are boundary
        # (single-sided), so nothing diffracts.
        assert edges.shape[0] == 0

    def test_mask_excludes_edges_of_inactive_faces(self) -> None:
        mesh = Mesh.box(with_top=True).dedup_vertices()
        full = int(mesh.diffraction_edges_mask.sum())
        masked = mesh.set_mask(jnp.arange(12) < 6)
        reduced = int(masked.diffraction_edges_mask.sum())
        assert 0 < reduced < full

    def test_quad_diagonal_not_a_diffraction_edge(self) -> None:
        # One square plane as a quad: the diagonal between its two
        # triangles must not appear as a (coplanar, but also excluded
        # by assume_quads) edge.
        mesh = (
            Mesh.plane(jnp.zeros(3), normal=jnp.array([0.0, 0.0, 1.0]))
            .set_assume_quads()
            .dedup_vertices()
        )
        adj_t, _ = mesh._connectivity()
        assert bool((np.asarray(adj_t) == -1).all())


class TestTransforms:
    def test_rotate_preserves_topology_and_normals(self) -> None:
        from differt_tpu.geometry import rotation_matrix_along_axis

        mesh = Mesh.box(with_top=True)
        rot = rotation_matrix_along_axis(
            jnp.array(0.7), jnp.array([0.0, 0.0, 1.0])
        )
        rotated = mesh.rotate(rot)
        np.testing.assert_array_equal(
            np.asarray(rotated.triangles), np.asarray(mesh.triangles)
        )
        chex.assert_trees_all_close(
            rotated.normals, mesh.normals @ rot.T, atol=1e-6
        )

    def test_scale_scales_bounding_box(self) -> None:
        mesh = Mesh.box(2.0, 2.0, 2.0)
        scaled = mesh.scale(3.0)
        chex.assert_trees_all_close(
            scaled.bounding_box, mesh.bounding_box * 3.0
        )

    def test_dedup_with_rounding(self) -> None:
        mesh = Mesh.box()
        jittered = eqx_tree_at_vertices(
            mesh, mesh.vertices + 1e-6 * jnp.arange(mesh.vertices.shape[0])[:, None]
        )
        doubled = mesh + jittered
        assert doubled.dedup_vertices().vertices.shape[0] > 8
        assert doubled.dedup_vertices(num_decimals=3).vertices.shape[0] == 8


def eqx_tree_at_vertices(mesh: Mesh, vertices) -> Mesh:
    from differt_tpu import treekit as tk

    return tk.tree_at(lambda m: m.vertices, mesh, vertices)


def test_compute_paths_deprecated() -> None:
    scene = Scene(
        transmitters=jnp.array([-1.0, 0.0, 0.0]),
        receivers=jnp.array([1.0, 0.0, 0.0]),
        mesh=Mesh.box(4.0, 4.0, 4.0, with_top=True),
    )
    with pytest.warns(DeprecationWarning):
        paths = scene.compute_paths(order=0)
    assert bool(paths.mask.all())
