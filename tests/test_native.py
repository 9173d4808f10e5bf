"""Tests for the native C++ components vs their Python oracles."""

import numpy as np
import pytest

from differt_tpu import native
from differt_tpu.geometry import generate_all_path_candidates

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library unavailable"
)


class TestFilteredPaths:
    def test_unfiltered_matches_device_decode(self) -> None:
        got = native.filtered_path_candidates(6, 3)
        expected = np.asarray(generate_all_path_candidates(6, 3))
        np.testing.assert_array_equal(got, expected)

    def test_from_to_filters(self) -> None:
        rng = np.random.default_rng(0)
        n, order = 7, 3
        from_adj = rng.random(n) < 0.5
        to_adj = rng.random(n) < 0.5
        got = native.filtered_path_candidates(
            n, order, from_adjacency=from_adj, to_adjacency=to_adj
        )
        full = np.asarray(generate_all_path_candidates(n, order))
        keep = from_adj[full[:, 0]] & to_adj[full[:, -1]]
        np.testing.assert_array_equal(got, full[keep])

    def test_node_mask(self) -> None:
        n, order = 6, 2
        mask = np.array([True, False, True, True, False, True])
        got = native.filtered_path_candidates(n, order, node_mask=mask)
        full = np.asarray(generate_all_path_candidates(n, order))
        keep = mask[full].all(axis=-1)
        np.testing.assert_array_equal(got, full[keep])

    def test_all_filters_combined(self) -> None:
        rng = np.random.default_rng(7)
        n, order = 8, 3
        from_adj = rng.random(n) < 0.6
        to_adj = rng.random(n) < 0.6
        mask = rng.random(n) < 0.7
        got = native.filtered_path_candidates(
            n, order, from_adjacency=from_adj, to_adjacency=to_adj, node_mask=mask
        )
        full = np.asarray(generate_all_path_candidates(n, order))
        keep = (
            from_adj[full[:, 0]]
            & to_adj[full[:, -1]]
            & mask[full].all(axis=-1)
        )
        np.testing.assert_array_equal(got, full[keep])

    def test_empty_result(self) -> None:
        got = native.filtered_path_candidates(
            5, 2, from_adjacency=np.zeros(5, dtype=bool)
        )
        assert got.shape == (0, 2)


class TestObjParser:
    def _write_obj(self, tmp_path, text):
        p = tmp_path / "mesh.obj"
        p.write_text(text)
        return p

    def test_matches_python_parser(self, tmp_path) -> None:
        obj = self._write_obj(
            tmp_path,
            """
# comment
mtllib mats.mtl
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
usemtl brick
f 1 2 3
f 1/1 3/2/3 4//4
usemtl glass
f -4 -3 -2 -1
""",
        )
        (tmp_path / "mats.mtl").write_text(
            "newmtl brick\nKd 0.6 0.2 0.1\nnewmtl glass\nKd 0.1 0.1 0.8\n"
        )
        from differt_tpu.io._obj import _load_obj_native, load_obj

        native_mesh = _load_obj_native(obj)

        import differt_tpu.native as nat

        # Force the pure-Python path by faking unavailability.
        original = nat.is_available
        nat.is_available = lambda: False
        try:
            python_mesh = load_obj(obj)
        finally:
            nat.is_available = original

        np.testing.assert_allclose(
            np.asarray(native_mesh.vertices), np.asarray(python_mesh.vertices)
        )
        np.testing.assert_array_equal(
            np.asarray(native_mesh.triangles), np.asarray(python_mesh.triangles)
        )
        np.testing.assert_array_equal(
            np.asarray(native_mesh.face_materials),
            np.asarray(python_mesh.face_materials),
        )
        assert native_mesh.material_names == python_mesh.material_names
        np.testing.assert_allclose(
            np.asarray(native_mesh.face_colors),
            np.asarray(python_mesh.face_colors),
        )

    def test_quad_triangulation(self, tmp_path) -> None:
        obj = self._write_obj(
            tmp_path,
            "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n",
        )
        vertices, triangles, sections = native.parse_obj_geometry(obj)
        assert vertices.shape == (4, 3)
        np.testing.assert_array_equal(
            triangles, [[0, 1, 2], [0, 2, 3]]
        )
        np.testing.assert_array_equal(sections, [-1, -1])
