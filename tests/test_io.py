"""Tests for OBJ / PLY / Sionna-XML loaders."""

import numpy as np
import pytest

from differt_tpu.io import load_obj, load_ply, load_scene_xml
from differt_tpu.io._xml import SionnaScene


@pytest.fixture
def cube_obj(tmp_path):
    path = tmp_path / "cube.obj"
    path.write_text(
        "\n".join(
            [f"v {x} {y} {z}" for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        )
        + "\nf 1 2 4 3\nf 5 7 8 6\nf 1 5 6 2\nf 3 4 8 7\nf 1 3 7 5\nf 2 6 8 4\n"
    )
    return path


def test_load_obj_cube(cube_obj) -> None:
    mesh = load_obj(cube_obj)
    assert mesh.vertices.shape == (8, 3)
    assert mesh.num_triangles == 12  # 6 quads fan-triangulated.


def test_load_obj_with_materials(tmp_path) -> None:
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n"
    )
    obj = tmp_path / "mesh.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl red\nf 1 2 3\nusemtl blue\nf 2 4 3\n"
    )
    mesh = load_obj(obj)
    assert mesh.material_names == ("red", "blue")
    np.testing.assert_array_equal(np.asarray(mesh.face_materials), [0, 1])
    np.testing.assert_allclose(
        np.asarray(mesh.face_colors), [[1, 0, 0], [0, 0, 1]]
    )


def test_load_ply_ascii(tmp_path) -> None:
    ply = tmp_path / "tri.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "3 0 1 2\n4 0 1 2 3\n"
    )
    mesh = load_ply(ply)
    assert mesh.vertices.shape == (4, 3)
    assert mesh.num_triangles == 3  # One triangle + one quad fan.


def test_load_ply_binary(tmp_path) -> None:
    import struct

    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    ).encode()
    body = b"".join(
        struct.pack("<3f", *v) for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    ) + struct.pack("<B3i", 3, 0, 1, 2)
    ply = tmp_path / "bin.ply"
    ply.write_bytes(header + body)
    mesh = load_ply(ply)
    assert mesh.vertices.shape == (3, 3)
    np.testing.assert_array_equal(np.asarray(mesh.triangles), [[0, 1, 2]])


SCENE_XML = """<?xml version="1.0"?>
<scene version="2.1.0">
  <bsdf type="itu-radio-material" id="mat-itu_concrete">
    <string name="type" value="concrete"/>
    <float name="thickness" value="0.1"/>
  </bsdf>
  <bsdf type="twosided" id="mat-custom">
    <bsdf type="diffuse">
      <rgb value="0.2 0.4 0.6" name="reflectance"/>
    </bsdf>
  </bsdf>
  <shape type="obj" id="building">
    <string name="filename" value="meshes/building.obj"/>
    <ref id="mat-itu_concrete" name="bsdf"/>
  </shape>
  <shape type="obj" id="ground">
    <string name="filename" value="meshes/ground.obj"/>
    <ref id="mat-custom" name="bsdf"/>
  </shape>
</scene>
"""


@pytest.fixture
def sionna_dir(tmp_path):
    (tmp_path / "meshes").mkdir()
    (tmp_path / "meshes" / "building.obj").write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    (tmp_path / "meshes" / "ground.obj").write_text(
        "v 0 0 0\nv 2 0 0\nv 0 2 0\nv 2 2 0\nf 1 2 4 3\n"
    )
    (tmp_path / "scene.xml").write_text(SCENE_XML)
    return tmp_path


def test_sionna_xml_parse(sionna_dir) -> None:
    scene = SionnaScene.load_xml(sionna_dir / "scene.xml")
    assert set(scene.materials) == {"mat-itu_concrete", "mat-custom"}
    concrete = scene.materials["mat-itu_concrete"]
    assert concrete.name == "itu_concrete"
    assert concrete.thickness == pytest.approx(0.1)
    assert concrete.color == pytest.approx((0.539, 0.539, 0.539))
    custom = scene.materials["mat-custom"]
    assert custom.name == "custom"
    assert custom.color == pytest.approx((0.2, 0.4, 0.6))
    assert set(scene.shapes) == {"building", "ground"}
    assert scene.shapes["building"].material_id == "mat-itu_concrete"


def test_load_scene_xml_merges(sionna_dir) -> None:
    mesh = load_scene_xml(sionna_dir / "scene.xml")
    assert mesh.num_triangles == 3  # 1 building + 2 ground.
    assert set(mesh.material_names) == {"itu_concrete", "custom"}
    assert mesh.object_bounds is not None
    assert mesh.num_objects == 2
    colors = np.asarray(mesh.face_colors)
    assert colors.shape == (3, 3)


def test_scene_load_xml_api(sionna_dir) -> None:
    from differt_tpu.geometry import Scene

    scene = Scene.load_xml(sionna_dir / "scene.xml")
    assert scene.mesh.num_triangles == 3


def test_sionna_cli_list_and_path(tmp_path, monkeypatch, capsys) -> None:
    # Pre-populate a fake cache and exercise the CLI offline.
    scenes = tmp_path / "x" / "rt" / "scenes" / "demo"
    scenes.mkdir(parents=True)
    (scenes / "demo.xml").write_text("<scene version='2.1.0'></scene>")

    from differt_tpu.io.__main__ import main

    assert main(["list", "--folder", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "demo" in out
    assert main(["path", "demo", "--folder", str(tmp_path)]) == 0
    out = capsys.readouterr().out.strip()
    assert out.endswith("demo.xml")


class TestSceneExport:
    """Round-trip: procedural scene -> Sionna-format scene.xml + PLY -> load."""

    def test_save_ply_roundtrip(self, tmp_path) -> None:
        from differt_tpu.geometry import Mesh
        from differt_tpu.io import load_ply, save_ply

        mesh = Mesh.box(2.0, 3.0, 4.0, with_top=True)
        save_ply(mesh, tmp_path / "box.ply")
        back = load_ply(tmp_path / "box.ply")
        np.testing.assert_allclose(
            np.asarray(back.vertices), np.asarray(mesh.vertices)
        )
        np.testing.assert_array_equal(
            np.asarray(back.triangles), np.asarray(mesh.triangles)
        )

    def test_export_scene_xml_roundtrip(self, tmp_path) -> None:
        from differt_tpu.geometry import Scene
        from differt_tpu.io import export_scene_xml
        from differt_tpu.scenes import street_canyon_scene

        scene = street_canyon_scene(with_ground=True)
        mesh = scene.mesh.set_materials("itu_concrete")
        xml_path = export_scene_xml(mesh, tmp_path / "canyon")
        assert xml_path.name == "scene.xml"

        loaded = Scene.load_xml(xml_path).mesh
        assert loaded.num_triangles == mesh.num_triangles
        # Vertex sharing across objects is lost in per-shape files (as in
        # the reference loader); geometry must be identical per triangle,
        # and triangle order is preserved.
        np.testing.assert_allclose(
            np.asarray(loaded.triangle_vertices),
            np.asarray(mesh.triangle_vertices),
            atol=1e-6,
        )
        assert loaded.material_names == ("itu_concrete",)
        assert loaded.face_materials is not None
        assert np.all(np.asarray(loaded.face_materials) == 0)
        # ITU display color attached from the bsdf type.
        assert loaded.face_colors is not None
        np.testing.assert_allclose(
            np.asarray(loaded.face_colors)[0], [0.539, 0.539, 0.539], atol=1e-6
        )
        # One object per exported shape.
        assert loaded.object_bounds is not None
        num_objects = (
            len(list(mesh.iter_objects())) if mesh.object_bounds is not None else 1
        )
        assert loaded.object_bounds.shape[0] == num_objects

    def test_export_traces_same_paths(self, tmp_path) -> None:
        """The round-tripped scene traces identical order-1 paths."""
        import jax.numpy as jnp

        from differt_tpu import treekit as tk
        from differt_tpu.geometry import Scene
        from differt_tpu.io import export_scene_xml
        from differt_tpu.scenes import street_canyon_scene

        base = street_canyon_scene(with_ground=True)
        tx = jnp.array([[-30.0, 0.0, 5.0]])
        rx = jnp.array([[20.0, 3.0, 1.5]])
        scene = tk.tree_at(
            lambda s: (s.transmitters, s.receivers), base, (tx, rx)
        )
        xml_path = export_scene_xml(scene.mesh.set_materials("itu_concrete"),
                                    tmp_path / "rt")
        scene2 = Scene.load_xml(xml_path)
        scene2 = tk.tree_at(
            lambda s: (s.transmitters, s.receivers), scene2, (tx, rx)
        )
        p1 = scene.trace_paths(order=1)
        p2 = scene2.trace_paths(order=1)
        assert int(p1.num_valid_paths) == int(p2.num_valid_paths) > 0
        np.testing.assert_allclose(
            np.asarray(p1.masked_vertices),
            np.asarray(p2.masked_vertices),
            atol=1e-5,
        )


class TestSionnaXmlReferenceCorpus:
    """Independent (non-round-trip) XML parse oracle.

    Every case transcribes a snippet + expected values from the
    reference's Rust test corpus (differt-core/src/geometry/sionna.rs:
    396-767): per-ITU-material ``itu-radio-material`` bsdfs and the
    twosided/diffuse structures, asserted to parse to the same
    name/color values the Rust tests assert.
    """

    # (snippet id attr, itu type string, expected color) — one row per
    # Rust `deserializes_itu_*` test (sionna.rs:482-745).
    ITU_CASES = [
        ("marble", "marble", (0.701, 0.644, 0.485)),
        ("concrete", "concrete", (0.539, 0.539, 0.539)),
        ("wood", "wood", (0.266, 0.109, 0.060)),
        ("metal", "metal", (0.220, 0.220, 0.254)),
        ("brick", "brick", (0.402, 0.112, 0.087)),
        ("glass", "glass", (0.168, 0.139, 0.509)),
        ("floorboard", "floorboard", (0.539, 0.386, 0.025)),
        ("ceiling", "ceiling_board", (0.376, 0.539, 0.117)),
        ("chipboard", "chipboard", (0.509, 0.159, 0.323)),
        ("plasterboard", "plasterboard", (0.051, 0.539, 0.133)),
        ("plywood", "plywood", (0.136, 0.076, 0.539)),
        ("ground", "very_dry_ground", (0.539, 0.319, 0.223)),
        ("ground", "medium_dry_ground", (0.539, 0.181, 0.076)),
        ("ground", "wet_ground", (0.539, 0.027, 0.147)),
        ("vacuum", "vacuum", (0.8, 0.8, 0.8)),
        ("acrylic", "clear_acrylic", (0.198, 0.804, 0.818)),
        ("vinyl", "vinyl_tile", (0.334, 0.046, 0.670)),
        ("carpet", "carpet_tile", (0.836, 0.419, 0.888)),
        ("asphalt", "asphalt_concrete", (0.119, 0.282, 0.297)),
    ]

    @staticmethod
    def _parse(tmp_path, body: str):
        path = tmp_path / "scene.xml"
        path.write_text(f'<scene version="2.1.0">{body}</scene>')
        return SionnaScene.load_xml(path)

    @pytest.mark.parametrize("bsdf_id,itu_type,color", ITU_CASES)
    def test_itu_material(self, tmp_path, bsdf_id, itu_type, color) -> None:
        scene = self._parse(
            tmp_path,
            f'<bsdf type="itu-radio-material" id="{bsdf_id}">'
            f'<string name="type" value="{itu_type}"/></bsdf>',
        )
        mat = scene.materials[bsdf_id]
        assert mat.name == f"itu_{itu_type}"
        np.testing.assert_allclose(mat.color, color, rtol=1e-6)

    def test_twosided_without_rgb(self, tmp_path) -> None:
        # sionna.rs:400-414 — "mat-" prefix stripped, default black.
        scene = self._parse(
            tmp_path,
            '<bsdf type="twosided" id="mat-wall"><bsdf type="diffuse"/></bsdf>',
        )
        mat = scene.materials["mat-wall"]
        assert (mat.name, mat.id) == ("wall", "mat-wall")
        assert mat.color == (0.0, 0.0, 0.0)
        assert mat.thickness is None

    def test_diffuse_without_rgb(self, tmp_path) -> None:
        # sionna.rs:416-428.
        scene = self._parse(tmp_path, '<bsdf type="diffuse" id="default-bsdf"/>')
        mat = scene.materials["default-bsdf"]
        assert mat.name == "default-bsdf"
        assert mat.color == (0.0, 0.0, 0.0)

    def test_diffuse_with_rgb(self, tmp_path) -> None:
        # sionna.rs:430-444.
        scene = self._parse(
            tmp_path,
            '<bsdf type="diffuse" id="mat-concrete">'
            '<rgb value="0.539 0.539 0.539"/></bsdf>',
        )
        mat = scene.materials["mat-concrete"]
        assert mat.name == "concrete"
        np.testing.assert_allclose(mat.color, (0.539, 0.539, 0.539))

    def test_twosided_nested_diffuse_rgb(self, tmp_path) -> None:
        # sionna.rs:446-482 (glass + wood variants).
        scene = self._parse(
            tmp_path,
            '<bsdf type="twosided" id="mat-glass"><bsdf type="diffuse">'
            '<rgb value="0.168 0.139 0.509"/></bsdf></bsdf>',
        )
        mat = scene.materials["mat-glass"]
        assert mat.name == "glass"
        np.testing.assert_allclose(mat.color, (0.168, 0.139, 0.509))

    def test_itu_unknown_type_defaults_black(self, tmp_path) -> None:
        # sionna.rs:747-764 — unknown types warn and default to black.
        with pytest.warns(UserWarning, match="unknown material type"):
            scene = self._parse(
                tmp_path,
                '<bsdf type="itu-radio-material" id="unknown">'
                '<string name="type" value="unknown_material_type"/></bsdf>',
            )
        mat = scene.materials["unknown"]
        assert mat.name == "itu_unknown_material_type"
        assert mat.color == (0.0, 0.0, 0.0)

    def test_itu_with_thickness(self, tmp_path) -> None:
        # sionna.rs:766-783 parses the same snippet; the reference SKIPS
        # the thickness (asserts None) — this repo deliberately parses it
        # (the DeepMIMO slab pipeline consumes it), so pin OUR behavior
        # while matching the Rust-asserted name/color.
        scene = self._parse(
            tmp_path,
            '<bsdf type="itu-radio-material" id="window">'
            '<string name="type" value="glass"/>'
            '<float name="thickness" value="0.01"/></bsdf>',
        )
        mat = scene.materials["window"]
        assert mat.name == "itu_glass"
        np.testing.assert_allclose(mat.color, (0.168, 0.139, 0.509))
        assert mat.thickness == pytest.approx(0.01)

    def test_mat_prefix_rules(self, tmp_path) -> None:
        # sionna.rs:786-825 & 851-869: only one leading "mat-" stripped,
        # other prefixes kept as-is.
        scene = self._parse(
            tmp_path,
            '<bsdf type="diffuse" id="simple_name"/>'
            '<bsdf type="diffuse" id="custom-prefix-test"/>'
            '<bsdf type="twosided" id="mat-mat-double"><bsdf type="diffuse">'
            '<rgb value="0.5 0.5 0.5"/></bsdf></bsdf>',
        )
        assert scene.materials["simple_name"].name == "simple_name"
        assert scene.materials["custom-prefix-test"].name == "custom-prefix-test"
        assert scene.materials["mat-mat-double"].name == "mat-double"

    def test_real_world_sionna_materials(self, tmp_path) -> None:
        # sionna.rs:871-911 — verbatim snippets from the upstream
        # simple_street_canyon scene.
        scene = self._parse(
            tmp_path,
            '<bsdf type="twosided" id="mat-itu_glass"><bsdf type="diffuse">'
            '<rgb value="0.212230 0.564711 0.799103"/></bsdf></bsdf>'
            '<bsdf type="twosided" id="mat-itu_wood"><bsdf type="diffuse">'
            '<rgb value="0.508881 0.168269 0.059511"/></bsdf></bsdf>',
        )
        glass = scene.materials["mat-itu_glass"]
        assert glass.name == "itu_glass"
        np.testing.assert_allclose(
            glass.color, (0.212230, 0.564711, 0.799103), rtol=1e-6
        )
        wood = scene.materials["mat-itu_wood"]
        assert wood.name == "itu_wood"
        np.testing.assert_allclose(
            wood.color, (0.508881, 0.168269, 0.059511), rtol=1e-6
        )
