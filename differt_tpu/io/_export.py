"""Scene/mesh writers: Stanford PLY and Sionna/Mitsuba ``scene.xml``.

The reference is read-only (its Rust core only loads scenes); this module
adds the write direction so scenes round-trip through the exact on-disk
format Sionna-RT ships (``scene.xml`` + per-shape ``meshes/*.ply`` with
``itu-radio-material`` bsdfs — the structure parsed by
differt-core/src/geometry/{sionna,scene}.rs and by :mod:`._xml`). Used
by the test-suite to validate the XML loader against genuine-format
scenes without network access to the Sionna asset repository.
"""

import struct
from os import PathLike
from pathlib import Path
from xml.sax.saxutils import quoteattr

import numpy as np

from ._xml import _ITU_COLORS


def save_ply(mesh, file: str | PathLike[str]) -> None:
    """Write a :class:`Mesh` as a binary little-endian Stanford PLY file.

    Examples:
        Round-trip a box through PLY:

        >>> import os, tempfile
        >>> from differt_tpu.geometry import Mesh
        >>> from differt_tpu.io import load_ply, save_ply
        >>> mesh = Mesh.box(2.0, 1.0, 1.0)
        >>> path = os.path.join(tempfile.mkdtemp(), "box.ply")
        >>> save_ply(mesh, path)
        >>> int(load_ply(path).num_triangles) == int(mesh.num_triangles)
        True
    """
    vertices = np.asarray(mesh.vertices, dtype=np.float32)
    triangles = np.asarray(mesh.triangles, dtype=np.int32)
    path = Path(file)
    path.parent.mkdir(parents=True, exist_ok=True)
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {vertices.shape[0]}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        f"element face {triangles.shape[0]}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with path.open("wb") as f:
        f.write(header.encode("ascii"))
        f.write(vertices.astype("<f4").tobytes())
        face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
        faces = np.empty(triangles.shape[0], dtype=face_dtype)
        faces["n"] = 3
        faces["idx"] = triangles
        f.write(faces.tobytes())


def _itu_type(material_name: str) -> str | None:
    """Map a material name to a Sionna ITU bsdf ``type`` value."""
    name = material_name.lower()
    if name.startswith("itu_"):
        name = name[4:]
    if name in _ITU_COLORS:
        return name
    return None


def export_scene_xml(mesh, folder: str | PathLike[str]) -> Path:
    """Write ``mesh`` as a Sionna-format scene: ``scene.xml`` + PLY shapes.

    One ``<shape>`` (and one PLY file under ``meshes/``) is written per
    sub-object (``object_bounds`` entry; the whole mesh if unset), each
    referencing an ``itu-radio-material`` ``<bsdf>`` derived from the
    object's material name. Returns the path of the written ``scene.xml``,
    loadable with :func:`load_scene_xml` / ``Scene.load_xml``.
    """
    folder = Path(folder)
    (folder / "meshes").mkdir(parents=True, exist_ok=True)

    objects = list(mesh.iter_objects()) if mesh.object_bounds is not None else [mesh]

    bsdfs: dict[str, str] = {}  # material id -> xml snippet
    shapes: list[str] = []
    for i, obj in enumerate(objects):
        mat_name = None
        if (
            obj.face_materials is not None
            and obj.material_names
            and obj.num_triangles > 0
        ):
            idx = int(np.asarray(obj.face_materials)[0])
            if 0 <= idx < len(obj.material_names):
                mat_name = obj.material_names[idx]
        itu = _itu_type(mat_name) if mat_name else None
        if itu is None:
            itu = "concrete"  # Sionna's default radio material
        mat_id = f"mat-itu_{itu}"
        if mat_id not in bsdfs:
            bsdfs[mat_id] = (
                f"    <bsdf type=\"itu-radio-material\" id={quoteattr(mat_id)}>\n"
                f"        <string name=\"type\" value={quoteattr(itu)}/>\n"
                f"    </bsdf>\n"
            )
        filename = f"meshes/object_{i}.ply"
        # Sub-objects share the parent vertex buffer; PLY shapes are
        # self-contained, so renumber to the vertices actually used.
        save_ply(obj.drop_unused_vertices(), folder / filename)
        shapes.append(
            f"    <shape type=\"ply\" id={quoteattr(f'mesh-object_{i}')}>\n"
            f"        <string name=\"filename\" value={quoteattr(filename)}/>\n"
            f"        <ref id={quoteattr(mat_id)} name=\"bsdf\"/>\n"
            f"        <boolean name=\"face_normals\" value=\"true\"/>\n"
            f"    </shape>\n"
        )

    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        "<scene version=\"2.1.0\">\n"
        "    <default name=\"spp\" value=\"4096\"/>\n"
        "    <default name=\"resx\" value=\"1024\"/>\n"
        "    <default name=\"resy\" value=\"768\"/>\n"
        "    <integrator type=\"path\">\n"
        "        <integer name=\"max_depth\" value=\"12\"/>\n"
        "    </integrator>\n"
        + "".join(bsdfs.values())
        + "".join(shapes)
        + "</scene>\n"
    )
    scene_path = folder / "scene.xml"
    scene_path.write_text(xml, encoding="utf-8")
    return scene_path
