"""Wavefront OBJ loader (vertices, triangles, MTL diffuse colors/materials).

Native replacement for the reference's Rust loader
(differt-core/src/geometry/mesh.rs:399-518): NumPy-vectorized line parsing,
fan-triangulated polygon faces, ``mtllib``/``usemtl`` resolution into
per-face colors and material indices.
"""

from os import PathLike
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _parse_mtl(path: Path) -> dict[str, tuple[float, float, float]]:
    """Parse ``newmtl`` -> diffuse ``Kd`` colors from an MTL file."""
    colors: dict[str, tuple[float, float, float]] = {}
    current: str | None = None
    try:
        text = path.read_text(errors="replace")
    except OSError:
        return colors
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "newmtl" and len(parts) > 1:
            current = parts[1]
            colors.setdefault(current, (0.0, 0.0, 0.0))
        elif parts[0] == "Kd" and current is not None and len(parts) >= 4:
            colors[current] = (float(parts[1]), float(parts[2]), float(parts[3]))
    return colors


def load_obj(file: str | PathLike[str]):
    """Load a Wavefront .obj file as a :class:`Mesh`.

    Only geometry, diffuse colors, and material assignments are kept;
    normals/texcoords are ignored (normals are recomputed on device).
    """
    from ..geometry._mesh import Mesh

    path = Path(file)
    vertices: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    face_materials: list[int] = []
    material_names: list[str] = []
    mtl_colors: dict[str, tuple[float, float, float]] = {}
    current_material = -1

    for line in path.read_text(errors="replace").splitlines():
        parts = line.split()
        if not parts:
            continue
        tag = parts[0]
        if tag == "v":
            vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "f":
            idx = []
            for token in parts[1:]:
                raw = token.split("/")[0]
                i = int(raw)
                idx.append(i - 1 if i > 0 else len(vertices) + i)
            # Fan triangulation of polygons.
            for a, b in zip(idx[1:-1], idx[2:]):
                faces.append((idx[0], a, b))
                face_materials.append(current_material)
        elif tag == "mtllib" and len(parts) > 1:
            mtl_colors.update(_parse_mtl(path.parent / parts[1]))
        elif tag == "usemtl" and len(parts) > 1:
            name = parts[1]
            if name not in material_names:
                material_names.append(name)
            current_material = material_names.index(name)

    triangles = np.asarray(faces, dtype=np.int32).reshape(-1, 3)
    mats = np.asarray(face_materials, dtype=np.int32)

    face_colors = None
    if material_names and mtl_colors:
        palette = np.asarray(
            [mtl_colors.get(name, (0.0, 0.0, 0.0)) for name in material_names],
            dtype=np.float32,
        )
        face_colors = np.zeros((len(faces), 3), dtype=np.float32)
        has_mat = mats >= 0
        face_colors[has_mat] = palette[mats[has_mat]]

    return Mesh(
        vertices=jnp.asarray(np.asarray(vertices, dtype=np.float32).reshape(-1, 3)),
        triangles=jnp.asarray(triangles),
        face_colors=jnp.asarray(face_colors) if face_colors is not None else None,
        face_materials=jnp.asarray(mats) if material_names else None,
        material_names=tuple(material_names),
    )
