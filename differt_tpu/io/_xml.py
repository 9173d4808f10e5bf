"""Mitsuba/Sionna XML scene loader.

Native replacement for the reference's Rust loader
(differt-core/src/geometry/{sionna,scene}.rs): parses ``<bsdf>`` materials
(twosided / diffuse / itu-radio-material) and ``<shape>`` file references,
loads each shape mesh (OBJ/PLY), tags it with color + material, and merges
everything into one :class:`Mesh` with per-object bounds.
"""

import warnings
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from os import PathLike
from pathlib import Path

# Sionna-RT's ITU material display colors (public data from
# NVlabs/sionna-rt itu_material.py, mirrored by the reference at
# sionna.rs:249-269).
_ITU_COLORS: dict[str, tuple[float, float, float]] = {
    "vacuum": (0.8, 0.8, 0.8),
    "marble": (0.701, 0.644, 0.485),
    "concrete": (0.539, 0.539, 0.539),
    "wood": (0.266, 0.109, 0.060),
    "metal": (0.220, 0.220, 0.254),
    "brick": (0.402, 0.112, 0.087),
    "glass": (0.168, 0.139, 0.509),
    "floorboard": (0.539, 0.386, 0.025),
    "ceiling_board": (0.376, 0.539, 0.117),
    "chipboard": (0.509, 0.159, 0.323),
    "plasterboard": (0.051, 0.539, 0.133),
    "plywood": (0.136, 0.076, 0.539),
    "very_dry_ground": (0.539, 0.319, 0.223),
    "medium_dry_ground": (0.539, 0.181, 0.076),
    "wet_ground": (0.539, 0.027, 0.147),
    "clear_acrylic": (0.198, 0.804, 0.818),
    "vinyl_tile": (0.334, 0.046, 0.670),
    "carpet_tile": (0.836, 0.419, 0.888),
    "asphalt_concrete": (0.119, 0.282, 0.297),
}


@dataclass
class SionnaMaterial:
    """A material parsed from a Sionna XML scene."""

    name: str
    id: str
    color: tuple[float, float, float]
    thickness: float | None = None


@dataclass
class SionnaShape:
    """A shape (mesh file reference) parsed from a Sionna XML scene."""

    type: str
    id: str
    file: str
    material_id: str


@dataclass
class SionnaScene:
    """Parsed materials and shapes of a Sionna XML scene.

    API parity: ``differt_core.geometry.SionnaScene`` (sionna.rs:24-38).
    """

    materials: dict[str, SionnaMaterial]
    shapes: dict[str, SionnaShape]

    @classmethod
    def load_xml(cls, file: str | PathLike[str]) -> "SionnaScene":
        """Parse a Sionna/Mitsuba ``scene.xml`` file."""
        root = ET.parse(file).getroot()
        materials: dict[str, SionnaMaterial] = {}
        shapes: dict[str, SionnaShape] = {}

        def parse_rgb(elem: ET.Element | None) -> tuple[float, float, float] | None:
            if elem is None:
                return None
            value = elem.get("value", "")
            parts = value.split()
            if len(parts) != 3:
                return None
            return tuple(float(v) for v in parts)  # type: ignore[return-value]

        for bsdf in root.iter("bsdf"):
            bsdf_type = bsdf.get("type")
            bsdf_id = bsdf.get("id")
            if bsdf_id is None:
                continue
            if bsdf_type == "itu-radio-material":
                itu_type = None
                thickness = None
                for s in bsdf.iter("string"):
                    if s.get("name") == "type":
                        itu_type = s.get("value")
                for f in bsdf.iter("float"):
                    if f.get("name") == "thickness":
                        thickness = float(f.get("value", "0"))
                if itu_type is None:
                    continue
                color = _ITU_COLORS.get(itu_type)
                if color is None:
                    warnings.warn(
                        f"unknown material type: {itu_type!r}, using default "
                        "color, i.e., black",
                        stacklevel=2,
                    )
                    color = (0.0, 0.0, 0.0)
                materials[bsdf_id] = SionnaMaterial(
                    name=f"itu_{itu_type}",
                    id=bsdf_id,
                    color=color,
                    thickness=thickness,
                )
            elif bsdf_type in ("twosided", "diffuse"):
                rgb = None
                for sub in bsdf.iter("rgb"):
                    rgb = parse_rgb(sub)
                    if rgb is not None:
                        break
                if rgb is None:
                    rgb = (0.0, 0.0, 0.0)
                name = bsdf_id.removeprefix("mat-")
                materials[bsdf_id] = SionnaMaterial(
                    name=name, id=bsdf_id, color=rgb
                )

        for shape in root.iter("shape"):
            shape_type = shape.get("type")
            shape_id = shape.get("id")
            if shape_type is None or shape_id is None:
                continue
            filename = None
            for s in shape.iter("string"):
                if s.get("name") == "filename":
                    filename = s.get("value")
            material_id = None
            for ref in shape.iter("ref"):
                material_id = ref.get("id")
            if filename is None:
                continue
            shapes[shape_id] = SionnaShape(
                type=shape_type,
                id=shape_id,
                file=filename,
                material_id=material_id or "",
            )

        return cls(materials=materials, shapes=shapes)


def load_scene_xml(file: str | PathLike[str]):
    """Load a Sionna XML scene into a single merged :class:`Mesh`.

    Reference parity: scene.rs:36-70.

    >>> import os, tempfile
    >>> xml = (
    ...     '<scene version="2.1.0">'
    ...     '<bsdf type="twosided" id="mat-wall">'
    ...     '<rgb value="0.8 0.1 0.1" name="reflectance"/></bsdf>'
    ...     '<shape type="obj" id="wall">'
    ...     '<string name="filename" value="meshes/wall.obj"/>'
    ...     '<ref id="mat-wall"/></shape></scene>'
    ... )
    >>> with tempfile.TemporaryDirectory() as d:
    ...     os.mkdir(os.path.join(d, "meshes"))
    ...     _ = open(os.path.join(d, "meshes", "wall.obj"), "w").write(
    ...         "v 0 0 0\\nv 1 0 0\\nv 0 1 0\\nf 1 2 3\\n"
    ...     )
    ...     _ = open(os.path.join(d, "scene.xml"), "w").write(xml)
    ...     mesh = load_scene_xml(os.path.join(d, "scene.xml"))
    >>> mesh.num_primitives
    1
    >>> [round(float(c), 2) for c in mesh.face_colors[0]]
    [0.8, 0.1, 0.1]
    """
    from ._obj import load_obj
    from ._ply import load_ply

    path = Path(file)
    sionna = SionnaScene.load_xml(path)
    folder = path.parent

    mesh = None
    for shape in sionna.shapes.values():
        shape_path = folder / shape.file
        if shape.type == "obj":
            part = load_obj(shape_path)
        elif shape.type == "ply":
            part = load_ply(shape_path)
        else:
            warnings.warn(
                f"Unsupported shape type {shape.type}, skipping.", stacklevel=2
            )
            continue

        material = sionna.materials.get(shape.material_id)
        if material is not None:
            part = part.set_face_colors(list(material.color))
            part = part.set_materials(material.name)

        mesh = part if mesh is None else mesh.append(part)

    if mesh is None:
        from ..geometry._mesh import Mesh

        return Mesh.empty()
    return mesh
