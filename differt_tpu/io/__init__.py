"""Scene and mesh file IO (OBJ, PLY, Sionna XML) + scene asset management.

Native replacements for the reference's Rust core loaders
(differt-core/src/geometry/{mesh,scene,sionna}.rs).
"""

from ._export import export_scene_xml, save_ply
from ._obj import load_obj
from ._ply import load_ply
from ._sionna import download_sionna_scenes, get_sionna_scene, list_sionna_scenes
from ._xml import SionnaMaterial, SionnaScene, SionnaShape, load_scene_xml

__all__ = [
    "SionnaMaterial",
    "SionnaScene",
    "SionnaShape",
    "download_sionna_scenes",
    "export_scene_xml",
    "get_sionna_scene",
    "list_sionna_scenes",
    "load_obj",
    "load_ply",
    "load_scene_xml",
    "save_ply",
]
