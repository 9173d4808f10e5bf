"""Import the DiffeRT reference's pure-JAX modules as correctness oracles.

The reference (``/root/reference``) depends on ``equinox``, ``beartype``,
``warp`` and the compiled ``differt_core`` extension, none of which exist
in this environment. But the modules we need as *oracles* — the image
method solver (``geometry/_solver_image_method.py``), the pure-JAX ray
kernels (``geometry/_utils.py:1135-1961``), Fresnel/materials/EM utils
(``em/_fresnel.py``, ``em/_material.py``, ``em/_utils.py``) — only use a
tiny equinox surface (``Module``, ``field``, ``filter_jit``, ``tree_at``)
that :mod:`differt_tpu.treekit` already re-implements, and import
``differt_core`` only for symbols they don't execute at import time.

This loader therefore:

1. registers a stub ``equinox`` backed by ``differt_tpu.treekit``;
2. registers a stub ``differt_core`` (+``differt_core.geometry``) exposing
   ``__version__`` and placeholder ``CompleteGraph``/``DiGraph``/
   ``Material``/``Shape``/``SionnaScene`` classes (the import surface used
   by ``differt/geometry/__init__.py:56`` and ``_utils.py:12``);
3. creates namespace-only ``differt``/``differt.geometry``/``differt.em``
   package modules whose ``__path__`` points at the reference sources, so
   the real submodules import WITHOUT executing the heavy package
   ``__init__``s (which pull in warp);
4. imports the real reference modules and re-exports the public names that
   inter-module ``from differt.geometry import ...`` statements need.

Nothing from the reference is copied — the reference files are imported
in place, read-only, purely to compare outputs (allclose) against this
repo's implementations.
"""

import importlib
import pathlib
import sys
import types

REF_SRC = pathlib.Path("/root/reference/differt/src")

_cache: dict[str, types.ModuleType] | None = None


def reference_available() -> bool:
    return (REF_SRC / "differt" / "utils.py").is_file()


def _stub_equinox() -> None:
    if "equinox" in sys.modules:
        return
    from differt_tpu import treekit

    eqx = types.ModuleType("equinox")
    eqx.Module = treekit.Module
    eqx.field = treekit.field
    eqx.filter_jit = treekit.filter_jit
    eqx.tree_at = treekit.tree_at
    eqx.AbstractVar = treekit.AbstractVar
    eqx.__version__ = "0.0.0-stub"
    sys.modules["equinox"] = eqx


def _stub_differt_core() -> None:
    if "differt_core" in sys.modules:
        return

    class _Unavailable:
        """Placeholder for compiled differt_core symbols (never executed)."""

        def __init__(self, *args, **kwargs):
            msg = "differt_core is stubbed: compiled Rust core not available"
            raise NotImplementedError(msg)

    core = types.ModuleType("differt_core")
    core.__version__ = "0.0.0-stub"
    geo = types.ModuleType("differt_core.geometry")
    for name in ("CompleteGraph", "DiGraph", "Material", "Shape", "SionnaScene",
                 "Mesh", "Scene"):
        setattr(geo, name, type(name, (_Unavailable,), {}))
    core.geometry = geo
    sys.modules["differt_core"] = core
    sys.modules["differt_core.geometry"] = geo


def _namespace_pkg(name: str, path: pathlib.Path) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    sys.modules[name] = mod
    return mod


def load_reference() -> dict[str, types.ModuleType]:
    """Return a dict of reference oracle modules, importing them on first use."""
    global _cache
    if _cache is not None:
        return _cache
    if not reference_available():
        msg = f"reference sources not found under {REF_SRC}"
        raise FileNotFoundError(msg)

    _stub_equinox()
    _stub_differt_core()

    root = REF_SRC / "differt"
    pkg = _namespace_pkg("differt", root)
    geo_pkg = _namespace_pkg("differt.geometry", root / "geometry")
    em_pkg = _namespace_pkg("differt.em", root / "em")

    utils = importlib.import_module("differt.utils")
    pkg.utils = utils

    geo_utils = importlib.import_module("differt.geometry._utils")
    image = importlib.import_module("differt.geometry._solver_image_method")
    # Populate the namespace package so `from differt.geometry import X`
    # works for downstream reference modules (em/_utils.py:7).
    for mod in (geo_utils, image):
        for name in dir(mod):
            if not name.startswith("_"):
                setattr(geo_pkg, name, getattr(mod, name))

    # Lightweight stand-ins for the classes deepmimo only isinstance-checks
    # or duck-types (Scene.{mesh,transmitters,receivers},
    # TracedPaths.{vertices,objects,mask,interaction_types,reshape}).
    class _SceneStandin:  # noqa: B903
        def __init__(self, mesh, transmitters, receivers):
            self.mesh = mesh
            self.transmitters = transmitters
            self.receivers = receivers

    class _TracedPathsStandin:
        pass

    geo_pkg.Scene = _SceneStandin
    geo_pkg.TracedPaths = _TracedPathsStandin

    em_constants = importlib.import_module("differt.em._constants")
    em_itype = importlib.import_module("differt.em._interaction_type")
    em_fresnel = importlib.import_module("differt.em._fresnel")
    em_material = importlib.import_module("differt.em._material")
    em_utils = importlib.import_module("differt.em._utils")
    em_utd = importlib.import_module("differt.em._utd")
    for mod in (em_constants, em_itype, em_fresnel, em_material, em_utils,
                em_utd):
        for name in dir(mod):
            if not name.startswith("_"):
                setattr(em_pkg, name, getattr(mod, name))

    # Stub differt.plotting (deepmimo imports PlotOutput/draw_paths/reuse
    # but export() never draws).
    import contextlib
    from typing import Any

    plotting = types.ModuleType("differt.plotting")
    plotting.PlotOutput = Any
    plotting.draw_paths = lambda *a, **k: None
    plotting.draw_surface = lambda *a, **k: None
    plotting.reuse = contextlib.nullcontext
    sys.modules["differt.plotting"] = plotting
    pkg.plotting = plotting

    # Antennas (Dipole near+far fields, directivity) — pure JAX + the
    # geometry/plotting surfaces stubbed above.
    em_antenna = importlib.import_module("differt.em._antenna")
    for name in dir(em_antenna):
        if not name.startswith("_"):
            setattr(em_pkg, name, getattr(em_antenna, name))

    _namespace_pkg("differt.plugins", root / "plugins")
    deepmimo = importlib.import_module("differt.plugins.deepmimo")

    _cache = {
        "utils": utils,
        "deepmimo": deepmimo,
        "geometry_utils": geo_utils,
        "image_method": image,
        "em_constants": em_constants,
        "em_interaction_type": em_itype,
        "em_fresnel": em_fresnel,
        "em_material": em_material,
        "em_utils": em_utils,
        "em_utd": em_utd,
        "em_antenna": em_antenna,
    }
    return _cache
