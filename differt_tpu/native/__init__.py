"""Native host-side components: compiled on demand, loaded via ctypes.

See ``_native.cpp`` for what lives here (filtered candidate DFS and fast
OBJ parsing) and why those two jobs stay on the host. The shared object is
built with ``g++ -O2`` into the user cache directory on first use; if no
compiler is available everything degrades to the pure-Python fallbacks.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SOURCE = Path(__file__).parent / "_native.cpp"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False


def _cache_dir() -> Path:
    root = os.environ.get(
        "DIFFERT_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "differt_tpu"),
    )
    return Path(root) / "native"


def _build() -> Path | None:
    source = _SOURCE.read_bytes()
    digest = hashlib.sha256(source).hexdigest()[:16]
    out = _cache_dir() / f"differt_tpu_native_{digest}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SOURCE), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    tmp.replace(out)
    return out


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None if unavailable."""
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LOAD_FAILED:
            return _LIB
        path = _build()
        if path is None:
            _LOAD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            _LOAD_FAILED = True
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.count_filtered_paths.restype = ctypes.c_int64
        lib.count_filtered_paths.argtypes = [
            ctypes.c_int, ctypes.c_int, u8p, u8p, u8p,
        ]
        lib.fill_filtered_paths.restype = ctypes.c_int64
        lib.fill_filtered_paths.argtypes = [
            ctypes.c_int, ctypes.c_int, u8p, u8p, u8p, i32p, ctypes.c_int64,
        ]
        lib.obj_counts.restype = ctypes.c_int
        lib.obj_counts.argtypes = [ctypes.c_char_p, i64p, i64p]
        lib.obj_parse.restype = ctypes.c_int
        lib.obj_parse.argtypes = [
            ctypes.c_char_p, f32p, i32p, i32p, ctypes.c_int64, ctypes.c_int64,
        ]
        _LIB = lib
    return _LIB


def is_available() -> bool:
    """Whether the native library could be built and loaded."""
    return load() is not None


def _as_u8_ptr(mask: np.ndarray | None):
    if mask is None:
        return None
    arr = np.ascontiguousarray(mask, dtype=np.uint8)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def filtered_path_candidates(
    num_nodes: int,
    order: int,
    from_adjacency: np.ndarray | None = None,
    to_adjacency: np.ndarray | None = None,
    node_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Enumerate loop-free filtered path candidates via the native DFS.

    Equivalent to the reference's DiGraph ``all_paths_array`` with
    ``insert_from_and_to_nodes(from_adjacency, to_adjacency)`` and
    ``filter_by_mask`` (graph.rs:636-691, 879-910), without ever
    materializing the unfiltered candidate space.
    """
    lib = load()
    if lib is None:
        msg = "Native library unavailable (no g++?)."
        raise RuntimeError(msg)

    keep_from = _as_u8_ptr(from_adjacency)
    keep_to = _as_u8_ptr(to_adjacency)
    keep_mask = _as_u8_ptr(node_mask)

    from_ptr = keep_from[1] if keep_from else None
    to_ptr = keep_to[1] if keep_to else None
    mask_ptr = keep_mask[1] if keep_mask else None

    count = lib.count_filtered_paths(num_nodes, order, from_ptr, to_ptr, mask_ptr)
    out = np.empty((count, order), dtype=np.int32)
    if count:
        written = lib.fill_filtered_paths(
            num_nodes,
            order,
            from_ptr,
            to_ptr,
            mask_ptr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            count,
        )
        assert written == count
    return out


def parse_obj_geometry(
    path: str | os.PathLike,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse OBJ geometry natively: (vertices, triangles, face_sections).

    ``face_sections[i]`` is the 0-based index of the ``usemtl`` statement
    active for triangle ``i`` (-1 before the first).
    """
    lib = load()
    if lib is None:
        msg = "Native library unavailable (no g++?)."
        raise RuntimeError(msg)

    encoded = os.fspath(path).encode()
    num_vertices = ctypes.c_int64()
    num_triangles = ctypes.c_int64()
    if lib.obj_counts(encoded, ctypes.byref(num_vertices), ctypes.byref(num_triangles)):
        msg = f"Failed to read OBJ file: {path!r}"
        raise OSError(msg)

    vertices = np.empty((num_vertices.value, 3), dtype=np.float32)
    triangles = np.empty((num_triangles.value, 3), dtype=np.int32)
    sections = np.empty((num_triangles.value,), dtype=np.int32)
    status = lib.obj_parse(
        encoded,
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sections.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_vertices.value,
        num_triangles.value,
    )
    if status:
        msg = f"Failed to parse OBJ file: {path!r} (status {status})"
        raise OSError(msg)
    return vertices, triangles, sections
