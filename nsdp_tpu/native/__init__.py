"""ctypes bindings to the native C++ geometry runtime.

The shared library is built on demand (``make`` in this directory) the first
time it is imported; set ``NSDP_NATIVE_DISABLE=1`` to force the pure-Python
fallbacks in callers.
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libnsdp_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("NSDP_NATIVE_DISABLE"):
        raise RuntimeError("native library disabled via NSDP_NATIVE_DISABLE")
    if not os.path.exists(_LIB_PATH):
        subprocess.check_call(
            ["make", "-s"], cwd=_DIR, stdout=subprocess.DEVNULL
        )
    lib = ctypes.CDLL(_LIB_PATH)

    lib.nsdp_nn_query.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.nsdp_nn_query.restype = None

    lib.nsdp_marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.nsdp_marching_tetrahedra.restype = None
    lib.nsdp_mc_copy.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)
    ]
    lib.nsdp_mc_copy.restype = None
    lib.nsdp_mc_free.argtypes = []
    lib.nsdp_mc_free.restype = None

    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def nearest_neighbor_distances(
    queries: np.ndarray, points: np.ndarray, return_index: bool = False
):
    """Exact euclidean NN distance of each query to the point set (KD-tree)."""
    lib = _load()
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    points = np.ascontiguousarray(points, dtype=np.float32)
    n_q = len(queries)
    dist = np.empty(n_q, dtype=np.float32)
    idx = np.empty(n_q, dtype=np.int32) if return_index else None
    lib.nsdp_nn_query(
        _fptr(points), len(points), _fptr(queries), n_q, _fptr(dist),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if return_index
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_int32)),
    )
    if return_index:
        return dist, idx
    return dist


def marching_cubes(
    grid: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface {grid = level} as (verts (V,3) f32 in index coords,
    faces (F,3) i32), via native marching tetrahedra with vertex welding."""
    lib = _load()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    if grid.ndim != 3:
        raise ValueError(f"grid must be 3-D, got {grid.shape}")
    nx, ny, nz = grid.shape
    n_verts = ctypes.c_int64()
    n_faces = ctypes.c_int64()
    lib.nsdp_marching_tetrahedra(
        _fptr(grid), nx, ny, nz, ctypes.c_float(level),
        ctypes.byref(n_verts), ctypes.byref(n_faces),
    )
    verts = np.empty((n_verts.value, 3), dtype=np.float32)
    faces = np.empty((n_faces.value, 3), dtype=np.int32)
    lib.nsdp_mc_copy(
        _fptr(verts), faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    )
    lib.nsdp_mc_free()
    return verts, faces
