"""Native (C++) host runtime bindings via ctypes.

Builds csrc/nvdr_host.cpp on first use (cached .so) and exposes:

* :func:`build_opposite_table` — antialias topology table (bit-identical
  to :mod:`nvdiffrast_tpu.ops.topology`, but runs on host for concrete
  meshes without tracing),
* :func:`vertex_normals` — area-weighted vertex normals,
* :func:`load_obj` — Wavefront OBJ mesh loader.

Falls back gracefully (`available() == False`) when no compiler exists.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "nvdr_host.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_SO = os.path.join(_BUILD_DIR, "libnvdr_host.so")


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            return None

        lib.nvdr_build_opposite_table.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.nvdr_vertex_normals.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.nvdr_load_obj_counts.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.nvdr_load_obj_counts.restype = ctypes.c_int
        lib.nvdr_load_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        lib.nvdr_load_obj.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available():
    return _load() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_opposite_table(tri, num_vertices=-1):
    """Host-native opposite-vertex table; see ops/topology.py."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    tri = np.ascontiguousarray(tri, np.int32)
    out = np.empty_like(tri)
    lib.nvdr_build_opposite_table(
        _i32p(tri), tri.shape[0], np.int32(num_vertices), _i32p(out))
    return out


def vertex_normals(tri, pos):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    tri = np.ascontiguousarray(tri, np.int32)
    pos = np.ascontiguousarray(pos, np.float32)
    out = np.empty_like(pos)
    lib.nvdr_vertex_normals(_i32p(tri), tri.shape[0], _f32p(pos),
                            pos.shape[0], _f32p(out))
    return out


def load_obj(path):
    """Load a Wavefront OBJ: (pos [V,3], tri [T,3], uv [VT,2], uv_tri [T,3])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    n_vtx = ctypes.c_int64()
    n_tri = ctypes.c_int64()
    n_uv = ctypes.c_int64()
    rc = lib.nvdr_load_obj_counts(path.encode(), ctypes.byref(n_vtx),
                                  ctypes.byref(n_tri), ctypes.byref(n_uv))
    if rc != 0:
        raise IOError(f"cannot read OBJ file: {path}")
    pos = np.empty((n_vtx.value, 3), np.float32)
    tri = np.empty((n_tri.value, 3), np.int32)
    uv = np.empty((max(n_uv.value, 1), 2), np.float32)
    uv_tri = np.empty((n_tri.value, 3), np.int32)
    rc = lib.nvdr_load_obj(path.encode(), _f32p(pos), _i32p(tri), _f32p(uv),
                           _i32p(uv_tri))
    if rc != 0:
        raise IOError(f"cannot read OBJ file: {path}")
    if n_uv.value == 0:
        uv = np.empty((0, 2), np.float32)
    return pos, tri, uv, uv_tri
