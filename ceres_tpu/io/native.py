"""ctypes bridge to the native C++ OBJ parser (io/_native/objparse.cpp).

The shared library is compiled on demand with g++ (cached next to the
source); everything degrades gracefully to the pure-Python parser when no
toolchain is present. No pybind11 — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "objparse.cpp")
_LIB = os.path.join(_DIR, "libceres_objparse.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.ceres_obj_parse.restype = ctypes.c_int
        lib.ceres_obj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.ceres_obj_free.restype = None
        lib.ceres_obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_obj_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file natively -> ((V,3) float32, (F,3) int32)."""
    lib = _load()
    if lib is None:
        raise ImportError("native OBJ parser unavailable")
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    handle = ctypes.c_void_p()
    rc = lib.ceres_obj_parse(path.encode(), ctypes.byref(verts_p),
                             ctypes.byref(nv), ctypes.byref(faces_p),
                             ctypes.byref(nf), ctypes.byref(handle))
    if rc != 0:
        raise OSError(f"native OBJ parse failed (rc={rc}): {path}")
    try:
        v = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        f = np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int32)
    finally:
        lib.ceres_obj_free(handle)
    return np.asarray(v, np.float32), np.asarray(f, np.int32)
