"""ctypes bridge to the native C++ BVH builder (accel/_native/bvh_build.cpp).

Same on-demand g++ compilation pattern as the native OBJ parser
(ceres_tpu.io.native); degrades gracefully to the NumPy golden builder.
The native builder emits node-for-node the same tree as
golden_builders.BinnedSahBuilder (both score in double) — the parity test
asserts it — so callers can treat them as one component with two speeds.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ceres_tpu.accel.golden_builders import FlatBvh

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "bvh_build.cpp")
_LIB = os.path.join(_DIR, "libceres_bvh.so")

_lock = threading.Lock()
_lib = None
_tried = False

_u32p = ctypes.POINTER(ctypes.c_uint32)
_f32p = ctypes.POINTER(ctypes.c_float)


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
        lib.ceres_bvh_build_binned.restype = ctypes.c_int
        lib.ceres_bvh_build_binned.argtypes = [
            _f32p, _f32p, _f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_f32p), ctypes.POINTER(_u32p),
            ctypes.POINTER(_u32p), ctypes.POINTER(_u32p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.ceres_bvh_free.restype = None
        lib.ceres_bvh_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_binned_sah_native(tri_lo, tri_hi, centers, bin_count: int = 16,
                            max_leaf_size: int = 16) -> FlatBvh:
    """Native binned-SAH build -> FlatBvh. Raises ImportError if no g++."""
    lib = _load()
    if lib is None:
        raise ImportError("native BVH builder unavailable")
    lo = np.ascontiguousarray(tri_lo, np.float32)
    hi = np.ascontiguousarray(tri_hi, np.float32)
    c = np.ascontiguousarray(centers, np.float32)
    T = lo.shape[0]
    bounds_p = _f32p()
    pc_p = _u32p()
    fc_p = _u32p()
    pi_p = _u32p()
    n = ctypes.c_int()
    handle = ctypes.c_void_p()
    rc = lib.ceres_bvh_build_binned(
        lo.ctypes.data_as(_f32p), hi.ctypes.data_as(_f32p),
        c.ctypes.data_as(_f32p), T, bin_count, max_leaf_size,
        ctypes.byref(bounds_p), ctypes.byref(pc_p), ctypes.byref(fc_p),
        ctypes.byref(pi_p), ctypes.byref(n), ctypes.byref(handle))
    if rc != 0:
        raise RuntimeError(f"native BVH build failed (rc={rc})")
    try:
        nc = n.value
        bvh = FlatBvh(
            bounds=np.ctypeslib.as_array(bounds_p, shape=(nc, 6)).copy(),
            prim_count=np.ctypeslib.as_array(pc_p, shape=(nc,)).copy(),
            first_child=np.ctypeslib.as_array(fc_p, shape=(nc,)).copy(),
            prim_indices=np.ctypeslib.as_array(pi_p, shape=(T,)).copy(),
            node_count=nc)
    finally:
        lib.ceres_bvh_free(handle)
    return bvh


def build_binned_sah_fast(tri_lo, tri_hi, centers, **kw) -> FlatBvh:
    """Binned-SAH build: native C++ when a toolchain exists, NumPy golden
    otherwise (identical trees either way)."""
    if available():
        return build_binned_sah_native(tri_lo, tri_hi, centers, **kw)
    from ceres_tpu.accel.golden_builders import build_binned_sah

    kw.setdefault("bin_count", 16)
    max_leaf = kw.pop("max_leaf_size", 16)
    return build_binned_sah(tri_lo, tri_hi, centers,
                            max_leaf_size=max_leaf, **kw)
