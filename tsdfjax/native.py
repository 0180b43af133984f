"""ctypes bindings for the native mesh-ops library (native/meshops.cpp).

Builds libtsdfmeshops.so on first use if g++ is available (cached next
to the source); every entry point has a NumPy fallback in tsdfjax.mesh,
so the package works without a toolchain. pybind11 is not in this image,
hence the plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _build(src_dir: str) -> str | None:
    src = os.path.join(src_dir, "meshops.cpp")
    out = os.path.join(src_dir, "libtsdfmeshops.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             src, "-o", out],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib():
    """The loaded library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build(_SRC)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tj_weld.restype = ctypes.c_int
    lib.tj_weld.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_float,
                            f32p, f32p, i64p, i64p, i64p]
    lib.tj_weld_exact.restype = ctypes.c_int
    lib.tj_weld_exact.argtypes = lib.tj_weld.argtypes
    lib.tj_vertex_normals.restype = ctypes.c_int
    lib.tj_vertex_normals.argtypes = [f32p, ctypes.c_int64, i64p, ctypes.c_int64, f32p]
    lib.tj_write_obj.restype = ctypes.c_int
    lib.tj_write_obj.argtypes = [ctypes.c_char_p, f32p, f32p, f32p,
                                 ctypes.c_int64, i64p, ctypes.c_int64]
    _LIB = lib
    return _LIB


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def weld(tri_verts: np.ndarray, tri_colors: np.ndarray | None, eps: float,
         exact: bool = False):
    """Native weld; returns (verts, colors|None, faces) or None if the
    library is unavailable. `exact=True` uses the reference's exact-NN
    mode (mergeCloseVertices approx=false, meshData.cpp:239-262): merge
    into the nearest kept vertex within true eps distance over the 27
    neighboring grid cells — single-threaded, like the reference's.
    Same semantics, nearest-match variant: the reference takes the FIRST
    kept vertex found within eps (strict <) in cell-scan order, so merge
    assignments can differ in multi-candidate or exact-eps tie cases."""
    lib = get_lib()
    if lib is None:
        return None
    tv = np.ascontiguousarray(tri_verts, np.float32).reshape(-1, 3, 3)
    ntri = len(tv)
    tc = (
        np.ascontiguousarray(tri_colors, np.float32).reshape(-1, 3, 3)
        if tri_colors is not None
        else None
    )
    out_v = np.empty((ntri * 3, 3), np.float32)
    out_c = np.empty((ntri * 3, 3), np.float32) if tc is not None else np.empty((1, 3), np.float32)
    out_f = np.empty((ntri, 3), np.int64)
    nv = np.zeros(1, np.int64)
    nf = np.zeros(1, np.int64)
    fn = lib.tj_weld_exact if exact else lib.tj_weld
    rc = fn(
        _fp(tv), _fp(tc) if tc is not None else None, ntri,
        ctypes.c_float(eps), _fp(out_v),
        _fp(out_c) if tc is not None else None, _ip(out_f), _ip(nv), _ip(nf),
    )
    if rc != 0:
        return None
    n_v, n_f = int(nv[0]), int(nf[0])
    return (
        out_v[:n_v].copy(),
        out_c[:n_v].copy() if tc is not None else None,
        out_f[:n_f].copy(),
    )


def vertex_normals(verts: np.ndarray, faces: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.empty_like(v)
    if lib.tj_vertex_normals(_fp(v), len(v), _ip(f), len(f), _fp(out)) != 0:
        return None
    return out


def write_obj(path: str, verts, faces, colors=None, normals=None) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    c = np.ascontiguousarray(colors, np.float32) if colors is not None else None
    n = np.ascontiguousarray(normals, np.float32) if normals is not None else None
    rc = lib.tj_write_obj(
        path.encode(), _fp(v), _fp(c) if c is not None else None,
        _fp(n) if n is not None else None, len(v), _ip(f), len(f),
    )
    return rc == 0
