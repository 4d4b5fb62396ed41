"""ctypes bindings for the native C++ OBJ parser (`native/obj_loader.cpp`).

Builds the shared library on first use if the toolchain is available;
`models/loader.parse_obj` falls back to the pure-Python parser whenever
this module raises ImportError or returns None.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libbeamtpu.so")

_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.obj_parse.restype = ctypes.c_void_p
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_counts.restype = None
    lib.obj_counts.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.obj_copy.restype = None
    lib.obj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
    lib.obj_free.restype = None
    lib.obj_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def parse_obj(path: str):
    """Parse with the native tokenizer.  Returns the raw-parse tuple
    ``(v, vn, vt, corners, face_mats, mtl_files)`` consumed by
    ``models.loader._finalize_parse``, or None to trigger the Python
    fallback."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.obj_parse(path.encode())
    if not handle:
        return None
    try:
        counts = (ctypes.c_int64 * 6)()
        lib.obj_counts(handle, counts)
        nv, nn, nt, nf, nmat_chars, nmtl_chars = (int(c) for c in counts)
        v = np.empty((nv, 3), np.float32)
        vn = np.empty((nn, 3), np.float32)
        vt = np.empty((nt, 2), np.float32)
        corners = np.empty((nf, 3, 3), np.int64)
        face_mat = np.empty((nf,), np.int32)
        mat_buf = ctypes.create_string_buffer(max(nmat_chars, 1))
        mtl_buf = ctypes.create_string_buffer(max(nmtl_chars, 1))
        lib.obj_copy(
            handle,
            v.ctypes.data_as(ctypes.c_void_p),
            vn.ctypes.data_as(ctypes.c_void_p),
            vt.ctypes.data_as(ctypes.c_void_p),
            corners.ctypes.data_as(ctypes.c_void_p),
            face_mat.ctypes.data_as(ctypes.c_void_p),
            ctypes.cast(mat_buf, ctypes.c_void_p),
            ctypes.cast(mtl_buf, ctypes.c_void_p),
        )
    finally:
        lib.obj_free(handle)

    mat_names = mat_buf.raw[:nmat_chars].decode(errors="replace").split("\n")
    mtl_files = (
        mtl_buf.raw[:nmtl_chars].decode(errors="replace").split("\n")
        if nmtl_chars
        else []
    )
    face_mats = [mat_names[i] for i in face_mat]
    return v, vn, vt, corners, face_mats, mtl_files
