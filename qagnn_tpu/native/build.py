"""Build + load the native library (ctypes, C ABI)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _src_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def build_library(force: bool = False) -> str | None:
    """Compile packer.cc -> _qagnn_native.so (cached by mtime)."""
    src = os.path.join(_src_dir(), "packer.cc")
    out = os.path.join(_src_dir(), "_qagnn_native.so")
    if not force and os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out


def load_native() -> ctypes.CDLL | None:
    """Load (building if needed); returns None when no toolchain exists."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = build_library()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pack_edges.argtypes = [i32p, i32p, i32p, i64p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int, i32p, i32p, i32p, u8p]
        lib.pack_edges.restype = None
        pp = ctypes.POINTER(ctypes.c_int32)
        lib.pack_edges_ptrs.argtypes = [ctypes.POINTER(pp),
                                        ctypes.POINTER(pp), i64p,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int, i32p, i32p, i32p, u8p]
        lib.pack_edges_ptrs.restype = None
        lib.gather_rows_i32.argtypes = [i32p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, i32p]
        lib.gather_rows_i32.restype = None
        lib.gather_rows_f32.argtypes = [f32p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, f32p]
        lib.gather_rows_f32.restype = None
        _LIB = lib
        return _LIB
