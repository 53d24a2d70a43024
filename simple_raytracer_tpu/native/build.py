"""Compile-on-first-use build of the native runtime library.

g++ -O3 over native.cpp -> _native_srt.so next to this file; rebuilt when the
source is newer than the binary.  Set SRT_NO_NATIVE=1 to force the pure-Python
fallbacks (used by tests to compare both paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB = os.path.join(_DIR, "_native_srt.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except Exception as e:
        print(f"native build failed to launch: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"native build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _failed
    if _lib is not None:
        return _lib
    if _failed or os.environ.get("SRT_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            stale = (not os.path.exists(_LIB) or
                     os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
            if stale and not _compile():
                _failed = True
                return None
            lib = ctypes.CDLL(_LIB)
        except Exception as e:
            print(f"native load failed: {e}", file=sys.stderr)
            _failed = True
            return None
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    import numpy as np
    from numpy.ctypeslib import ndpointer

    f32 = ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64 = ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.bvh_build.restype = ctypes.c_int
    lib.bvh_build.argtypes = [
        f32, ctypes.c_int64, ctypes.c_int, f32, f32, i32, i32, i32, i32,
        ctypes.c_int, i32]

    lib.obj_count.restype = ctypes.c_int64
    lib.obj_count.argtypes = [ctypes.c_char_p, i64]

    lib.obj_parse.restype = ctypes.c_int64
    lib.obj_parse.argtypes = [
        ctypes.c_char_p, f32, f32, f32, i32, i32, ctypes.c_char_p,
        ctypes.c_int64]


def native_available() -> bool:
    return get_lib() is not None
