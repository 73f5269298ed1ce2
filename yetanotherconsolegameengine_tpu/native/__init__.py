"""Native (C++) runtime helpers, loaded via ctypes.

The compute path is JAX/XLA; these helpers cover the host-side per-cell
loops the reference kept native-fast (single-syscall ANSI frame encoding,
ANSITerminalRenderer.cs:226-242). Compiled on first use with g++ into the
package directory; every entry point has a numpy fallback so the framework
works without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libyacge_native.so")
_SRC = os.path.join(_DIR, "ansi_encoder.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.yacge_ansi_max_bytes.restype = ctypes.c_int
        lib.yacge_ansi_max_bytes.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.yacge_ansi_encode.restype = ctypes.c_int
        lib.yacge_ansi_encode.argtypes = [i32p, i32p, i32p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int, u8p]
        lib.yacge_ansi_encode_diff.restype = ctypes.c_int
        lib.yacge_ansi_encode_diff.argtypes = [i32p, i32p, i32p, i32p, i32p,
                                               i32p, ctypes.c_int,
                                               ctypes.c_int, ctypes.c_int,
                                               u8p]
        _lib = lib
        return _lib
