"""Build/load the native IO shared library (src/native/grace_io.cpp).

The native layer provides the data-loader components the reference implements
natively (Gadget-2 reader: tests/helper/read_gadget.cuh; PLY reader:
tests/helper/ply.c; BMP writer: tests/helper/images.hpp). It compiles on
first use with g++ into a cached .so and binds via ctypes; pure-numpy
fallbacks in the sibling modules keep everything working if no compiler is
available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "src" / "native" / "grace_io.cpp"
_BUILD_DIR = _REPO_ROOT / "build"
_LIB_PATH = _BUILD_DIR / "libgrace_io.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.grace_gadget_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
        lib.grace_gadget_header.restype = ctypes.c_int
        lib.grace_gadget_read_gas.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.grace_gadget_read_gas.restype = ctypes.c_int
        lib.grace_gadget_write_gas.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.grace_gadget_write_gas.restype = ctypes.c_int
        lib.grace_ply_counts.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long)]
        lib.grace_ply_counts.restype = ctypes.c_int
        lib.grace_ply_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.grace_ply_read.restype = ctypes.c_int
        lib.grace_write_bmp.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
        lib.grace_write_bmp.restype = ctypes.c_int
        _lib = lib
        return _lib
