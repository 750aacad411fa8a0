"""ctypes bindings for the native (C++) index-construction components.

Builds native/sais.cpp on first use (g++ -O2 -shared) into
native/build/libnabwa_native.so; falls back to the NumPy prefix-doubling
suffix array when no compiler is available.
"""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "sais.cpp"
_BUILD = _ROOT / "native" / "build"
_SO = _BUILD / "libnabwa_native.so"

_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _BUILD.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.sais_u8.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64]
        lib.sais_u8.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native():
    return _load() is not None


def suffix_array_native(codes):
    """SA-IS suffix array via the native library; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(codes, dtype=np.uint8)
    sa = np.empty(len(t), dtype=np.int64)
    rc = lib.sais_u8(t, sa, len(t))
    if rc != 0:
        return None
    return sa
