"""ctypes binding for the native C++ .ts parser (native/ts_parser.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back to the pure-python parser if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtsparse.so")
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libtsparse.so"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ts_parse.restype = ctypes.c_void_p
        lib.ts_parse.argtypes = [ctypes.c_char_p]
        lib.ts_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long)]
        lib.ts_values.restype = ctypes.POINTER(ctypes.c_float)
        lib.ts_values.argtypes = [ctypes.c_void_p]
        lib.ts_label.restype = ctypes.c_char_p
        lib.ts_label.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.ts_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def load_from_tsfile_native(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """(X[N, C, T] float32, y[N] str) via the C++ parser."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ts parser unavailable")
    handle = lib.ts_parse(path.encode())
    if not handle:
        raise ValueError(f"failed to parse {path}")
    try:
        dims = (ctypes.c_long * 3)()
        lib.ts_dims(handle, dims)
        n, c, t = dims[0], dims[1], dims[2]
        buf = np.ctypeslib.as_array(lib.ts_values(handle), shape=(n * c * t,))
        x = np.array(buf, np.float32).reshape(n, c, t)  # copy before free
        y = np.asarray([lib.ts_label(handle, i).decode() for i in range(n)])
        return x, y
    finally:
        lib.ts_free(handle)
