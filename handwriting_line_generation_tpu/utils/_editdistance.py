"""ctypes binding for the native Levenshtein (native/editdistance.c).

Raises ImportError when the shared library hasn't been built, so
``error_rates`` silently falls back to the numpy implementation.
Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_so = os.path.join(os.path.dirname(__file__), "libeditdistance.so")
if not os.path.exists(_so):
    raise ImportError(f"native editdistance not built ({_so}); "
                      "run `make -C native`")

_lib = ctypes.CDLL(_so)
_lib.levenshtein_i32.restype = ctypes.c_int32
_lib.levenshtein_i32.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
]
_i32p = ctypes.POINTER(ctypes.c_int32)


def levenshtein(a: np.ndarray, b: np.ndarray) -> int:
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    out = _lib.levenshtein_i32(a.ctypes.data_as(_i32p), len(a),
                               b.ctypes.data_as(_i32p), len(b))
    if out < 0:
        raise MemoryError("levenshtein_i32 allocation failed")
    return int(out)
