"""ctypes binding for the native host image ops (native/imageops.c).

Raises ImportError when the shared library hasn't been built, so the data
layer silently falls back to OpenCV/numpy.  Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import List

import numpy as np

_so = os.path.join(os.path.dirname(__file__), "libimageops.so")
if not os.path.exists(_so):
    raise ImportError(f"native imageops not built ({_so}); "
                      "run `make -C native`")

_lib = ctypes.CDLL(_so)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_i32p = ctypes.POINTER(ctypes.c_int32)
_lib.resize_norm.restype = None
_lib.resize_norm.argtypes = [
    _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
    _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_long,
]
_lib.pack_batch.restype = None
_lib.pack_batch.argtypes = [
    _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(_f32p), _i32p, ctypes.c_float,
]


def resize_norm(src_u8: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Bicubic resize of a uint8 grayscale image fused with the
    ``1 - px/128`` normalization.  Returns float32 [dh, dw]."""
    src = np.ascontiguousarray(src_u8, np.uint8)
    assert src.ndim == 2, src.shape
    dst = np.empty((dh, dw), np.float32)
    _lib.resize_norm(src.ctypes.data_as(_u8p), src.shape[0], src.shape[1],
                     src.strides[0] // src.itemsize,
                     dst.ctypes.data_as(_f32p), dh, dw, dw)
    return dst


def pack_batch(imgs: List[np.ndarray], wb: int,
               fill: float) -> np.ndarray:
    """Pack ragged normalized [H, w_i] float32 lines into [B, H, wb]
    with `fill` padding, one pass, no prefill."""
    B = len(imgs)
    H = imgs[0].shape[0]
    imgs = [np.ascontiguousarray(im, np.float32) for im in imgs]
    out = np.empty((B, H, wb), np.float32)
    ptrs = (_f32p * B)(*[im.ctypes.data_as(_f32p) for im in imgs])
    widths = np.asarray([im.shape[1] for im in imgs], np.int32)
    _lib.pack_batch(out.ctypes.data_as(_f32p), B, H, wb, ptrs,
                    widths.ctypes.data_as(_i32p), ctypes.c_float(fill))
    return out
