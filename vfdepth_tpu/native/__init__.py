"""Native (C++) host-side data-pipeline ops, bound via ctypes.

Builds ``libimage_ops.so`` on first use with g++ (no pybind11 in this image);
falls back gracefully to the pure-Python paths when the toolchain or build is
unavailable, so the framework never hard-depends on the native library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_ops.cpp")
_LIB = os.path.join(_DIR, "libimage_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warnings.warn(f"native image_ops build failed ({e}); using Python fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.bilinear_resize_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.u8_to_f32_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
    except OSError as e:  # pragma: no cover
        warnings.warn(f"could not load native image_ops: {e}")
    return _lib


def resize_batch(images: np.ndarray, out_hw, n_threads: int = 4
                 ) -> Optional[np.ndarray]:
    """Bilinear (half-pixel) resize of [N, H, W, C] float32 or uint8 frames.

    uint8 inputs are normalized to [0, 1] in the same pass. Returns None when
    the native library is unavailable (caller falls back to Python).
    """
    lib = get_lib()
    if lib is None:
        return None
    n, in_h, in_w, c = images.shape
    out_h, out_w = out_hw
    dst = np.empty((n, out_h, out_w, c), np.float32)
    if images.dtype == np.uint8:
        src = np.ascontiguousarray(images)
        lib.u8_to_f32_resize_batch(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, in_h, in_w, out_h, out_w, c, n_threads)
    else:
        src = np.ascontiguousarray(images, np.float32)
        lib.bilinear_resize_batch_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, in_h, in_w, out_h, out_w, c, n_threads)
    return dst
