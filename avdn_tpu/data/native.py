"""ctypes bindings for the native host-preprocessing library.

Loads ``native/libavdn_host.so`` (building it with make on first use if the
toolchain is present) and exposes the C++ INTER_AREA resampler / circle
rasteriser. Falls back to OpenCV transparently — ``available()`` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libavdn_host.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.area_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        lib.swap_rb_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.fill_circles_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def area_resize(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """INTER_AREA resize of an (H, W, C) uint8 image (native C++ path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(src, np.uint8)
    ch = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty((dh, dw, ch) if src.ndim == 3 else (dh, dw), np.uint8)
    lib.area_resize_u8(_u8p(src), src.shape[0], src.shape[1], ch,
                       _u8p(dst), dh, dw)
    return dst


def swap_rb(img: np.ndarray) -> np.ndarray:
    """In-place BGR↔RGB channel swap of an (H, W, 3) uint8 image."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    lib.swap_rb_u8(_u8p(img), img.shape[0], img.shape[1])
    return img


def fill_circles(h: int, w: int, circles: np.ndarray) -> np.ndarray:
    """Rasterise filled circles (n, 3) of (cx, cy, r) into a uint8 mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    mask = np.zeros((h, w), np.uint8)
    c = np.ascontiguousarray(circles, np.float32)
    lib.fill_circles_u8(
        _u8p(mask), h, w,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(c),
    )
    return mask
