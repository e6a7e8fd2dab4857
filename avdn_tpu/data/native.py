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
    src = os.path.abspath(
        os.path.join(_NATIVE_DIR, "avdn_host", "avdn_host.cpp"))

    def _stale():
        return (not os.path.exists(_LIB_PATH)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))

    if _stale():
        # Concurrent workers may all find the .so stale at once; serialise
        # the rebuild with an exclusive flock and build to a temp name that
        # is atomically renamed into place, so a process dlopen()ing the
        # library never sees a half-written file.
        try:
            import fcntl

            lock_path = _LIB_PATH + ".lock"
            with open(lock_path, "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                if _stale():  # another process may have just rebuilt it
                    tmp = _LIB_PATH + f".build.{os.getpid()}"
                    subprocess.run(
                        ["make", "-C", os.path.abspath(_NATIVE_DIR),
                         f"TARGET={os.path.basename(tmp)}"],
                        check=True, capture_output=True, timeout=120,
                    )
                    os.replace(tmp, _LIB_PATH)
                fcntl.flock(lock, fcntl.LOCK_UN)
        except Exception:
            if not os.path.exists(_LIB_PATH):
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
        try:  # wp_* symbols absent in pre-round-4 builds of the .so
            lib.wp_create.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.wp_encode_batch.restype = ctypes.c_int
            lib._has_wp = True
        except AttributeError:
            lib._has_wp = False
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


def wp_available() -> bool:
    lib = _load()
    return lib is not None and getattr(lib, "_has_wp", False)


def wp_create(vocab_text: Optional[bytes], lowercase: bool = True,
              hash_size: int = 0) -> Optional[int]:
    """Build a native WordPiece tokenizer. ``vocab_text`` is the raw
    vocab.txt bytes (real-vocab mode) or None with ``hash_size`` for the
    hashed-fallback mode. Returns an opaque handle or None."""
    if not wp_available():
        return None
    lib = _load()
    buf = vocab_text if vocab_text is not None else b""
    h = lib.wp_create(buf, len(buf), int(lowercase), hash_size)
    return h or None


def wp_destroy(handle: int) -> None:
    lib = _load()
    if lib is not None and handle:
        lib.wp_destroy(handle)


def wp_encode_batch(handle: int, texts, max_length: int, pad_to: int):
    """Encode a batch of str texts. Returns (ids, mask, fallback_idx) —
    ``fallback_idx`` lists texts the native path refused (non-ASCII);
    their rows are left zeroed for the caller to fill."""
    lib = _load()
    raw = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(raw) + 1, np.int64)
    np.cumsum([len(r) for r in raw], out=offsets[1:])
    blob = b"".join(raw)
    n = len(raw)
    ids = np.zeros((n, pad_to), np.int32)
    mask = np.zeros((n, pad_to), np.int32)
    fb = np.zeros(n, np.uint8)
    rc = lib.wp_encode_batch(
        handle, blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n, max_length, pad_to,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"wp_encode_batch failed (rc={rc})")
    return ids, mask, np.nonzero(fb)[0]


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
