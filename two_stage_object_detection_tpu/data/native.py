"""ctypes bindings to the native preprocessing library (``native/``).

Auto-builds ``libpreprocess.so`` with ``make`` on first use if a compiler is
available; all entry points degrade gracefully to the PIL/numpy path when
the library is missing, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpreprocess.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.decode_resize_normalize.restype = ctypes.c_int
    lib.decode_resize_normalize.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.resize_bilinear_normalize.restype = None
    lib.resize_bilinear_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.hflip_f32.restype = None
    lib.hflip_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int, ctypes.c_int]
    lib.resize_f32.restype = None
    lib.resize_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.decode_into.restype = ctypes.c_int
    lib.decode_into.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    if hasattr(lib, "rgb_to_yuv420_u8"):    # absent in pre-round-3 builds
        lib.rgb_to_yuv420_u8.restype = None
        lib.rgb_to_yuv420_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize(path: str, size: Tuple[int, int]
                  ) -> Optional[Tuple[np.ndarray, int, int]]:
    """Decode an image file and resize to ``(H, W)`` float32 [0,1] HWC.

    Returns ``(image, orig_h, orig_w)`` or None (unsupported format / no lib).
    """
    with open(path, "rb") as f:
        data = f.read()
    return decode_resize_bytes(data, size)


def decode_resize_bytes(data: bytes, size: Tuple[int, int]
                        ) -> Optional[Tuple[np.ndarray, int, int]]:
    """:func:`decode_resize` from an in-memory JPEG/PNG byte buffer (the
    serving ingest path — request bodies never touch the filesystem)."""
    lib = get_lib()
    if lib is None:
        return None
    dh, dw = size
    out = np.empty((dh, dw, 3), np.float32)
    oh = ctypes.c_int(0)
    ow = ctypes.c_int(0)
    rc = lib.decode_resize_normalize(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh, dw, ctypes.byref(oh), ctypes.byref(ow))
    if rc != 0:
        return None
    return out, oh.value, ow.value


def resize_normalize(img_u8: np.ndarray, size: Tuple[int, int]
                     ) -> Optional[np.ndarray]:
    """Bilinear resize+normalise an RGB u8 HWC array -> float32 [0,1]."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    sh, sw = img_u8.shape[:2]
    dh, dw = size
    out = np.empty((dh, dw, 3), np.float32)
    lib.resize_bilinear_normalize(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw)
    return out


def resize_f32(img: np.ndarray, size: Tuple[int, int]) -> Optional[np.ndarray]:
    """Antialiased triangle resize of a float32 HWC image."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    sh, sw = img.shape[:2]
    dh, dw = size
    out = np.empty((dh, dw, 3), np.float32)
    lib.resize_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw)
    return out


def rgb_to_yuv420(images: np.ndarray) -> Optional[np.ndarray]:
    """Pack RGB u8 ``[N, H, W, 3]`` into the serving yuv420 wire layout
    ``[N, H + H//2, W]`` (see ``serving.rgb_to_yuv420`` for the layout).
    Returns None if the library (or the symbol, in stale builds) is
    missing; the caller falls back to the numpy pack."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "rgb_to_yuv420_u8"):
        return None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, _ = images.shape
    out = np.empty((n, h + h // 2, w), np.uint8)
    for i in range(n):
        lib.rgb_to_yuv420_u8(
            images[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def decode(path: str) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG file to an RGB uint8 HWC array (None if no lib or
    unsupported format)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    cap = 2048 * 2048 * 3
    for _ in range(2):
        buf = np.empty((cap,), np.uint8)
        h = ctypes.c_int(0)
        w = ctypes.c_int(0)
        rc = lib.decode_into(data, len(data),
                             buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                             cap, ctypes.byref(h), ctypes.byref(w))
        if rc == 0:
            return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
        if rc == -2:
            cap = h.value * w.value * 3
            continue
        return None
    return None
