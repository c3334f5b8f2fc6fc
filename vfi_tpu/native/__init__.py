"""Native (C++) data-loader core: PNG decode + fused crop/flip/normalize.

ctypes bindings over vfi_io.cpp (no pybind11 in this environment). The
public helpers degrade gracefully: if the shared library cannot be built or
a PNG uses an unsupported feature, callers fall back to PIL (see
vfi_tpu.data.dataset.load_image).
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_lib = None
_load_error: Optional[Exception] = None


def _get_lib():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from vfi_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.vfi_png_info.restype = ctypes.c_int
        lib.vfi_png_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.vfi_png_decode_rgb.restype = ctypes.c_int
        lib.vfi_png_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.vfi_crop_flip_normalize.restype = None
        lib.vfi_crop_flip_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # missing toolchain etc. -> PIL fallback
        _load_error = e
    return _lib


def available() -> bool:
    return _get_lib() is not None


def decode_png_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes to (H, W, 3) uint8 RGB, or None if unsupported."""
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.vfi_png_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.vfi_png_decode_rgb(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value, h.value)
    return out if rc == 0 else None


def crop_flip_normalize(img: np.ndarray, top: int, left: int,
                        crop: Tuple[int, int], hflip: bool,
                        imagenet_norm: bool) -> Optional[np.ndarray]:
    """Fused crop + hflip + [0,1] float (+ ImageNet normalize) of an RGB
    uint8 image. Returns (crop_h, crop_w, 3) float32, or None when the
    native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    ch, cw = crop
    out = np.empty((ch, cw, 3), np.float32)
    lib.vfi_crop_flip_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        top, left, ch, cw, int(hflip), int(imagenet_norm),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
