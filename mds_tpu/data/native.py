"""ctypes bindings for the native preprocessing library (cpp/mdspre.cpp).

Covers the reference's DALI pipeline (lib/get_dataloader.py:490-733) and
CVCUDA stack (lib/cvCuda*.py) roles: native JPEG/PNG decode and a one-pass
fused augment (resize+pad+crop+flip+jitter+label-LUT). Builds the .so on
first use if the toolchain is present; falls back to None (callers use the
numpy/PIL path) otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_SO_PATH = os.path.abspath(os.path.join(_CPP_DIR, "libmdspre.so"))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

u8p = ctypes.POINTER(ctypes.c_uint8)
i32p = ctypes.POINTER(ctypes.c_int32)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_CPP_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.mdspre_decode_jpeg.restype = ctypes.c_int
    lib.mdspre_decode_jpeg.argtypes = [
        u8p, ctypes.c_int64, u8p, ctypes.c_int64, i32p, i32p,
    ]
    lib.mdspre_decode_png.restype = ctypes.c_int
    lib.mdspre_decode_png.argtypes = [
        u8p, ctypes.c_int64, u8p, ctypes.c_int64, i32p, i32p, ctypes.c_int32,
    ]
    lib.mdspre_resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u8p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.mdspre_resize_nearest_u8.argtypes = lib.mdspre_resize_bilinear_u8.argtypes
    lib.mdspre_fused_augment.argtypes = [
        u8p, u8p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        u8p, u8p, u8p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(u8p)


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.mdspre_decode_jpeg(_ptr(buf), len(data), None, 0,
                                ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.mdspre_decode_jpeg(_ptr(buf), len(data), _ptr(out), out.nbytes,
                                ctypes.byref(h), ctypes.byref(w))
    return out if rc == 0 else None


def decode_png(data: bytes, channels: int = 1) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.mdspre_decode_png(_ptr(buf), len(data), None, 0,
                               ctypes.byref(h), ctypes.byref(w), channels)
    if rc != 0:
        return None
    shape = (h.value, w.value) if channels == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.uint8)
    rc = lib.mdspre_decode_png(_ptr(buf), len(data), _ptr(out), out.nbytes,
                               ctypes.byref(h), ctypes.byref(w), channels)
    return out if rc == 0 else None


def resize_bilinear(im: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    im = np.ascontiguousarray(im)
    c = im.shape[2] if im.ndim == 3 else 1
    out = np.empty((dh, dw, c) if im.ndim == 3 else (dh, dw), np.uint8)
    lib.mdspre_resize_bilinear_u8(_ptr(im), im.shape[0], im.shape[1], c,
                                  _ptr(out), dh, dw)
    return out


def resize_nearest(im: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    im = np.ascontiguousarray(im)
    c = im.shape[2] if im.ndim == 3 else 1
    out = np.empty((dh, dw, c) if im.ndim == 3 else (dh, dw), np.uint8)
    lib.mdspre_resize_nearest_u8(_ptr(im), im.shape[0], im.shape[1], c,
                                 _ptr(out), dh, dw)
    return out


def fused_augment(
    im: np.ndarray, lb: np.ndarray,
    resize_hw: Tuple[int, int], pad_hw: Tuple[int, int],
    crop_off: Tuple[int, int], crop_hw: Tuple[int, int],
    flip: bool, brightness: float, contrast: float, saturation: float,
    lb_lut: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-pass train augment (see cpp/mdspre.cpp mdspre_fused_augment)."""
    lib = get_lib()
    assert lib is not None
    im = np.ascontiguousarray(im)
    lb = np.ascontiguousarray(lb)
    lb_lut = np.ascontiguousarray(lb_lut.astype(np.uint8))
    ch, cw = crop_hw
    out_im = np.empty((ch, cw, 3), np.uint8)
    out_lb = np.empty((ch, cw), np.uint8)
    lib.mdspre_fused_augment(
        _ptr(im), _ptr(lb), im.shape[0], im.shape[1],
        resize_hw[0], resize_hw[1], pad_hw[0], pad_hw[1],
        crop_off[0], crop_off[1], ch, cw,
        1 if flip else 0, brightness, contrast, saturation,
        _ptr(lb_lut), _ptr(out_im), _ptr(out_lb),
    )
    return out_im, out_lb
