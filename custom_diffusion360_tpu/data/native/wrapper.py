"""ctypes wrapper over preprocess.cpp with lazy g++ build + numpy fallback.

Build happens once per machine into __pycache__/libpreprocess.so; failures
(no compiler, sandbox) degrade silently to the pure-numpy implementations so
the data pipeline never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src_dir = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(src_dir, "preprocess.cpp")
        out_dir = os.path.join(src_dir, "__pycache__")
        os.makedirs(out_dir, exist_ok=True)
        lib_path = os.path.join(out_dir, "libpreprocess.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", src, "-o", lib_path,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i = ctypes.c_int
            lib.resize_bicubic_u8_to_pm1.argtypes = [u8p, i, i, i, f32p, i, i]
            lib.dilate7_f32.argtypes = [f32p, i, i, f32p]
            lib.crop_u8.argtypes = [u8p, i, i, i, i, i, i, i, u8p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def resize_bicubic_to_pm1(img_u8: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) u8 -> (out_h, out_w, C) f32 in [-1, 1], antialiased bicubic."""
    lib = _build_and_load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    if lib is not None:
        out = np.empty((out_h, out_w, c), np.float32)
        lib.resize_bicubic_u8_to_pm1(
            img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w,
        )
        return out
    # numpy/PIL fallback
    from PIL import Image

    im = Image.fromarray(img_u8).resize((out_w, out_h), Image.BICUBIC)
    return np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0


def dilate7(mask: np.ndarray) -> np.ndarray:
    """(H, W) f32 -> 7x7 binary dilation, same padding, clipped to [0, 1]."""
    lib = _build_and_load()
    mask = np.ascontiguousarray(mask, np.float32)
    h, w = mask.shape
    if lib is not None:
        out = np.empty_like(mask)
        lib.dilate7_f32(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    p = np.zeros((h + 6, w + 6), np.float32)
    p[3 : 3 + h, 3 : 3 + w] = mask
    out = np.zeros_like(mask)
    for dy in range(7):
        for dx in range(7):
            out = np.maximum(out, p[dy : dy + h, dx : dx + w])
    return np.clip(out, 0, 1)


def crop_u8(img: np.ndarray, x0: int, y0: int, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) u8 crop with zero padding outside bounds."""
    lib = _build_and_load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is not None:
        out = np.empty((out_h, out_w, c), np.uint8)
        lib.crop_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h, w, c, int(x0), int(y0), out_h, out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    out = np.zeros((out_h, out_w, c), np.uint8)
    sy0, sx0 = max(0, y0), max(0, x0)
    sy1, sx1 = min(h, y0 + out_h), min(w, x0 + out_w)
    if sy0 < sy1 and sx0 < sx1:
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return out
