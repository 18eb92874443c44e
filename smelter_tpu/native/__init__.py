"""ctypes bindings for the native host-preprocessing library.

Loads libsmelter_native.so (built by build.sh; auto-built on first import
when g++ is available), exposing multithreaded weight relayout, per-channel
int8 quantization and fp16 conversion. Every entry point has a numpy
fallback, so the package works without a compiler. See smelter_native.cpp
for the reference-parity notes (BNNS transpose / vImage fp16 analogs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libsmelter_native.so")
_lib = None


def _try_load() -> None:
    global _lib
    if _lib is not None:
        return
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run([os.path.join(_DIR, "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        if lib.smelter_native_abi_version() != 1:
            return
        lib.relayout_oihw_to_hwio.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.relayout_oihw_to_ohwi.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int]
        lib.quantize_per_channel_int8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64]
        lib.convert_f32_to_f16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except OSError:
        return


_try_load()


def available() -> bool:
    return _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def relayout_oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """(O, I, H, W) -> (H, W, I, O)."""
    assert w.ndim == 4
    if _lib is not None and w.dtype == np.float32:
        w = np.ascontiguousarray(w)
        out = np.empty((w.shape[2], w.shape[3], w.shape[1], w.shape[0]), np.float32)
        _lib.relayout_oihw_to_hwio(_ptr(w), _ptr(out), *map(int, w.shape))
        return out
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def relayout_oihw_to_ohwi(w: np.ndarray, flip_spatial: bool = False) -> np.ndarray:
    """(O, I, H, W) -> (O, H, W, I), optional spatial flip (ConvTranspose)."""
    assert w.ndim == 4
    if _lib is not None and w.dtype == np.float32:
        w = np.ascontiguousarray(w)
        out = np.empty((w.shape[0], w.shape[2], w.shape[3], w.shape[1]), np.float32)
        _lib.relayout_oihw_to_ohwi(_ptr(w), _ptr(out), *map(int, w.shape),
                                   int(flip_spatial))
        return out
    v = w[:, :, ::-1, ::-1] if flip_spatial else w
    return np.ascontiguousarray(np.transpose(v, (0, 2, 3, 1)))


def quantize_per_channel_int8(w2d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(C, inner) float32 -> (q int8 (C, inner), scales float32 (C,))."""
    assert w2d.ndim == 2
    if _lib is not None and w2d.dtype == np.float32:
        w2d = np.ascontiguousarray(w2d)
        q = np.empty(w2d.shape, np.int8)
        s = np.empty(w2d.shape[0], np.float32)
        _lib.quantize_per_channel_int8(_ptr(w2d), _ptr(q), _ptr(s),
                                       int(w2d.shape[0]), int(w2d.shape[1]))
        return q, s
    amax = np.abs(w2d).max(axis=1)
    s = (amax / 127.0).astype(np.float32)
    s = np.where(s == 0, np.float32(1.0), s)
    q = np.clip(np.round(w2d / s[:, None]), -127, 127).astype(np.int8)
    return q, s


def convert_f32_to_f16(a: np.ndarray) -> np.ndarray:
    if _lib is not None and a.dtype == np.float32:
        a = np.ascontiguousarray(a)
        out = np.empty(a.shape, np.uint16)
        _lib.convert_f32_to_f16(_ptr(a), _ptr(out), int(a.size))
        return out.view(np.float16)
    return a.astype(np.float16)
