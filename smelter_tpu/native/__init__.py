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


_ABI = 2


def _build() -> bool:
    try:
        subprocess.run([os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _try_load() -> None:
    global _lib
    if _lib is not None:
        return
    if not os.path.exists(_LIB_PATH) and not _build():
        return
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        if lib.smelter_native_abi_version() != _ABI:
            # stale .so from an older checkout: rebuild once and reload
            if not _build():
                return
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.smelter_native_abi_version() != _ABI:
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
        lib.preprocess_u8_images.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.unpack_int4.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        _lib = lib
    except (OSError, AttributeError):
        # unloadable or symbol-incomplete library: numpy fallbacks take over
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


def preprocess_images(u8: np.ndarray, mean, std,
                      layout: str = "NCHW") -> np.ndarray:
    """Serving ingest: (N, H, W, C) uint8 -> normalized f32 in NCHW or
    NHWC. out = px/255 normalized by per-channel mean/std — the decode-
    to-device hot loop a production image service runs per request."""
    assert u8.ndim == 4 and u8.dtype == np.uint8
    n, h, w, c = u8.shape
    # scalars broadcast per channel (the C++ kernel indexes scale[ch])
    mean = np.ascontiguousarray(
        np.broadcast_to(np.asarray(mean, np.float32).reshape(-1), (c,)))
    std = np.ascontiguousarray(
        np.broadcast_to(np.asarray(std, np.float32).reshape(-1), (c,)))
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    bias = (-mean / std).astype(np.float32)
    to_nchw = layout.upper() == "NCHW"
    if _lib is not None:
        u8 = np.ascontiguousarray(u8)
        out = np.empty((n, c, h, w) if to_nchw else (n, h, w, c), np.float32)
        _lib.preprocess_u8_images(_ptr(u8), _ptr(out), n, h, w, c,
                                  _ptr(scale), _ptr(bias), int(to_nchw))
        return out
    f = u8.astype(np.float32) * scale + bias
    return np.ascontiguousarray(np.transpose(f, (0, 3, 1, 2))) if to_nchw else f


def unpack_int4(packed: np.ndarray, count: int,
                signed: bool = True) -> np.ndarray:
    """ONNX two-per-byte 4-bit unpack (low nibble first) -> int8 values."""
    packed = np.ascontiguousarray(packed.reshape(-1).view(np.uint8))
    assert packed.size >= (count + 1) // 2
    if _lib is not None:
        out = np.empty(count, np.int8)
        _lib.unpack_int4(_ptr(packed), _ptr(out), int(count), int(signed))
        return out
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    vals = np.stack([lo, hi], axis=-1).reshape(-1)[:count]
    if signed:
        vals = np.where(vals > 7, vals - 16, vals).astype(np.int8)
    return vals
