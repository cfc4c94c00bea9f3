"""ctypes bindings for the native C++ image-decode pipeline (loader.cpp).

``NativeImageLoader`` decodes batches of JPEG/PNG files on a persistent C++
thread pool directly into numpy buffers (crop/resize/BGR/normalize fused) —
the TPU-native replacement for the reference's Python-side mmcv ``imread``
loop (hot loop #5, SURVEY §3). Falls back to cv2 when the shared object can't
be built. The .so auto-builds on first import (``make`` + g++, no pybind11).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libselfocc_loader.so")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load_lib():
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_int]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_decode_batch.restype = ctypes.c_int
    lib.loader_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    lib.loader_image_shape.restype = ctypes.c_int
    lib.loader_image_shape.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class NativeImageLoader:
    """Batched image decoding on a C++ thread pool (cv2 fallback)."""

    def __init__(self, num_threads: int = 0):
        self._pool = None
        if _LIB is not None:
            self._pool = _LIB.loader_create(num_threads)

    def __del__(self):
        if _LIB is not None and self._pool:
            _LIB.loader_destroy(self._pool)

    def decode_batch(self, paths: Sequence[str], crop_hw, out_hw=None,
                     to_bgr: bool = True, mean=None, std=None,
                     pad_val: float = 0.0) -> np.ndarray:
        """Decode -> top-left crop to ``crop_hw`` -> optional bilinear resize
        to ``out_hw`` -> optional normalize. Returns (N, H, W, 3) float32."""
        ch, cw = crop_hw
        oh, ow = out_hw if out_hw is not None else (ch, cw)
        n = len(paths)
        out = np.empty((n, oh, ow, 3), np.float32)
        if self._pool is not None:
            arr = (ctypes.c_char_p * n)(
                *[p.encode() for p in paths])
            mean_p = std_p = None
            if mean is not None:
                mean_arr = (ctypes.c_float * 3)(*[float(m) for m in mean])
                std_arr = (ctypes.c_float * 3)(*[float(s) for s in std])
                mean_p = ctypes.cast(mean_arr,
                                     ctypes.POINTER(ctypes.c_float))
                std_p = ctypes.cast(std_arr, ctypes.POINTER(ctypes.c_float))
            ok = _LIB.loader_decode_batch(
                self._pool, arr, n, ch, cw, oh, ow, int(to_bgr), mean_p,
                std_p, float(pad_val),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if ok == n:
                return out
        # cv2 fallback (also covers partial decode failures)
        import cv2
        for i, p in enumerate(paths):
            img = cv2.imread(p, cv2.IMREAD_COLOR).astype(np.float32)
            if not to_bgr:
                img = img[..., ::-1]
            img = img[:ch, :cw]
            if (oh, ow) != img.shape[:2]:
                img = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
            if mean is not None:
                img = (img - np.asarray(mean, np.float32)) / \
                    np.asarray(std, np.float32)
            out[i, :img.shape[0], :img.shape[1]] = img
        return out


_SHARED: Optional[NativeImageLoader] = None


def get_shared_loader() -> Optional[NativeImageLoader]:
    """Process-wide loader instance (datasets share one thread pool)."""
    global _SHARED
    if not native_available():
        return None
    if _SHARED is None:
        _SHARED = NativeImageLoader()
    return _SHARED
