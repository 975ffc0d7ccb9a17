"""ctypes bindings for the native preprocessing library (native/preproc.cpp).

Auto-builds libyolopreproc.so on first use (make in native/), falls back
to the numpy/cv2 oracle path when no toolchain is available. Same
letterbox semantics as ops/letterbox.py (golden-tested)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libyolopreproc.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.letterbox_batch.restype = ctypes.c_int
            lib.letterbox_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int,
            ]
            _lib = lib
        except (OSError, subprocess.SubprocessError):
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def letterbox_batch(images_u8: np.ndarray, net: int,
                    n_threads: int = 8) -> np.ndarray:
    """(B, H, W, 3) uint8 RGB -> (B, net, net, 3) float32 in [0, 1].

    Native fast path when the library is available, else the numpy/cv2
    oracle per image."""
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    b, h, w, _ = images_u8.shape
    lib = _load()
    if lib is not None:
        out = np.empty((b, net, net, 3), dtype=np.float32)
        rc = lib.letterbox_batch(
            images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            b, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            net, n_threads)
        if rc == 0:
            return out
    from yolo_tpu.ops import numpy_ref as npr

    return np.stack([npr.letterbox(img, net, net)[0] for img in images_u8])
