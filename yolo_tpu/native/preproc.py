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
            if not hasattr(lib, "letterbox_batch_hwc"):
                # probe the NEWEST export: a stale build on disk (the
                # .so is gitignored) may have some-but-not-all symbols;
                # force a rebuild and reload
                subprocess.run(["make", "-s", "-B"], cwd=_NATIVE_DIR,
                               check=True, capture_output=True,
                               timeout=120)
                lib = ctypes.CDLL(_LIB_PATH)
            lib.letterbox_batch.restype = ctypes.c_int
            lib.letterbox_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int,
            ]
            lib.letterbox_batch_hw.restype = ctypes.c_int
            lib.letterbox_batch_hw.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.letterbox_batch_hwc.restype = ctypes.c_int
            lib.letterbox_batch_hwc.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.yolo_decode_alloc_c.restype = ctypes.c_void_p
            lib.yolo_decode_alloc_c.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.yolo_decode_mem_c.restype = ctypes.c_void_p
            lib.yolo_decode_mem_c.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.decode_letterbox_batch_hwc.restype = ctypes.c_int
            lib.decode_letterbox_batch_hwc.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.yolo_decode_alloc.restype = ctypes.c_void_p
            lib.yolo_decode_alloc.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.yolo_decode_mem.restype = ctypes.c_void_p
            lib.yolo_decode_mem.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.yolo_buf_free.restype = None
            lib.yolo_buf_free.argtypes = [ctypes.c_void_p]
            lib.decode_letterbox_batch.restype = ctypes.c_int
            lib.decode_letterbox_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.decode_letterbox_batch_hw.restype = ctypes.c_int
            lib.decode_letterbox_batch_hw.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            _lib = lib
        except (OSError, subprocess.SubprocessError, AttributeError):
            # AttributeError: a stale .so that even a rebuild could not
            # refresh in-process (same-inode dlopen reuse) — treat as
            # unavailable rather than crash callers
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _as_hw(net) -> tuple:
    """int -> (net, net); (h, w) kept (ops.letterbox.as_hw convention)."""
    if isinstance(net, (tuple, list)):
        return int(net[0]), int(net[1])
    return int(net), int(net)


def letterbox_batch(images_u8: np.ndarray, net,
                    n_threads: int = 8) -> np.ndarray:
    """(B, H, W, C) uint8 (C=3 RGB, C=1 gray) -> (B, net_h, net_w, C)
    float32 in [0, 1]. net: int (square) or (net_h, net_w).

    Native fast path when the library is available, else the numpy/cv2
    oracle per image."""
    net_h, net_w = _as_hw(net)
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    b, h, w, c = images_u8.shape
    lib = _load()
    if lib is not None and c in (1, 3):
        out = np.empty((b, net_h, net_w, c), dtype=np.float32)
        rc = lib.letterbox_batch_hwc(
            images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            b, h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            net_h, net_w, n_threads)
        if rc == 0:
            return out
    from yolo_tpu.ops import numpy_ref as npr

    return np.stack([npr.letterbox(img, net_w, net_h)[0]
                     for img in images_u8])


def decode_image(path: str, channels: int = 3) -> Optional[np.ndarray]:
    """Native JPEG/PNG decode (native/decode.cpp) -> (H, W, channels)
    uint8. channels=3: libjpeg JCS_RGB / libpng PNG_FORMAT_RGB;
    channels=1: libjpeg JCS_GRAYSCALE (cv2.IMREAD_GRAYSCALE's exact
    JPEG path) / gray-source PNG passthrough (color PNGs decline — the
    simplified API's default rgb->gray coefficients differ from cv2's
    BT.601 ones).

    Returns None when the native library is unavailable OR the file
    cannot be decoded natively (missing, corrupt, unsupported format,
    parity-decline) — callers fall back to cv2."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = lib.yolo_decode_alloc_c(os.fsencode(path), channels,
                                  ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        return None
    try:
        buf = ctypes.cast(
            ptr, ctypes.POINTER(
                ctypes.c_uint8 * (h.value * w.value * channels)))
        img = np.frombuffer(buf.contents, dtype=np.uint8).reshape(
            h.value, w.value, channels).copy()
    finally:
        lib.yolo_buf_free(ptr)
    return img


def decode_image_bytes(data: bytes,
                       channels: int = 3) -> Optional[np.ndarray]:
    """In-memory native JPEG/PNG decode (serving uploads) ->
    (H, W, channels) uint8, or None (unavailable/undecodable/
    parity-decline) — callers fall back to cv2.imdecode. Same channel
    semantics as decode_image."""
    lib = _load()
    if lib is None or len(data) < 8:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    buf_in = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    ptr = lib.yolo_decode_mem_c(buf_in, len(data), channels,
                                ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        return None
    try:
        buf = ctypes.cast(
            ptr, ctypes.POINTER(
                ctypes.c_uint8 * (h.value * w.value * channels)))
        img = np.frombuffer(buf.contents, dtype=np.uint8).reshape(
            h.value, w.value, channels).copy()
    finally:
        lib.yolo_buf_free(ptr)
    return img


def decode_letterbox_batch(paths, net, n_threads: int = 8,
                           channels: int = 3):
    """Fully-native batch loader (the darknet data.c role): decode N
    paths and letterbox them in C++ worker threads in ONE call.
    net: int (square) or (net_h, net_w); channels: 3 (RGB) or 1
    (grayscale, [net] channels=1 — decode_image's gray semantics).

    Returns (batch (N, net_h, net_w, channels) float32, dims (N, 2)
    int32 (src_h, src_w), ok (N,) bool) — failed slots have ok=False
    and dims 0 (the caller drops or retries them via the cv2 path); or
    None when the native library is unavailable."""
    net_h, net_w = _as_hw(net)
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, net_h, net_w, channels), dtype=np.float32)
    dims = np.empty((n, 2), dtype=np.int32)
    ok = np.empty((n,), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    rc = lib.decode_letterbox_batch_hwc(
        arr, n, net_h, net_w, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads)
    if rc < 0:
        return None
    return out, dims, ok.astype(bool)
