"""ctypes bindings for the native data-pipeline runtime (native/).

The C++ library (`native/gsavatars_native.cpp`) provides multi-threaded
PNG/JPEG decode + alpha-composite + bilinear resize — the native equivalent
of the reference's DataLoader worker runtime. Loading is lazy and optional:
if the shared library is missing it is built once with `make` (toolchain
permitting); on any failure the Python/PIL path is used instead
(`data/pipeline.py`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsavatars_native.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("GSAVATARS_NO_NATIVE"):
            _load_failed = True
            return None
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gsav_decode_image.restype = ctypes.c_int
            lib.gsav_decode_image.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            lib.gsav_decode_batch.restype = ctypes.c_int
            lib.gsav_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.gsav_image_size.restype = ctypes.c_int
            lib.gsav_image_size.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str, width: int, height: int, bg) -> Optional[np.ndarray]:
    """Native decode → float32 [height, width, 3] in [0,1]; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((height, width, 3), np.float32)
    bg_arr = np.ascontiguousarray(np.asarray(bg, np.float32))
    rc = lib.gsav_decode_image(
        path.encode(), width, height,
        bg_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def decode_batch(
    paths: Sequence[str], width: int, height: int, bg, n_threads: int = 0
) -> Optional[np.ndarray]:
    """Parallel native decode → [n, height, width, 3]; None on any failure."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    bg_arr = np.ascontiguousarray(np.asarray(bg, np.float32))
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.gsav_decode_batch(
        arr, n, width, height,
        bg_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out if failures == 0 else None


def image_size(path: str) -> Optional[tuple]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.gsav_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value
