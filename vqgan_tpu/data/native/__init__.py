"""Native (C++) host-side image pipeline: build-on-first-use + ctypes bindings.

``native_pipeline(data, resize_to, crop_fx, crop_fy, target)`` returns a
(target, target, 3) float32 array in [-1, 1], or None when the native library
is unavailable or decoding fails (callers fall back to cv2/PIL).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cpp")
_LIB = os.path.join(_HERE, "libvqdec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-ljpeg", "-lpng", "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            _bind(lib)
        except (OSError, AttributeError):
            # missing file, or a stale .so lacking a newer symbol — rebuild
            # once, then give up to the Python fallback
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
                _bind(lib)
            except (OSError, AttributeError):
                return None
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    """Resolve + type every exported symbol; raises AttributeError on a
    stale .so missing a newer entry point (caller rebuilds once)."""
    lib.vq_pipeline.restype = ctypes.c_int
    lib.vq_pipeline.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vq_pipeline_u8.restype = ctypes.c_int
    lib.vq_pipeline_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vq_probe.restype = ctypes.c_int
    lib.vq_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]


def native_available() -> bool:
    return load_native() is not None


def native_pipeline(
    data: bytes, resize_to: int, crop_fx: float, crop_fy: float, target: int,
    as_uint8: bool = False,
) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    if as_uint8:
        out = np.empty((target, target, 3), np.uint8)
        rc = lib.vq_pipeline_u8(
            data, len(data), resize_to, crop_fx, crop_fy, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:
        out = np.empty((target, target, 3), np.float32)
        rc = lib.vq_pipeline(
            data, len(data), resize_to, crop_fx, crop_fy, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
    if rc != 0:
        return None
    return out


def native_probe(data: bytes):
    lib = load_native()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.vq_probe(data, len(data), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value
