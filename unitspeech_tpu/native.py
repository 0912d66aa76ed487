"""ctypes bindings for the native C++ host kernels (native/unitspeech_native.cc).

The library is built on demand with g++ (no pybind11 in this image; plain C
ABI + ctypes per the environment constraints). Both kernels have pure
Python/JAX equivalents (ops/mas.py, ops/sv56.py) — the native versions serve
host-side preprocessing throughput and parity testing, mirroring where the
reference uses native code (SURVEY.md §2.4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "unitspeech_native.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libunitspeech_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.maximum_path_batch.restype = None
        lib.active_speech_level.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.active_speech_level.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def maximum_path_cpu(log_prior: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host MAS via the C++ kernel. Same contract as ops.mas.maximum_path."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    lp = np.ascontiguousarray(log_prior * mask, np.float32)
    b, t_x, t_y = lp.shape
    x_lengths = np.maximum(mask[:, :, 0].sum(axis=1), 1).astype(np.int32)
    y_lengths = np.maximum(mask[:, 0, :].sum(axis=1), 1).astype(np.int32)
    path = np.zeros_like(lp)
    lib.maximum_path_batch(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.ascontiguousarray(x_lengths).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(y_lengths).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_x, t_y,
    )
    return path * mask


def active_speech_level_cpu(x: np.ndarray, sr: int) -> Tuple[float, float]:
    """Host P.56 level via the C++ kernel. Same contract as
    ops.sv56.active_speech_level."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    xf = np.ascontiguousarray(x, np.float32)
    level = ctypes.c_double()
    activity = ctypes.c_double()
    lib.active_speech_level(
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(xf)), ctypes.c_int32(sr),
        ctypes.byref(level), ctypes.byref(activity),
    )
    return level.value, activity.value
