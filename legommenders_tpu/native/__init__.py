"""Native (C) host-side kernels, loaded via ctypes.

The shared library is built on demand with the system compiler (gcc is in
the image; pybind11 is not, so plain C + ctypes keeps the binding layer
dependency-free). All callers fall back to numpy when the toolchain is
unavailable.
"""
import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "neg_sampler.c")
_LIB = os.path.join(_HERE, "libnegsampler.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.sample_negatives.argtypes = [
        i32p, i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, i32p, i32p]
    lib.sample_negatives.restype = None
    lib.gather_history.argtypes = [
        i32p, i64p, ctypes.c_int64, ctypes.c_int64, i32p, i32p]
    lib.gather_history.restype = None
    _lib = lib
    return _lib


def sample_negatives(negs: np.ndarray, counts: np.ndarray,
                     users: np.ndarray, K: int, num_items: int,
                     seed: int) -> Optional[np.ndarray]:
    """Returns (B, K) int32 or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    B, M = len(users), negs.shape[1]
    out = np.empty((B, K), np.int32)
    scratch = np.empty(max(M, 1), np.int32)
    lib.sample_negatives(
        np.ascontiguousarray(negs, np.int32),
        np.ascontiguousarray(counts, np.int32),
        np.ascontiguousarray(users, np.int64),
        B, M, K, num_items, seed & 0xFFFFFFFFFFFFFFFF, out, scratch)
    return out


def gather_history(history: np.ndarray, users: np.ndarray):
    """Returns (hist (B,S) int32 pad->0, mask (B,S) int32) or None."""
    lib = get_lib()
    if lib is None:
        return None
    B, S = len(users), history.shape[1]
    out_h = np.empty((B, S), np.int32)
    out_m = np.empty((B, S), np.int32)
    lib.gather_history(
        np.ascontiguousarray(history, np.int32),
        np.ascontiguousarray(users, np.int64), B, S, out_h, out_m)
    return out_h, out_m
