"""ctypes binding for the native host-side packer (native/packer.cpp).

Auto-builds ``libivtpu_native.so`` with the system C++ toolchain on first
import if missing (``make -C native``); every entry point degrades to the
NumPy implementation when the library or toolchain is unavailable, so the
native tier is an acceleration, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libivtpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.scatter_pack.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.gather_unpack.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def scatter_pack(colmat: np.ndarray, row_sym: np.ndarray,
                 row_pos: np.ndarray, on_grid: np.ndarray,
                 values: np.ndarray, obs_mask: np.ndarray) -> bool:
    """Scatter observation rows into (B, C, L) grids in place.

    Returns True if the native path ran; False means the caller must use
    the NumPy fallback. Requires float32 contiguous arrays.
    """
    lib = _load()
    if (lib is None or colmat.dtype != np.float32
            or values.dtype != np.float32):
        return False
    colmat = np.ascontiguousarray(colmat)
    row_sym = np.ascontiguousarray(row_sym, np.int32)
    row_pos = np.ascontiguousarray(row_pos, np.int64)
    on_grid = np.ascontiguousarray(on_grid, np.uint8)
    assert values.flags.c_contiguous and obs_mask.flags.c_contiguous
    R, C = colmat.shape
    L = values.shape[-1]
    mask_u8 = obs_mask.view(np.uint8)
    lib.scatter_pack(
        _ptr(colmat, ctypes.c_float), _ptr(row_sym, ctypes.c_int32),
        _ptr(row_pos, ctypes.c_int64), _ptr(on_grid, ctypes.c_uint8),
        R, C, L,
        _ptr(values, ctypes.c_float), _ptr(mask_u8, ctypes.c_uint8))
    return True


def gather_unpack(values: np.ndarray, out_sym: np.ndarray,
                  out_pos: np.ndarray) -> Optional[np.ndarray]:
    """Gather (N, C) rows from (B, C, L) grids; None -> use NumPy path."""
    lib = _load()
    if lib is None or values.dtype != np.float32:
        return None
    values = np.ascontiguousarray(values)
    out_sym = np.ascontiguousarray(out_sym, np.int32)
    out_pos = np.ascontiguousarray(out_pos, np.int64)
    N = out_sym.shape[0]
    B, C, L = values.shape
    out = np.empty((N, C), np.float32)
    lib.gather_unpack(
        _ptr(values, ctypes.c_float), _ptr(out_sym, ctypes.c_int32),
        _ptr(out_pos, ctypes.c_int64), N, C, L,
        _ptr(out, ctypes.c_float))
    return out
