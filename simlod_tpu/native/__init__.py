"""Native (C) fast path for point-record decoding — built at install time, loaded via
ctypes, with a transparent numpy fallback when absent (see fastload.c)."""
from __future__ import annotations

import ctypes
import glob
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(__file__)
    candidates = glob.glob(os.path.join(here, "_fastload*.so")) \
        + glob.glob(os.path.join(here, "libfastload*.so"))
    return candidates[0] if candidates else None


def load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.simlod_decode_las.restype = None
    lib.simlod_decode_las.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.simlod_decode_simlod.restype = None
    lib.simlod_decode_simlod.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def decode_las(raw: np.ndarray, n: int, bpp: int, rgb_off: int,
               scale: np.ndarray, offset: np.ndarray, trans: np.ndarray):
    lib = load()
    raw = np.ascontiguousarray(raw, np.uint8)
    xyz = np.empty((n, 3), np.float32)
    rgba = np.empty((n,), np.uint32)
    lib.simlod_decode_las(
        raw.ctypes.data, n, bpp, rgb_off,
        np.ascontiguousarray(scale, np.float64).ctypes.data,
        np.ascontiguousarray(offset, np.float64).ctypes.data,
        np.ascontiguousarray(trans, np.float64).ctypes.data,
        xyz.ctypes.data, rgba.ctypes.data)
    return xyz, rgba


def decode_simlod(raw: np.ndarray, n: int, shift: np.ndarray):
    lib = load()
    raw = np.ascontiguousarray(raw, np.uint8)
    xyz = np.empty((n, 3), np.float32)
    rgba = np.empty((n,), np.uint32)
    lib.simlod_decode_simlod(
        raw.ctypes.data, n,
        np.ascontiguousarray(shift, np.float32).ctypes.data,
        xyz.ctypes.data, rgba.ctypes.data)
    return xyz, rgba
