"""Native (C) fast paths — the point-record decoder (fastload.c) and the LAZ
codec (laszip_codec.c). Built at install time or on demand from the shipped
sources (binaries are never committed; see ADVICE round 1), loaded via ctypes,
with transparent fallbacks when no compiler is available."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LAZ = None


def _build_or_find(src_name: str, lib_name: str) -> str | None:
    """Return the shared object path, compiling from the shipped source when the
    binary is absent or older than the source (cache keyed by mtime)."""
    here = os.path.dirname(__file__)
    src = os.path.join(here, src_name)
    out = os.path.join(here, lib_name)
    if not os.path.exists(src):
        return out if os.path.exists(out) else None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(["cc", "-O3", "-shared", "-fPIC", src, "-o", out],
                       check=True, capture_output=True)
        return out
    except Exception:
        return out if os.path.exists(out) else None


def load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _build_or_find("fastload.c", "_fastload.so")
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
    for name in ("simlod_decode_las_cols", "simlod_decode_simlod_cols"):
        fn = getattr(lib, name, None)
        if fn is None:       # stale .so without the column entry points
            continue
        fn.restype = None
    if hasattr(lib, "simlod_decode_las_cols"):
        lib.simlod_decode_las_cols.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.simlod_decode_simlod_cols.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
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


def cols_available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "simlod_decode_simlod_cols")


def _col_views(ox, oy, oz, orgba, n):
    for a in (ox, oy, oz):
        assert a.flags.c_contiguous and a.dtype == np.float32 and a.size >= n
    assert orgba.flags.c_contiguous and orgba.dtype == np.uint32 and orgba.size >= n
    return ox.ctypes.data, oy.ctypes.data, oz.ctypes.data, orgba.ctypes.data


def decode_simlod_cols(raw: np.ndarray, n: int, shift: np.ndarray,
                       ox, oy, oz, orgba) -> None:
    """decode_simlod writing x/y/z/rgba straight into caller-provided pooled
    column buffers (the streaming staging planes) — one pass, no allocation."""
    lib = load()
    raw = np.ascontiguousarray(raw, np.uint8)
    px, py, pz, pc = _col_views(ox, oy, oz, orgba, n)
    lib.simlod_decode_simlod_cols(
        raw.ctypes.data, n,
        np.ascontiguousarray(shift, np.float32).ctypes.data, px, py, pz, pc)


def decode_las_cols(raw: np.ndarray, n: int, bpp: int, rgb_off: int,
                    scale, offset, trans, ox, oy, oz, orgba) -> None:
    """decode_las writing into pooled column buffers (see decode_simlod_cols)."""
    lib = load()
    raw = np.ascontiguousarray(raw, np.uint8)
    px, py, pz, pc = _col_views(ox, oy, oz, orgba, n)
    lib.simlod_decode_las_cols(
        raw.ctypes.data, n, bpp, rgb_off,
        np.ascontiguousarray(scale, np.float64).ctypes.data,
        np.ascontiguousarray(offset, np.float64).ctypes.data,
        np.ascontiguousarray(trans, np.float64).ctypes.data, px, py, pz, pc)


# --- LAZ codec (laszip_codec.c) ---

def load_laz() -> ctypes.CDLL | None:
    global _LAZ
    if _LAZ is not None:
        return _LAZ
    path = _build_or_find("laszip_codec.c", "_laszip.so")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.laz_decode.restype = ctypes.c_long
    lib.laz_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_long,
    ]
    lib.laz_encode.restype = ctypes.c_long
    lib.laz_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_long,
    ]
    lib.laz_decode_chunk_table.restype = ctypes.c_long
    lib.laz_decode_chunk_table.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    _LAZ = lib
    return lib


def laz_available() -> bool:
    return load_laz() is not None


def laz_decode(stream: np.ndarray, npoints: int, chunk_size: int,
               item_types, item_sizes) -> np.ndarray:
    """Decode a chunked LASzip point stream (after the 8-byte chunk-table offset)
    into raw LAS point records [npoints, rec_size] uint8."""
    lib = load_laz()
    stream = np.ascontiguousarray(stream, np.uint8)
    it = np.ascontiguousarray(item_types, np.uint16)
    isz = np.ascontiguousarray(item_sizes, np.uint16)
    rec_size = int(isz.sum())
    out = np.empty((npoints, rec_size), np.uint8)
    r = lib.laz_decode(stream.ctypes.data, stream.size, out.ctypes.data,
                       npoints, chunk_size, it.ctypes.data, isz.ctypes.data,
                       len(it), rec_size)
    if r != 0:
        raise ValueError(f"laz decode failed ({r}): corrupt or unsupported stream")
    return out


def laz_decode_into(stream: np.ndarray, out: np.ndarray, chunk_size: int,
                    item_types, item_sizes) -> None:
    """laz_decode writing into a caller-provided [npoints, rec_size] u8 view
    (must be C-contiguous — a row slice of the full output array is)."""
    lib = load_laz()
    stream = np.ascontiguousarray(stream, np.uint8)
    it = np.ascontiguousarray(item_types, np.uint16)
    isz = np.ascontiguousarray(item_sizes, np.uint16)
    assert out.flags.c_contiguous and out.dtype == np.uint8
    r = lib.laz_decode(stream.ctypes.data, stream.size, out.ctypes.data,
                       out.shape[0], chunk_size, it.ctypes.data,
                       isz.ctypes.data, len(it), int(isz.sum()))
    if r != 0:
        raise ValueError(f"laz decode failed ({r}): corrupt or unsupported stream")


def laz_chunk_table(table: np.ndarray, max_chunks: int) -> np.ndarray | None:
    """Decode a LASzip chunk table -> per-chunk byte sizes (u32 [n]), or None
    if the table is malformed. Chunks are independently coded, so the sizes
    make the stream seekable (parallel decode in formats/laz.py)."""
    lib = load_laz()
    table = np.ascontiguousarray(table, np.uint8)
    sizes = np.empty(max_chunks, np.uint32)
    n = lib.laz_decode_chunk_table(table.ctypes.data, table.size,
                                   sizes.ctypes.data, max_chunks)
    return sizes[:n].copy() if n >= 0 else None


def laz_encode(records: np.ndarray, chunk_size: int, item_types,
               item_sizes) -> np.ndarray:
    """Encode raw LAS point records [n, rec_size] into a chunked LASzip stream
    (starting with the 8-byte chunk-table offset, ending with the chunk table)."""
    lib = load_laz()
    records = np.ascontiguousarray(records, np.uint8)
    it = np.ascontiguousarray(item_types, np.uint16)
    isz = np.ascontiguousarray(item_sizes, np.uint16)
    n, rec_size = records.shape
    cap = records.size * 2 + 65536
    out = np.empty(cap, np.uint8)
    r = lib.laz_encode(records.ctypes.data, n, chunk_size, it.ctypes.data,
                       isz.ctypes.data, len(it), rec_size, out.ctypes.data, cap)
    if r <= 0:
        raise ValueError(f"laz encode failed ({r})")
    return out[:r].copy()
