"""LAZ (LASzip-compressed LAS) reader/writer.

The reference decodes LAZ through the vendored third-party laszip library in its
loader threads (main_progressive_octree.cpp:879-926, ~30 MP/s per README.md:10).
Here the decode runs through our own native C codec (native/laszip_codec.c —
arithmetic coder + v2 item codecs for point formats 0-3, built from the published
LAZ specification), with `laspy`/a `laszip` binary as optional fallbacks.

Each file is decompressed ONCE and the raw records cached (LAZ is not
seekable per batch without the chunk table; the streaming loader pulls many
1M-point batches per file, see ADVICE round 1).
"""
from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile
import threading

import numpy as np

from . import las

LASZIP_USER_ID = b"laszip encoded\x00\x00"
LASZIP_RECORD_ID = 22204
ITEM_BYTE, ITEM_POINT10, ITEM_GPSTIME11, ITEM_RGB12 = 0, 6, 7, 8
DEFAULT_CHUNK = 50_000

# per-path decoded record cache (one file at a time is plenty for streaming)
_cache_lock = threading.Lock()
_cache: dict[str, np.ndarray] = {}
_CACHE_FILES = 2


def _laspy():
    try:
        import laspy  # noqa
        return laspy
    except Exception:
        return None


def available() -> bool:
    from .. import native
    return (native.laz_available() or _laspy() is not None
            or shutil.which("laszip") is not None)


def load_header(path: str) -> las.LasHeader:
    # the LAZ header is a LAS header (compression flagged in the format bits)
    return las.load_header(path)


def _read_laszip_vlr(path: str, hdr: las.LasHeader):
    """Parse the LASzip VLR -> (compressor, chunk_size, item_types, item_sizes)."""
    with open(path, "rb") as f:
        buf = f.read(hdr.offset_to_points)
    pos = hdr.header_size
    while pos + 54 <= len(buf):
        user_id = buf[pos + 2:pos + 18]
        record_id = struct.unpack_from("<H", buf, pos + 18)[0]
        length = struct.unpack_from("<H", buf, pos + 20)[0]
        payload = buf[pos + 54:pos + 54 + length]
        if user_id == LASZIP_USER_ID and record_id == LASZIP_RECORD_ID:
            compressor, _coder = struct.unpack_from("<HH", payload, 0)
            chunk_size = struct.unpack_from("<I", payload, 12)[0]
            num_items = struct.unpack_from("<H", payload, 32)[0]
            types, sizes = [], []
            for i in range(num_items):
                t, s, _v = struct.unpack_from("<HHH", payload, 34 + 6 * i)
                types.append(t)
                sizes.append(s)
            return compressor, chunk_size, types, sizes
        pos += 54 + length
    raise ValueError(f"{path}: no LASzip VLR found (not a LAZ file?)")


def _items_for_format(fmt: int, bpp: int):
    types = [ITEM_POINT10]
    sizes = [20]
    if fmt in (1, 3):
        types.append(ITEM_GPSTIME11)
        sizes.append(8)
    if fmt in (2, 3):
        types.append(ITEM_RGB12)
        sizes.append(6)
    used = sum(sizes)
    if bpp > used:
        types.append(ITEM_BYTE)
        sizes.append(bpp - used)
    return types, sizes


def _decode_file(path: str, hdr: las.LasHeader, workers: int | None = None
                 ) -> np.ndarray:
    """Decompress the whole file once -> raw LAS records [n, bpp] (cached).

    LASzip chunks are independently coded (models + coder restart per chunk),
    so with a decodable chunk table the decode fans out over a thread pool —
    each worker runs the native decoder (GIL released by ctypes) on its own
    contiguous chunk range. This is the same parallelism the reference gets
    from 2xnCPU loader threads each running laszip on a different file region
    (main_progressive_octree.cpp:811-958, ~30 MP/s LAZ per README.md:10 on a
    16-core host; ~2-4 MP/s is the universal per-core arithmetic-decode rate).
    """
    with _cache_lock:
        if path in _cache:
            return _cache[path]
    from .. import native
    compressor, chunk_size, types, sizes = _read_laszip_vlr(path, hdr)
    if compressor not in (1, 2):
        raise ValueError(f"{path}: unsupported LASzip compressor {compressor} "
                         "(layered/LAS-1.4 formats 6+ not supported)")
    if sum(sizes) != hdr.bytes_per_point:
        raise ValueError(f"{path}: VLR items sum to {sum(sizes)} B but header "
                         f"says {hdr.bytes_per_point} B/point")
    with open(path, "rb") as f:
        f.seek(hdr.offset_to_points)
        data = np.frombuffer(f.read(), np.uint8)
    if compressor == 2:
        table_abs = int(np.frombuffer(data[:8].tobytes(), "<i8")[0])
        data = data[8:]
        table_off = table_abs - hdr.offset_to_points - 8
        rec = _decode_chunked(hdr, data, table_off, chunk_size, types, sizes,
                              workers)
    else:
        chunk_size = 1 << 62  # pointwise: one chunk spanning the file
        rec = native.laz_decode(data, hdr.num_points, chunk_size, types, sizes)
    with _cache_lock:
        if len(_cache) >= _CACHE_FILES:
            _cache.pop(next(iter(_cache)))
        _cache[path] = rec
    return rec


def _decode_chunked(hdr, data, table_off, chunk_size, types, sizes,
                    workers) -> np.ndarray:
    from .. import native
    n = hdr.num_points
    nchunks = (n + chunk_size - 1) // chunk_size
    csizes = None
    if 0 < table_off <= len(data):
        csizes = native.laz_chunk_table(data[table_off:], nchunks)
        if csizes is not None and len(csizes) != nchunks:
            csizes = None
        # consistency: chunk payloads must tile the stream exactly up to the
        # table. A corrupt-but-decodable table would otherwise seek workers to
        # wrong offsets and yield silently garbled points — the sequential
        # path ignores the table and still decodes such files correctly.
        if csizes is not None and int(np.sum(csizes)) != table_off:
            csizes = None
    workers = workers or min(nchunks, max(2, (os.cpu_count() or 1)))
    if csizes is None or workers <= 1 or nchunks <= 1:
        return native.laz_decode(data, n, chunk_size, types, sizes)
    starts = np.zeros(nchunks + 1, np.int64)
    np.cumsum(csizes, out=starts[1:])
    rec_size = int(np.sum(sizes))
    out = np.empty((n, rec_size), np.uint8)
    per = (nchunks + workers - 1) // workers

    def run(w):
        c0 = w * per
        c1 = min(c0 + per, nchunks)
        if c0 >= c1:
            return
        p0 = c0 * chunk_size
        npts = min(c1 * chunk_size, n) - p0
        native.laz_decode_into(data[starts[c0]:starts[c1]], out[p0:p0 + npts],
                               chunk_size, types, sizes)

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(run, range(workers)))
    return out


def read_points(path: str, first: int = 0, count: int | None = None,
                translation=None):
    hdr = las.load_header(path)
    if count is None:
        count = hdr.num_points - first
    count = max(0, min(count, hdr.num_points - first))
    if translation is None:
        translation = -hdr.box_min
    from .. import native
    if native.laz_available():
        rec = _decode_file(path, hdr)
        raw = rec[first:first + count].reshape(-1)
        return las.decode_points(hdr, raw, translation)
    lp = _laspy()
    if lp is not None:
        f = lp.read(path)
        xyz = np.stack([np.asarray(f.x), np.asarray(f.y), np.asarray(f.z)], -1)
        xyz = (xyz + np.asarray(translation)[None, :]).astype(np.float32)
        if hasattr(f, "red"):
            r = np.asarray(f.red, np.uint32)
            g = np.asarray(f.green, np.uint32)
            b = np.asarray(f.blue, np.uint32)
            r = np.where(r > 255, r // 256, r)
            g = np.where(g > 255, g // 256, g)
            b = np.where(b > 255, b // 256, b)
        else:
            r = g = b = np.full(len(xyz), 255, np.uint32)
        rgba = (r | (g << 8) | (b << 16) | np.uint32(255) << 24).astype(np.uint32)
        return xyz[first:first + count], rgba[first:first + count]
    if shutil.which("laszip") is not None:
        with tempfile.NamedTemporaryFile(suffix=".las") as tmp:
            subprocess.run(["laszip", "-i", path, "-o", tmp.name], check=True)
            return las.read_points(tmp.name, first, count, translation)
    raise RuntimeError(
        "LAZ support requires the native codec (needs a C compiler at first "
        "use), `laspy[lazrs]`, or a `laszip` binary.")


def write(path: str, xyz: np.ndarray, rgba: np.ndarray, scale=0.001,
          chunk_size: int = DEFAULT_CHUNK) -> None:
    """Write a LAZ file (LAS 1.2 point format 2 + LASzip v2 chunked stream)."""
    from .. import native
    xyz = np.asarray(xyz, np.float64)
    rgba = np.asarray(rgba, np.uint32)
    n = len(xyz)
    mn, mx = xyz.min(axis=0), xyz.max(axis=0)
    scale3 = np.full(3, scale, np.float64)
    offset = mn
    bpp = 26
    header_size = 227
    types, sizes = _items_for_format(2, bpp)

    # LASzip VLR payload
    items = b"".join(struct.pack("<HHH", t, s, 2) for t, s in zip(types, sizes))
    payload = struct.pack("<HHBBHIIqqH", 2, 0, 2, 2, 0, 0, chunk_size,
                          0, -1, len(types)) + items
    vlr = struct.pack("<H", 0) + LASZIP_USER_ID + \
        struct.pack("<HH", LASZIP_RECORD_ID, len(payload)) + b"\x00" * 32 + payload
    offset_to_points = header_size + len(vlr)

    buf = bytearray(header_size)
    buf[0:4] = b"LASF"
    buf[24], buf[25] = 1, 2
    struct.pack_into("<H", buf, 94, header_size)
    struct.pack_into("<I", buf, 96, offset_to_points)
    struct.pack_into("<I", buf, 100, 1)  # number of VLRs
    buf[104] = 2 | 0x80                  # format 2, compression flag
    struct.pack_into("<H", buf, 105, bpp)
    struct.pack_into("<I", buf, 107, n)
    struct.pack_into("<3d", buf, 131, *scale3)
    struct.pack_into("<3d", buf, 155, *offset)
    struct.pack_into("<d", buf, 179, mx[0])
    struct.pack_into("<d", buf, 187, mn[0])
    struct.pack_into("<d", buf, 195, mx[1])
    struct.pack_into("<d", buf, 203, mn[1])
    struct.pack_into("<d", buf, 211, mx[2])
    struct.pack_into("<d", buf, 219, mn[2])

    rec = np.zeros((n, bpp), np.uint8)
    xyz_i = np.round((xyz - offset[None, :]) / scale3[None, :]).astype("<i4")
    rec[:, :12] = xyz_i.view(np.uint8).reshape(n, 12)
    rgb16 = np.stack([(rgba & 0xFF) * 257, ((rgba >> 8) & 0xFF) * 257,
                      ((rgba >> 16) & 0xFF) * 257], -1).astype("<u2")
    rec[:, 20:26] = rgb16.view(np.uint8).reshape(n, 6)

    stream = native.laz_encode(rec, chunk_size, types, sizes)
    # laz_encode stores the chunk-table offset relative to the stream start;
    # readers expect an absolute file offset
    rel = int(np.frombuffer(stream[:8].tobytes(), "<i8")[0])
    stream = bytearray(stream.tobytes())
    stream[0:8] = struct.pack("<q", rel + offset_to_points)
    with open(path, "wb") as f:
        f.write(buf)
        f.write(vlr)
        f.write(stream)
