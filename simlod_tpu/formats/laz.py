"""LAZ (compressed LAS) support — gated on an available decoder.

The reference decodes LAZ through the vendored third-party laszip library in its loader
threads (main_progressive_octree.cpp:879-926). This environment ships no LAZ decoder;
this module gates on `laspy[lazrs]` or an external `laszip` binary if either appears,
and otherwise raises with a clear message. The streaming pipeline treats a decoded LAZ
batch identically to LAS (same ~30 MP/s expectations as the reference, README.md:10).
"""
from __future__ import annotations

import shutil
import subprocess
import tempfile

import numpy as np

from . import las


def _laspy():
    try:
        import laspy  # noqa
        return laspy
    except Exception:
        return None


def available() -> bool:
    return _laspy() is not None or shutil.which("laszip") is not None


def load_header(path: str) -> las.LasHeader:
    # the LAZ header is a LAS header (compression flagged in the format bits)
    return las.load_header(path)


def read_points(path: str, first: int = 0, count: int | None = None,
                translation=None):
    lp = _laspy()
    if lp is not None:
        f = lp.read(path)
        hdr = las.load_header(path)
        if translation is None:
            translation = -hdr.box_min
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
        if count is None:
            count = len(xyz) - first
        return xyz[first:first + count], rgba[first:first + count]
    if shutil.which("laszip") is not None:
        with tempfile.NamedTemporaryFile(suffix=".las") as tmp:
            subprocess.run(["laszip", "-i", path, "-o", tmp.name], check=True)
            return las.read_points(tmp.name, first, count, translation)
    raise RuntimeError(
        "LAZ support requires `laspy[lazrs]` or a `laszip` binary; neither is "
        "available in this environment. Convert to .las or .simlod first.")
