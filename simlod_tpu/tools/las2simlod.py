"""LAS/LAZ -> .simlod converter (parity with the reference's tools/las2simlod.mjs).

Usage: las2simlod input.las [output.simlod]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..formats import las, laz, simlod

BATCH = 1_000_000


def convert(src: str, dst: str, batch: int = BATCH, verbose: bool = True) -> int:
    is_laz = src.lower().endswith(".laz")
    hdr = (laz if is_laz else las).load_header(src)
    box_min = np.zeros(3, np.float32)
    box_max = (hdr.box_max - hdr.box_min).astype(np.float32)
    header = np.concatenate([box_min, box_max])
    n_done = 0
    with open(dst, "wb") as f:
        f.write(header.astype(np.float32).tobytes())
        while n_done < hdr.num_points:
            cnt = min(batch, hdr.num_points - n_done)
            reader = laz.read_points if is_laz else las.read_points
            xyz, rgba = reader(hdr if not is_laz else src, n_done, cnt,
                               translation=-hdr.box_min)
            rec = np.zeros(len(xyz), dtype=np.dtype(
                [("xyz", np.float32, 3), ("rgba", np.uint32)]))
            rec["xyz"] = xyz
            rec["rgba"] = rgba
            f.write(rec.tobytes())
            n_done += cnt
            if verbose:
                print(f"points processed: {n_done:,}", file=sys.stderr)
    return n_done


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args(argv)
    out = args.output or os.path.splitext(args.input)[0] + ".simlod"
    n = convert(args.input, out, args.batch)
    print(f"wrote {n:,} points -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
