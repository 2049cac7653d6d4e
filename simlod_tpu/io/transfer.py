"""Host->device transfer staging tuned to the attachment's measured physics.

The reference pushes pinned 16 MB slots through cuMemcpyHtoDAsync on a dedicated
stream (main_progressive_octree.cpp:963-1063) because that is what PCIe likes.
The TPU attachment in this environment is a tunneled runtime with its own
transfer physics, measured in scripts/h2d_bench.py / docs/PERFORMANCE.md:

  - individual device_put calls of <= 16 MB ride a fast path (4-6 GB/s burst);
    32 MB is erratic and >= 64 MB collapses ~50x (0.03-0.1 GB/s) — the tunnel
    appears to chunk/stage messages around a 16 MB unit;
  - an idle tunnel holds ~0.5 GB of burst credit; sustained throughput beyond
    it drops to the wire rate (~40-110 MB/s);
  - threading transfers makes them slower (single relay, global lock).

So every bulk H2D in this codebase goes through `device_put_pieces`: split the
host array into <= piece_bytes row-slices, device_put each, and reassemble
on-device with one concatenate (device-side copies run at HBM rate and are
free by comparison). On a direct (non-tunneled) attachment the split costs one
extra device-side copy per plane and nothing else.
"""
from __future__ import annotations

import numpy as np

PIECE_BYTES = 16 << 20


def put_pieces(arr: np.ndarray, device=None, piece_bytes: int = PIECE_BYTES):
    """device_put `arr` in <= piece_bytes slices along axis 0; returns the list
    of device pieces (not yet reassembled). Rows larger than piece_bytes ship
    as single oversized pieces (nothing smaller exists to split along)."""
    import jax

    rows = arr.shape[0]
    row_bytes = max(arr.nbytes // max(rows, 1), 1)
    rows_per = max(1, piece_bytes // row_bytes)
    if rows <= rows_per:
        return [jax.device_put(arr, device)]
    return [jax.device_put(arr[i:i + rows_per], device)
            for i in range(0, rows, rows_per)]


def assemble(pieces):
    """Reassemble put_pieces output into one device array (device-side concat)."""
    import jax.numpy as jnp

    if len(pieces) == 1:
        return pieces[0]
    return jnp.concatenate(pieces, axis=0)


def device_put_plane(arr: np.ndarray, device=None,
                     piece_bytes: int = PIECE_BYTES):
    """Piece-wise device_put of one host array; returns the device array."""
    return assemble(put_pieces(arr, device, piece_bytes))
