"""Morton (Z-order) utilities.

The reference addresses octree nodes by an explicit name string of octant digits
(structures.cuh:86) and descends pointer trees by re-deriving octants from quantized
coordinates (progressive_octree_voxels.cu:169-187). Here Morton codes are the backbone:
the octree builder sorts batches by Morton code so that every node's points form a
contiguous run and per-cell deduplication reduces to adjacent comparison; the multi-chip
path shards by top Morton bits. (The reference ships the same primitive, unused, at
include/utils.h:14-28.)

Bit order matches the reference's octant convention: childIndex = (x<<2)|(y<<1)|z
(progressive_octree_voxels.cu:180) — x is the most significant axis.

Coordinates are quantized to FULL_GRID_BITS = 28 bits per axis, so a full Morton code is
84 bits. jnp has no native int84 (and TPU int64 is emulated), so codes are returned as
three int32 words, each covering consecutive octant levels, ordered for lexicographic
comparison: (w0, w1, w2) with w0 = levels 0..9 (30 bits), w1 = levels 10..19 (30 bits),
w2 = levels 20..27 (24 bits).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C

# Word layout: number of octant levels per word.
WORD_LEVELS = (10, 10, 8)
assert sum(WORD_LEVELS) == C.FULL_GRID_BITS


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so bit i moves to bit 3*i (uint32 math)."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _compact3(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _spread3: gather bits 0,3,6,... into the low 10 bits."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x09249249)
    v = (v | (v >> 2)) & jnp.uint32(0x030C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0300F00F)
    v = (v | (v >> 8)) & jnp.uint32(0x030000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def quantize(xyz: jnp.ndarray, box_min: jnp.ndarray, cube_size: jnp.ndarray,
             bits: int = C.FULL_GRID_BITS) -> jnp.ndarray:
    """Quantize float positions to integer grid coords in [0, 2^bits).

    Matches the reference's truncating conversion `uint32_t X = fGridSize * (x-min)/size`
    (progressive_octree_voxels.cu:148-156) with an added clamp so points exactly on the
    max boundary stay in range.
    """
    g = jnp.float32(1 << bits)
    rel = (xyz - box_min.astype(jnp.float32)) / cube_size.astype(jnp.float32)
    q = jnp.floor(rel * g).astype(jnp.int32)
    return jnp.clip(q, 0, (1 << bits) - 1)


def quantize_cols(x, y, z, box_min, cube_size, bits: int = C.FULL_GRID_BITS):
    """Column-wise quantize (identical math; avoids [N,3] stacks, which lane-pad 32x
    on TPU)."""
    g = jnp.float32(1 << bits)
    inv = g / cube_size.astype(jnp.float32)
    lo, hi = 0, (1 << bits) - 1
    qx = jnp.clip(jnp.floor((x - box_min[0]) * inv).astype(jnp.int32), lo, hi)
    qy = jnp.clip(jnp.floor((y - box_min[1]) * inv).astype(jnp.int32), lo, hi)
    qz = jnp.clip(jnp.floor((z - box_min[2]) * inv).astype(jnp.int32), lo, hi)
    return qx, qy, qz


def dequantize_cols(qx, qy, qz, box_min, cube_size,
                    bits: int = C.FULL_GRID_BITS):
    """Cell-center float positions of quantized grid coords (inverse of
    quantize_cols up to f32 rounding).

    The point pool stores 28-bit Morton words, not floats (the words ARE the
    routing/voxel keys, so spills re-route bit-exactly); consumers that need
    world positions reconstruct them here. At 2^28 cells/axis the center is
    finer than f32's own resolution over most of the cube, so nothing is lost
    vs storing the original f32 coordinates."""
    s = cube_size.astype(jnp.float32) / jnp.float32(1 << bits)
    x = box_min[0] + (qx.astype(jnp.float32) + 0.5) * s
    y = box_min[1] + (qy.astype(jnp.float32) + 0.5) * s
    z = box_min[2] + (qz.astype(jnp.float32) + 0.5) * s
    return x, y, z


def encode(qx: jnp.ndarray, qy: jnp.ndarray, qz: jnp.ndarray):
    """Interleave 28-bit per-axis coords into 3 lexicographic int32 Morton words.

    Level t (t=0 is the root octant) draws bit (27 - t) from each axis; within a triple
    x is the most significant bit, matching childIndex = (x<<2)|(y<<1)|z.
    """
    qx = qx.astype(jnp.uint32)
    qy = qy.astype(jnp.uint32)
    qz = qz.astype(jnp.uint32)
    words = []
    hi = C.FULL_GRID_BITS
    for nlev in WORD_LEVELS:
        lo = hi - nlev
        sx = (qx >> lo) & jnp.uint32((1 << nlev) - 1)
        sy = (qy >> lo) & jnp.uint32((1 << nlev) - 1)
        sz = (qz >> lo) & jnp.uint32((1 << nlev) - 1)
        w = (_spread3(sx) << 2) | (_spread3(sy) << 1) | _spread3(sz)
        words.append(w.astype(jnp.int32))
        hi = lo
    return tuple(words)


def decode(w0: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray):
    """Inverse of encode: back to 28-bit per-axis coords (int32)."""
    qx = jnp.zeros_like(w0, dtype=jnp.uint32)
    qy = jnp.zeros_like(w0, dtype=jnp.uint32)
    qz = jnp.zeros_like(w0, dtype=jnp.uint32)
    hi = C.FULL_GRID_BITS
    for w, nlev in zip((w0, w1, w2), WORD_LEVELS):
        lo = hi - nlev
        wu = w.astype(jnp.uint32)
        qx = qx | (_compact3(wu >> 2) << lo)
        qy = qy | (_compact3(wu >> 1) << lo)
        qz = qz | (_compact3(wu) << lo)
        hi = lo
    return qx.astype(jnp.int32), qy.astype(jnp.int32), qz.astype(jnp.int32)


def octant_at_level(qx: jnp.ndarray, qy: jnp.ndarray, qz: jnp.ndarray,
                    level: jnp.ndarray) -> jnp.ndarray:
    """Octant index taken when descending FROM a node at `level` (0-based).

    Matches the reference (progressive_octree_voxels.cu:169-181): with node coords at
    MAX_DEPTH resolution (the top MAX_DEPTH bits of the 28-bit coords), the child bit at
    level l is bit (MAX_DEPTH - l - 1), i.e. bit (FULL_GRID_BITS - l - 1) - (GRID_BITS+1)
    ... expressed directly on the 28-bit coords: bit (27 - l) selects the child of a
    level-l node.
    """
    shift = (C.FULL_GRID_BITS - 1) - level
    bx = (qx >> shift) & 1
    by = (qy >> shift) & 1
    bz = (qz >> shift) & 1
    return ((bx << 2) | (by << 1) | bz).astype(jnp.int32)


def cell_at_level(qx: jnp.ndarray, qy: jnp.ndarray, qz: jnp.ndarray,
                  level: jnp.ndarray) -> jnp.ndarray:
    """Packed 21-bit cell index of a point within a level-`level` node's 128^3 grid.

    Cell coords are (q >> (MAX_DEPTH + 1 - level)) & 127, exactly the reference's
    sampleVoxel leveling (progressive_octree_voxels.cu:78-86). Packed as
    (cx << 14) | (cy << 7) | cz so that packed order == (x,y,z) lexicographic order.
    """
    shift = (C.MAX_DEPTH + 1) - level
    cx = (qx >> shift) & (C.GRID_SIZE - 1)
    cy = (qy >> shift) & (C.GRID_SIZE - 1)
    cz = (qz >> shift) & (C.GRID_SIZE - 1)
    return ((cx << (2 * C.GRID_BITS)) | (cy << C.GRID_BITS) | cz).astype(jnp.int32)


def cell_to_xyz(cell: jnp.ndarray):
    """Unpack a 21-bit cell index to (cx, cy, cz) in [0, 128)."""
    cx = (cell >> (2 * C.GRID_BITS)) & (C.GRID_SIZE - 1)
    cy = (cell >> C.GRID_BITS) & (C.GRID_SIZE - 1)
    cz = cell & (C.GRID_SIZE - 1)
    return cx, cy, cz


def key_words_at_level(w0, w1, w2, level):
    """Global voxel-cell identity key: Morton words masked to the top
    3*(level + GRID_BITS) bits, with `level` packed into k2's low 5 bits.

    A level-l voxel cell is identified globally by (l, per-axis prefix
    q >> (MAX_DEPTH + 1 - l)) — the node's top-l bits ++ the 7 cell bits (reference
    sampleVoxel leveling, progressive_octree_voxels.cu:78-86). Interleaved, that is
    the top 3*(l+7) bits of the 84-bit code. Voxels live on nodes at level <= 19,
    so at most 26 octant levels are kept and w2's low 6 bits are always zero —
    the 5-bit level rides there, making (k0, k1, k2l) a complete, lexicographically
    sortable key (equal keys <=> same voxel cell)."""
    keep = level + C.GRID_BITS
    words = []
    off = 0
    for w, nlev in zip((w0, w1, w2), WORD_LEVELS):
        k = jnp.clip(keep - off, 0, nlev)
        drop = 3 * (nlev - k)
        mask = ~((jnp.uint32(1) << drop.astype(jnp.uint32)) - jnp.uint32(1))
        words.append((w.astype(jnp.uint32) & mask).astype(jnp.int32))
        off += nlev
    k0, k1, k2 = words
    return k0, k1, k2 | level


def key_words_decode(k0, k1, k2l):
    """Inverse of key_words_at_level: (level, local 128^3 cell coords cx,cy,cz).

    The per-axis prefix is q >> (MAX_DEPTH + 1 - level); its low GRID_BITS bits are
    the cell coords within the owning node (cell_at_level semantics)."""
    level = k2l & 31
    qx, qy, qz = decode(k0, k1, k2l & ~31)
    shift = (C.MAX_DEPTH + 1) - level
    m = C.GRID_SIZE - 1
    return level, (qx >> shift) & m, (qy >> shift) & m, (qz >> shift) & m


def prefix_at_level(qx, qy, qz, level):
    """Per-axis coordinate prefixes identifying the (node, 128^3-cell) pair at `level`.

    Two points share a level-`level` voxel cell iff all three prefixes are equal
    (the node is the top `level` bits, the cell the next 7).
    """
    shift = (C.MAX_DEPTH + 1) - level
    return qx >> shift, qy >> shift, qz >> shift
