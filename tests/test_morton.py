"""Unit tests for Morton utilities against plain-Python big-int bit interleaving."""
import numpy as np
import jax.numpy as jnp

from simlod_tpu import constants as C
from simlod_tpu.ops import morton


def py_morton(qx, qy, qz):
    """Big-int 84-bit Morton code, x most significant within each triple."""
    qx, qy, qz = int(qx), int(qy), int(qz)  # python ints: 84 bits overflow np.int64
    m = 0
    for t in range(C.FULL_GRID_BITS):
        b = C.FULL_GRID_BITS - 1 - t
        m = (m << 3) | (((qx >> b) & 1) << 2) | (((qy >> b) & 1) << 1) | ((qz >> b) & 1)
    return m


def words_to_int(w0, w1, w2):
    return (int(w0) << 54) | (int(w1) << 24) | int(w2)


def test_encode_matches_python(rng):
    q = rng.integers(0, C.FULL_GRID_SIZE, size=(256, 3), dtype=np.int64)
    w0, w1, w2 = morton.encode(jnp.asarray(q[:, 0], jnp.int32),
                               jnp.asarray(q[:, 1], jnp.int32),
                               jnp.asarray(q[:, 2], jnp.int32))
    w0, w1, w2 = np.asarray(w0), np.asarray(w1), np.asarray(w2)
    for i in range(len(q)):
        assert words_to_int(w0[i], w1[i], w2[i]) == py_morton(*q[i])


def test_roundtrip(rng):
    q = rng.integers(0, C.FULL_GRID_SIZE, size=(1024, 3), dtype=np.int64)
    w = morton.encode(jnp.asarray(q[:, 0], jnp.int32), jnp.asarray(q[:, 1], jnp.int32),
                      jnp.asarray(q[:, 2], jnp.int32))
    dx, dy, dz = morton.decode(*w)
    np.testing.assert_array_equal(np.asarray(dx), q[:, 0])
    np.testing.assert_array_equal(np.asarray(dy), q[:, 1])
    np.testing.assert_array_equal(np.asarray(dz), q[:, 2])


def test_word_order_is_lexicographic(rng):
    q = rng.integers(0, C.FULL_GRID_SIZE, size=(512, 3), dtype=np.int64)
    w0, w1, w2 = [np.asarray(w) for w in morton.encode(
        jnp.asarray(q[:, 0], jnp.int32), jnp.asarray(q[:, 1], jnp.int32),
        jnp.asarray(q[:, 2], jnp.int32))]
    full = np.array([py_morton(*row) for row in q], dtype=object)
    order_full = np.argsort(full, kind="stable")
    order_words = np.lexsort((w2, w1, w0))
    np.testing.assert_array_equal(order_full.astype(np.int64),
                                  order_words.astype(np.int64))


def test_octant_matches_reference_bits(rng):
    q = rng.integers(0, C.FULL_GRID_SIZE, size=(64, 3), dtype=np.int64)
    for level in [0, 1, 5, 19]:
        octs = np.asarray(morton.octant_at_level(
            jnp.asarray(q[:, 0], jnp.int32), jnp.asarray(q[:, 1], jnp.int32),
            jnp.asarray(q[:, 2], jnp.int32), jnp.int32(level)))
        shift = C.FULL_GRID_BITS - 1 - level
        exp = (((q[:, 0] >> shift) & 1) << 2) | (((q[:, 1] >> shift) & 1) << 1) \
            | ((q[:, 2] >> shift) & 1)
        np.testing.assert_array_equal(octs, exp)


def test_cell_matches_reference_leveling(rng):
    """Cell math must equal sampleVoxel's (voxels.cu:78-86): divide the 28-bit coord by
    2^(MAX_DEPTH+1-level) then take modulo 128."""
    q = rng.integers(0, C.FULL_GRID_SIZE, size=(64, 3), dtype=np.int64)
    for level in [0, 1, 7, 15]:
        cell = np.asarray(morton.cell_at_level(
            jnp.asarray(q[:, 0], jnp.int32), jnp.asarray(q[:, 1], jnp.int32),
            jnp.asarray(q[:, 2], jnp.int32), jnp.int32(level)))
        div = 1 << ((C.MAX_DEPTH + 1) - level)
        cx = (q[:, 0] // div) % C.GRID_SIZE
        cy = (q[:, 1] // div) % C.GRID_SIZE
        cz = (q[:, 2] // div) % C.GRID_SIZE
        np.testing.assert_array_equal(cell, (cx << 14) | (cy << 7) | cz)
        ux, uy, uz = morton.cell_to_xyz(jnp.asarray(cell, jnp.int32))
        np.testing.assert_array_equal(np.asarray(ux), cx)
        np.testing.assert_array_equal(np.asarray(uy), cy)
        np.testing.assert_array_equal(np.asarray(uz), cz)
