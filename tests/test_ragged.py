"""Unit tests for the aligned-row ragged gather (ops/ragged.py)."""
import numpy as np
import jax.numpy as jnp

from simlod_tpu.ops import ragged


def make_segments(rng, P, S, max_cnt=300):
    offs = np.sort(rng.choice(P - max_cnt - 1, S, replace=False)).astype(np.int64)
    cnts = rng.integers(0, max_cnt, S)
    for i in range(S - 1):
        cnts[i] = min(cnts[i], offs[i + 1] - offs[i])
    return offs, cnts


def test_gather_matches_numpy(rng):
    P = 1 << 14
    src = rng.integers(0, 1 << 30, P).astype(np.int32)
    offs, cnts = make_segments(rng, P, 50)
    W = ragged.window_for(int(cnts.sum()), 50)
    p = ragged.plan(jnp.asarray(offs, jnp.int32), jnp.asarray(cnts, jnp.int32), W)
    out = np.asarray(ragged.gather_column(p, jnp.asarray(src)))
    seg_of = np.asarray(p.seg_of)
    elem = np.asarray(p.elem)
    valid = np.asarray(p.valid)
    assert valid.sum() == cnts.sum()
    # every valid row reproduces src[offs[seg]+elem], in order, exactly once
    got = {}
    for j in np.where(valid)[0]:
        s, e = seg_of[j], elem[j]
        assert out[j] == src[offs[s] + e]
        got.setdefault(int(s), []).append(int(e))
    for i in range(50):
        if cnts[i] > 0:
            assert got[i] == list(range(cnts[i])), f"segment {i} wrong coverage"


def test_unsorted_offsets_and_shared_rows(rng):
    """Segments in arbitrary pool order, adjacent segments sharing a 128-row."""
    P = 1 << 12
    src = rng.integers(0, 1 << 30, P).astype(np.int32)
    offs = np.array([1000, 130, 137, 0, 2000], np.int64)   # 130/137 share a row
    cnts = np.array([100, 7, 50, 3, 0], np.int64)
    W = ragged.window_for(int(cnts.sum()), 5)
    p = ragged.plan(jnp.asarray(offs, jnp.int32), jnp.asarray(cnts, jnp.int32), W)
    out = np.asarray(ragged.gather_column(p, jnp.asarray(src)))
    valid = np.asarray(p.valid)
    seg_of = np.asarray(p.seg_of)
    elem = np.asarray(p.elem)
    assert valid.sum() == cnts.sum()
    for j in np.where(valid)[0]:
        assert out[j] == src[offs[seg_of[j]] + elem[j]]
    # first valid row of each nonzero segment is elem == 0
    for i in range(5):
        rows = np.where(valid & (seg_of == i))[0]
        if cnts[i] > 0:
            assert elem[rows[0]] == 0 and elem[rows[-1]] == cnts[i] - 1


def test_zero_phase_and_full_rows(rng):
    P = 1 << 10
    src = np.arange(P, dtype=np.int32)
    offs = np.array([0, 128, 256], np.int64)
    cnts = np.array([128, 128, 128], np.int64)
    W = ragged.window_for(384, 3)
    p = ragged.plan(jnp.asarray(offs, jnp.int32), jnp.asarray(cnts, jnp.int32), W)
    out = np.asarray(ragged.gather_column(p, jnp.asarray(src)))
    valid = np.asarray(p.valid)
    np.testing.assert_array_equal(out[valid], np.arange(384))


def test_broadcast_i32_matches_gather(rng):
    """broadcast_i32 must equal vals[seg_of] on every valid row, including empty
    segments, negative values, and segments sharing alignment rows."""
    S = 64
    cnts = rng.integers(0, 40, S)
    cnts[::7] = 0                       # sprinkle empty segments
    cnts[0] = 0                         # leading empties exercise the prefix
    cnts[1] = 0
    offs = np.zeros(S, np.int64)
    pos = 5
    for i in range(S):
        offs[i] = pos
        pos += cnts[i] + int(rng.integers(0, 3))
    W = ragged.window_for(int(cnts.sum()), S)
    p = ragged.plan(jnp.asarray(offs, jnp.int32), jnp.asarray(cnts, jnp.int32), W)
    vals = rng.integers(-(1 << 20), 1 << 20, S).astype(np.int32)
    out = np.asarray(ragged.broadcast_i32(p, jnp.asarray(vals)))
    valid = np.asarray(p.valid)
    seg_of = np.asarray(p.seg_of)
    assert valid.sum() == cnts.sum()
    np.testing.assert_array_equal(out[valid], vals[seg_of[valid]])
