"""Bandwidth-optimal ragged segment gathers via aligned 128-lane row gathers.

The engine's dominant access pattern is "gather many variable-length CONTIGUOUS runs
of pool rows" (point segments, voxel CSR ranges). XLA element/row gathers cost ~6-7 ns
per gathered ROW on TPU v5e regardless of width — so the trick is to gather as few,
as wide rows as possible: view the pool as [P/A, 128] lanes (A = points per 128-lane
row) and fetch the aligned row ranges covering each segment. Each segment lands in the
output at the SAME phase (off mod A) it has in the pool, so the copy is exact; the up
to A-1 junk lanes before/after each segment are masked via a monotone carry (both
region starts and ends are strictly increasing, so plain cummax carries them — no
per-row table gathers at all).

Effective cost: ~6 ns per 128-lane row = ~0.2 ns per point for 4-float points —
~30x cheaper than per-point gathers, with no Pallas (works identically on CPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .segments import carry_last, exclusive_cumsum

LANES = 128


def ragged_gather(src: jax.Array, src_off: jax.Array, cnt: jax.Array,
                  out_len: int):
    """Gather segments src[src_off[i] : src_off[i]+cnt[i]] (rows of a [P, K] array,
    128 % (K) == 0) into a dense-ish [out_len, K] window.

    Returns (rows [out_len, K], seg_of_row [out_len] i32, elem [out_len] i32,
    valid [out_len] bool) where elem is the row's index within its segment.
    Segment i's data lands at phase-preserving positions; rows between segments are
    invalid. Requires out_len >= sum(ceil((off+cnt)/A) - floor(off/A)) * A; caller
    sizes the window with `window_for`.
    """
    P, K = src.shape
    A = LANES // K
    assert LANES % K == 0 and P % A == 0 and out_len % A == 0
    S = src_off.shape[0]
    src128 = src.reshape(P // A, LANES)

    nz = cnt > 0
    row0 = jnp.where(nz, src_off // A, 0)
    phase = jnp.where(nz, src_off % A, 0)
    rcnt = jnp.where(nz, (src_off + cnt + A - 1) // A - row0, 0)

    WR = out_len // A
    row_offs = exclusive_cumsum(rcnt)
    total_rows = jnp.sum(rcnt)
    seg_ids = jnp.arange(S, dtype=jnp.int32)
    pos = jnp.where(nz, row_offs, WR)
    markers = jnp.full((WR,), -1, jnp.int32).at[pos].max(seg_ids, mode="drop")
    seg_of_r = carry_last(markers)
    jr = jnp.arange(WR, dtype=jnp.int32)
    r_ok = (jr < total_rows) & (seg_of_r >= 0)
    sr = jnp.maximum(seg_of_r, 0)
    src_row = row0[sr] + (jr - row_offs[sr])        # small-table gathers (S entries)
    rows = src128[jnp.where(r_ok, src_row, P // A - 1)]   # THE row gather
    out = rows.reshape(out_len, K)

    # per-output-row segment id + validity via monotone carries (no table gathers):
    # segment i's valid range is [pstart_i, pend_i) with both sequences increasing.
    pstart = row_offs * A + phase
    pend = pstart + cnt
    j = jnp.arange(out_len, dtype=jnp.int32)
    mpos = jnp.where(nz, pstart, out_len)
    m_seg = jnp.full((out_len,), -1, jnp.int32).at[mpos].max(seg_ids, mode="drop")
    seg_of = carry_last(m_seg)
    m_end = jnp.full((out_len,), -1, jnp.int32).at[mpos].max(
        jnp.where(nz, pend, -1), mode="drop")
    end_of = carry_last(m_end)
    m_start = jnp.full((out_len,), -1, jnp.int32).at[mpos].max(
        jnp.where(nz, pstart, -1), mode="drop")
    start_of = carry_last(m_start)
    valid = (seg_of >= 0) & (j < end_of)
    elem = j - jnp.maximum(start_of, 0)
    return out, jnp.maximum(seg_of, 0), elem, valid


def window_for(total_points: int, max_segments: int, K: int) -> int:
    """Static output window: every segment may add up to 2(A-1) rows of phase padding
    (head alignment + tail round-up)."""
    A = LANES // K
    w = total_points + max_segments * 2 * A + A
    return ((w + A - 1) // A) * A
