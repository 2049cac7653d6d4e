"""Segment / scan / compaction primitives.

These are the TPU-native replacements for the reference's device-wide dynamic work
distribution: where CUDA work-steals with atomics (render.cu:179-191,
progressive_octree_voxels.cu:251-262), XLA code flattens ragged work into dense arrays
with cumulative sums, run-boundary masks, and marker-scatter + running-max carries.

Conventions: all index arrays are int32; "OOB drop" scatters use jnp's .at[] with
mode='drop' and an out-of-range index as the mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .fastops import gather1d


def exclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    c = jnp.cumsum(x)
    return c - x


def run_starts(vals: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """True where a run of equal adjacent values starts (row 0 included).

    If `valid` is given, invalid rows are never run starts (they are assumed to be
    compacted to the tail).
    """
    prev = jnp.roll(vals, 1)
    starts = vals != prev
    starts = starts.at[0].set(True)
    if valid is not None:
        starts = starts & valid
    return starts


def carry_last(markers: jnp.ndarray) -> jnp.ndarray:
    """Carry-forward of monotonically scattered markers.

    `markers` holds -1 at unmarked rows and a NON-DECREASING value at marked rows
    (true whenever markers were scattered in increasing order at increasing positions).
    Returns, per row, the most recent marker value at or before it (-1 before the first).
    """
    return jax.lax.cummax(markers)


def take_last(markers: jnp.ndarray, sentinel: int = -1) -> jnp.ndarray:
    """Carry-forward of ARBITRARY-valued markers (segmented broadcast).

    Like carry_last but without the monotonicity requirement: each row receives the
    most recent non-sentinel value at or before it (sentinel before the first). The
    take-last combiner is associative, so this is a log-depth associative_scan of
    elementwise selects — far cheaper than the gather-based alternative
    (carry positions via cummax, then values[pos]: ~7 ns per gathered row on v5e).
    """
    s = jnp.asarray(sentinel, markers.dtype)
    # Hillis-Steele log-shift scan. jax.lax.associative_scan computes the same
    # thing work-efficiently, but its recursive odd/even slicing takes XLA:TPU
    # MINUTES to compile at multi-million row widths (measured: 3-key 4M sort
    # 21 s, associative_scan 4M > 20 min); these log2(n) slice+concat steps
    # compile in seconds and cost ~2x the HBM traffic at runtime.
    n = markers.shape[0]
    x = markers
    k = 1
    while k < n:
        shifted = jnp.concatenate([jnp.full((k,), s, x.dtype), x[:-k]])
        x = jnp.where(x == s, shifted, x)
        k <<= 1
    return x


def expand_segments(sel_counts: jnp.ndarray, out_len: int):
    """Ragged expansion: for segments with `sel_counts[i]` elements, produce a dense
    window of `out_len` rows where row j holds (segment index, element-within-segment).

    Returns (seg_of_row, elem_of_row, row_valid, total). Rows beyond sum(sel_counts)
    are flagged invalid (their seg_of_row is clamped to a real segment).
    """
    offs = exclusive_cumsum(sel_counts)
    total = jnp.sum(sel_counts)
    n = sel_counts.shape[0]
    seg_ids = jnp.arange(n, dtype=jnp.int32)
    # scatter each non-empty segment's id at its output offset, then carry forward
    pos = jnp.where(sel_counts > 0, offs, out_len)
    markers = jnp.full((out_len,), -1, jnp.int32).at[pos].max(seg_ids, mode="drop")
    seg_of_row = carry_last(markers)
    j = jnp.arange(out_len, dtype=jnp.int32)
    row_valid = (j < total) & (seg_of_row >= 0)
    safe_seg = jnp.maximum(seg_of_row, 0)
    elem_of_row = j - gather1d(offs, safe_seg)
    return safe_seg, elem_of_row, row_valid, total


def compact_mask_via_sort(mask: jnp.ndarray, payloads):
    """Stably move rows where mask is True to the front; returns (payloads', count).

    On this TPU generation a stable 1-key sort is far cheaper than a masked scatter of
    the same width, so compaction is expressed as a sort by (!mask).
    """
    key = (~mask).astype(jnp.int32)
    out = jax.lax.sort((key,) + tuple(payloads), num_keys=1, is_stable=True)
    return out[1:], jnp.sum(mask.astype(jnp.int32))


def compact_indices(mask: jnp.ndarray):
    """Row indices of True rows, front-compacted ascending; (idx, count).

    ONE unstable single-key sort of `where(mask, iota, INT_MAX)` — about half
    the comparator of the stable (!mask)-key-plus-payloads form (stability
    costs an implicit tiebreak key; ~4 ns/row/key on v5e), and no payload
    traffic. Rows past `count` hold INT_MAX; callers gather payloads at the
    compacted indices, which is cheap when the selected count is small."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, idx, jnp.iinfo(jnp.int32).max)
    out = jax.lax.sort((key,), num_keys=1, is_stable=False)[0]
    return out, jnp.sum(mask.astype(jnp.int32))


def next_start_pos(starts: jnp.ndarray) -> jnp.ndarray:
    """For each row, the position of the next run start strictly after it (n if none)."""
    n = starts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.where(starts, idx, n)
    at_or_after = jnp.flip(jax.lax.cummin(jnp.flip(pos)))
    return jnp.concatenate([at_or_after[1:], jnp.full((1,), n, jnp.int32)])


def run_reduce_sum(values: jnp.ndarray, starts: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Sum `values` over runs delimited by `starts`, masked by `valid`.

    Returns an array aligned with rows: each run-start row holds its run's sum
    (other rows hold garbage; mask with `starts`).
    """
    v = jnp.where(valid, values, 0)
    csum = jnp.cumsum(v)
    n = values.shape[0]
    before = jnp.concatenate([jnp.zeros((1,), v.dtype), csum[:-1]])
    nxt = next_start_pos(starts)
    total = csum[n - 1]
    end_prefix = jnp.where(nxt >= n, total, csum[jnp.clip(nxt - 1, 0, n - 1)])
    return end_prefix - before


def popcount32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
