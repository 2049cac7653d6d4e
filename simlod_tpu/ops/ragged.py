"""Bandwidth-optimal ragged segment gathers via aligned 128-lane row gathers.

The engine's dominant access pattern is "gather many variable-length CONTIGUOUS runs
from 1-D pool arrays" (point segments, voxel CSR ranges). Two TPU facts drive the
design (measured on v5e):

  1. XLA gathers cost ~6-7 ns per gathered ROW regardless of row width — so gather
     few, wide rows: view a 1-D pool as [P/128, 128] (free reshape; 1-D arrays have no
     lane padding) and fetch the aligned rows covering each segment.
  2. Arrays with a narrow trailing dimension are lane-padded to 128 in HBM (a [N,2]
     array allocates and moves 64x its logical bytes!) — so pools stay 1-D and
     multi-column data is gathered column-by-column SHARING one index computation.

Each segment lands in the output at the SAME phase (offset mod 128) it has in the
pool, so the copy is exact; the up-to-127 junk lanes before/after each segment are
masked via monotone carries (both region starts and ends are strictly increasing,
so plain cummax carries them — no per-row table gathers).

Effective cost: ~7 ns per 128 elements ≈ 0.05 ns/element/column.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .segments import carry_last, exclusive_cumsum

A = 128  # lanes per gathered row


class RaggedPlan(NamedTuple):
    """Shared index computation for gathering one set of segments."""
    src_row: jax.Array    # [WR] pool row index per output row
    r_ok: jax.Array       # [WR] row validity
    seg_of: jax.Array     # [W] segment id per output element (clamped >= 0)
    elem: jax.Array       # [W] element index within its segment
    valid: jax.Array      # [W] element validity
    mpos: jax.Array       # [S] scatter position of each segment's first element
                          # (out_len for empty segments); strictly increasing over
                          # the non-empty segments
    out_len: int


def plan(src_off: jax.Array, cnt: jax.Array, out_len: int) -> RaggedPlan:
    """Build the gather plan for segments (src_off[i], cnt[i]). out_len % 128 == 0."""
    assert out_len % A == 0
    S = src_off.shape[0]
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
    src_row = row0[sr] + (jr - row_offs[sr])          # small-table gathers (S entries)

    # Per-element fields in the [WR, A] ROW domain: no two segments share an
    # output row (row_offs is cumulative), so every element field is its row's
    # segment field + lane arithmetic. The previous formulation carried three
    # full-window cummaxes (seg/start/end markers); at multi-million-row render
    # windows those scans were ~1 ms each per plan while the whole gather moves
    # only ~0.05 ns/element — the row-domain gathers below are WR-sized.
    pstart_r = row_offs[sr] * A + phase[sr]      # [WR] segment start position
    pend_r = pstart_r + cnt[sr]
    j2 = jr[:, None] * A + jnp.arange(A, dtype=jnp.int32)[None, :]
    valid2 = r_ok[:, None] & (j2 >= pstart_r[:, None]) & (j2 < pend_r[:, None])
    elem2 = j2 - pstart_r[:, None]
    seg_of = jnp.broadcast_to(sr[:, None], (WR, A)).reshape(out_len)
    mpos = jnp.where(nz, row_offs * A + phase, out_len)
    return RaggedPlan(src_row=src_row, r_ok=r_ok, seg_of=seg_of,
                      elem=elem2.reshape(out_len), valid=valid2.reshape(out_len),
                      mpos=mpos, out_len=out_len)


def gather_column(p: RaggedPlan, src: jax.Array) -> jax.Array:
    """Gather one 1-D pool column through the plan -> [out_len] 1-D output."""
    assert src.ndim == 1 and src.shape[0] % A == 0
    src128 = src.reshape(-1, A)
    rows = src128[jnp.where(p.r_ok, p.src_row, src128.shape[0] - 1)]
    return rows.reshape(p.out_len)


def broadcast_i32(p: RaggedPlan, vals: jax.Array) -> jax.Array:
    """Broadcast one per-segment int32 value to every output element of the segment.

    out[j] == vals[p.seg_of[j]] for valid rows, but at cumsum cost instead of gather
    cost: an element gather over the window runs at ~7 ns/row on v5e while cumsum is
    ~0.06 ns/row (see docs/PERFORMANCE.md), so the per-segment DELTA is scattered at
    the segment's first output position (p.mpos, strictly increasing over non-empty
    segments) and one prefix sum telescopes it to the whole window — the same trick
    route() uses for its boundary carry. int32 only (wrap-around addition is exact).
    """
    assert vals.dtype == jnp.int32
    S = vals.shape[0]
    nz = p.mpos < p.out_len
    # previous non-empty segment's value (0 before the first), via a small [S]
    # index carry + gather — S is the segment-window size, not the element window
    idx = jnp.arange(S, dtype=jnp.int32)
    last_nz_at_or_before = jax.lax.cummax(jnp.where(nz, idx, -1))
    prev_idx = jnp.roll(last_nz_at_or_before, 1).at[0].set(-1)
    prev = jnp.where(prev_idx >= 0, vals[jnp.maximum(prev_idx, 0)], 0)
    delta = jnp.where(nz, vals - prev, 0)
    acc = jnp.zeros((p.out_len,), jnp.int32).at[p.mpos].add(delta, mode="drop")
    return jnp.cumsum(acc)


def window_for(total_points: int, max_segments: int) -> int:
    """Static output window: every segment may add up to 2(A-1) phase-padding rows."""
    w = total_points + max_segments * 2 * A + A
    return ((w + A - 1) // A) * A
