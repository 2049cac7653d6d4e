"""Incremental octree construction — the TPU-native `kernel_construct`.

Reference behavior being reproduced (progressive_octree_voxels.cu):
  - addBatch():700 runs per batch: expand() {doCounting():124 + doSplitting():308},
    voxelSampling():417, allocate+insert points/voxels (:485-697).
  - A leaf splits when its persistent `counter` crosses MAX_POINTS_PER_NODE during
    counting (:210-218); its stored points redistribute into 8 freshly created children
    (:317-343), and the split cascades (expand iterates, :385-414).
  - Every point samples one voxel cell (128^3) in every inner node on its root->leaf
    path, first-come-first-serve per cell (:50-119).

TPU-native design (none of this is a translation — the data movement is completely
different):
  - Routing points to leaves uses ONE multi-key sort instead of per-point pointer
    descent: active-leaf Morton interval starts are merged with the batch's Morton
    codes; after the sort every point's leaf is the nearest preceding boundary row.
    (Measured on TPU v5e: a 3-key sort is ~5x cheaper than one full-width gather pass,
    and descent would need `depth` gather passes.)
  - Splits NEVER move points. A stored segment is Morton-sorted, so a split is pure
    directory surgery: the segment's 8 child sub-ranges are found by octant run
    boundaries and become 8 child segments pointing into the same pool rows. The split
    node's points are gathered once, solely to voxel-sample the newly inner node
    (the reference re-inserts and re-counts all spilled points instead, :253-289).
  - Voxel first-come dedup is lazy: candidates are deduplicated within the batch by
    sorted-adjacency (equal cells are adjacent in Morton order), appended raw, and
    duplicates across steps are removed by periodic compaction of the (node, cell)
    sorted voxel store (first arrival wins — same winner set as the reference's
    atomicOr race, but deterministic).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import EngineConfig
from ..ops import morton
from ..ops.segments import (carry_last, compact_mask_via_sort, exclusive_cumsum,
                            popcount32, run_reduce_sum, run_starts)
from ..ops.fastops import gather1d
from ..ops import ragged
from .structures import OctreeState

I32_MAX = jnp.iinfo(jnp.int32).max


class Work(NamedTuple):
    """The routed, Morton-sorted working batch."""
    x: jax.Array        # [B] f32
    y: jax.Array
    z: jax.Array
    rgba: jax.Array     # [B] u32
    qx: jax.Array       # [B] i32 quantized (28-bit)
    qy: jax.Array
    qz: jax.Array
    leaf: jax.Array     # [B] i32 current target leaf
    lvl: jax.Array      # [B] i32 leaf level
    count: jax.Array    # i32 scalar: rows [0, count) are valid


def _point_keys(qx, qy, qz, valid):
    w0, w1, w2 = morton.encode(qx, qy, qz)
    k2 = (w2 << 1) | 1  # low flag bit: points sort after equal-key leaf boundaries
    mx = jnp.int32(I32_MAX)
    return (jnp.where(valid, w0, mx), jnp.where(valid, w1, mx),
            jnp.where(valid, k2, mx))


def _leaf_boundary_keys(state: OctreeState):
    """Morton interval-start keys for active leaves (others pushed to +inf)."""
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    lvl = state.level
    shift = C.FULL_GRID_BITS - lvl
    qx, qy, qz = state.nx << shift, state.ny << shift, state.nz << shift
    w0, w1, w2 = morton.encode(qx, qy, qz)
    k2 = w2 << 1  # flag bit 0: boundaries before equal-key points
    is_lb = (state.child_base < 0) & (ids < state.num_nodes)
    mx = jnp.int32(I32_MAX)
    return (jnp.where(is_lb, w0, mx), jnp.where(is_lb, w1, mx),
            jnp.where(is_lb, k2, mx), is_lb)


def route(state: OctreeState, x: jax.Array, y: jax.Array, z: jax.Array,
          rgba: jax.Array, count: jax.Array) -> Work:
    """Sort the batch by Morton code and assign each point its current leaf.

    Replaces the reference's per-point root->leaf pointer traversal
    (progressive_octree_voxels.cu:169-187) with a single merge-sort against the
    active-leaf Morton boundary table.
    """
    B = x.shape[0]
    qx, qy, qz = morton.quantize_cols(x, y, z, state.box_min, state.cube_size)
    valid = jnp.arange(B, dtype=jnp.int32) < count
    pk0, pk1, pk2 = _point_keys(qx, qy, qz, valid)

    bk0, bk1, bk2, is_lb = _leaf_boundary_keys(state)
    n_cap = bk0.shape[0]

    # Sorted leaf directory (the boundary rows of the merge, in order).
    lvl_pack = jnp.where(is_lb, state.level, 0)
    pack = jnp.arange(n_cap, dtype=jnp.int32) * 32 + lvl_pack
    sorted_pack = jax.lax.sort((bk0, bk1, bk2, pack), num_keys=3)[3]

    # Merge: concat points + boundaries, sort, carry boundary ordinal forward.
    k0 = jnp.concatenate([pk0, bk0])
    k1 = jnp.concatenate([pk1, bk1])
    k2 = jnp.concatenate([pk2, bk2])
    typ = jnp.concatenate([
        jnp.where(valid, jnp.int32(1), jnp.int32(2)),
        jnp.where(is_lb, jnp.int32(0), jnp.int32(2)),
    ])
    zf = jnp.zeros((n_cap,), jnp.float32)
    zu = jnp.zeros((n_cap,), jnp.uint32)
    sk0, sk1, sk2, styp, sx, sy, sz, sc = jax.lax.sort(
        (k0, k1, k2, typ,
         jnp.concatenate([x, zf]), jnp.concatenate([y, zf]),
         jnp.concatenate([z, zf]), jnp.concatenate([rgba, zu])),
        num_keys=3, is_stable=False)

    is_b = styp == 0
    bidx = jnp.cumsum(is_b.astype(jnp.int32)) - 1
    row_pack = sorted_pack[jnp.clip(bidx, 0, n_cap - 1)]

    # Compact the point rows back to a dense [B] batch (stable; Morton order kept).
    (cx, cy, cz, cc, cpack), _ = compact_mask_via_sort(
        styp == 1, (sx, sy, sz, sc, row_pack))
    cx, cy, cz, cc, cpack = cx[:B], cy[:B], cz[:B], cc[:B], cpack[:B]
    cqx, cqy, cqz = morton.quantize_cols(cx, cy, cz, state.box_min, state.cube_size)
    return Work(x=cx, y=cy, z=cz, rgba=cc, qx=cqx, qy=cqy, qz=cqz,
                leaf=cpack >> 5, lvl=cpack & 31, count=count)


def _batch_run_counts(state: OctreeState, work: Work, run_window: int = 1 << 17):
    """Per-leaf counts of the current batch assignment, as a dense [node_cap] array.

    Run-start rows are compacted with one sort before the scatter — a full-width
    masked scatter costs ~20 ns per ATTEMPTED row."""
    B = work.leaf.shape[0]
    valid = jnp.arange(B, dtype=jnp.int32) < work.count
    starts = run_starts(work.leaf, valid)
    sums = run_reduce_sum(jnp.ones((B,), jnp.int32), starts, valid)
    n_cap = state.child_base.shape[0]
    rw = min(run_window, B)
    (r_leaf, r_sum), n_runs = compact_mask_via_sort(
        starts & valid, (work.leaf, sums))
    r_leaf = r_leaf[:rw]
    r_sum = r_sum[:rw]
    ok = jnp.arange(rw, dtype=jnp.int32) < n_runs
    return jnp.zeros((n_cap,), jnp.int32).at[
        jnp.where(ok, r_leaf, n_cap)].add(jnp.where(ok, r_sum, 0), mode="drop")


def _append_voxels(cfg: EngineConfig, state: OctreeState, node, cell, rgba,
                   emit_mask, count_window: int | None = None):
    """Append candidate voxels (possibly duplicating existing cells; lazy dedup).

    Emitted rows are first compacted to the front with one stable sort, then written
    with contiguous dynamic-update-slices — random scatters cost ~20 ns per ATTEMPTED
    row (mask or not), while sort+DUS is ~6x cheaper at these widths.
    """
    # watermark never exceeds the LOGICAL capacity; the physical arrays are padded
    # by the largest append window (structures._cand_capacity), so the full-window
    # dynamic-update-slice below always stays in bounds with start == vox_used.
    # Rows past n_new inside the window are garbage beyond the watermark and are
    # overwritten by later appends.
    (cnode, ccell, crgba), n_emit = compact_mask_via_sort(
        emit_mask, (node, cell, jax.lax.bitcast_convert_type(rgba, jnp.int32)))
    room = jnp.maximum(cfg.voxel_capacity - state.vox_used, 0)
    n_new = jnp.minimum(n_emit, room)
    start = state.vox_used
    state.vox_node = jax.lax.dynamic_update_slice(state.vox_node, cnode, (start,))
    state.vox_cell = jax.lax.dynamic_update_slice(state.vox_cell, ccell, (start,))
    state.vox_rgba = jax.lax.dynamic_update_slice(
        state.vox_rgba, jax.lax.bitcast_convert_type(crgba, jnp.uint32), (start,))
    state.vox_used = state.vox_used + n_new
    state.mem_capacity_reached = state.mem_capacity_reached | (n_emit > room)
    # approximate per-node voxel counts (corrected exactly at the next compaction);
    # counting from a bounded slice of the compacted window keeps the scatter cheap —
    # candidates beyond the slice are duplicate-heavy tails whose counts compaction
    # fixes anyway
    n_cap = state.child_base.shape[0]
    cw = min(count_window or cnode.shape[0], cnode.shape[0])
    rowi = jnp.arange(cw, dtype=jnp.int32)
    state.num_voxels = state.num_voxels.at[
        jnp.where(rowi < n_new, cnode[:cw], n_cap)].add(1, mode="drop")
    return state


def _split_round(cfg: EngineConfig, state: OctreeState, work: Work):
    """One split-loop round: pick over-capacity leaves, create children, re-route.

    Mirrors one expand() iteration of the reference (voxels.cu:385-414) except points
    never move: stored segments are subdivided in the directory, and split nodes'
    points are gathered once only to voxel-sample the newly inner node.
    """
    n_cap = state.child_base.shape[0]
    B = work.leaf.shape[0]
    K = cfg.max_splits_per_round
    valid = jnp.arange(B, dtype=jnp.int32) < work.count

    # --- selection ---
    counts_now = _batch_run_counts(state, work, cfg.run_window)
    counter_eff = state.counter + counts_now
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    over = ((ids < state.num_nodes) & (state.child_base < 0)
            & (counter_eff > cfg.max_points_per_node)
            & (state.level < cfg.max_depth))
    rank = jnp.cumsum(over.astype(jnp.int32))          # inclusive
    pts = jnp.where(over, state.num_points, 0)
    pts_ex = exclusive_cumsum(pts)
    segs = jnp.where(over, state.node_seg_count, 0)
    segs_ex = exclusive_cumsum(segs)
    node_room = (state.num_nodes + 8 * rank) <= n_cap
    take = (over & (rank <= K) & (pts_ex + pts <= cfg.spill_capacity)
            & (segs_ex + segs <= cfg.seg_select_cap) & node_room)
    n_take = jnp.sum(take.astype(jnp.int32))
    state.mem_capacity_reached = state.mem_capacity_reached | jnp.any(over & ~node_room)

    trank = jnp.cumsum(take.astype(jnp.int32)) - 1
    tids = jnp.full((K,), -1, jnp.int32).at[
        jnp.where(take, trank, K)].set(ids, mode="drop")
    tv = tids >= 0
    tsafe = jnp.maximum(tids, 0)

    # --- create 8 children per taken node (contiguous block: child_base trick) ---
    base = state.num_nodes + 8 * jnp.arange(K, dtype=jnp.int32)
    plvl = state.level[tsafe]
    pnx, pny, pnz = state.nx[tsafe], state.ny[tsafe], state.nz[tsafe]
    octs = jnp.arange(8, dtype=jnp.int32)
    ox, oy, oz = (octs >> 2) & 1, (octs >> 1) & 1, octs & 1
    cid = jnp.where(tv[:, None], base[:, None] + octs[None, :], n_cap).reshape(-1)
    rep = lambda a: jnp.repeat(a, 8)
    state.parent = state.parent.at[cid].set(rep(tids), mode="drop")
    state.level = state.level.at[cid].set(rep(plvl + 1), mode="drop")
    state.nx = state.nx.at[cid].set((2 * pnx[:, None] + ox).reshape(-1), mode="drop")
    state.ny = state.ny.at[cid].set((2 * pny[:, None] + oy).reshape(-1), mode="drop")
    state.nz = state.nz.at[cid].set((2 * pnz[:, None] + oz).reshape(-1), mode="drop")
    state.counter = state.counter.at[cid].set(0, mode="drop")
    state.num_points = state.num_points.at[cid].set(0, mode="drop")
    state.num_voxels = state.num_voxels.at[cid].set(0, mode="drop")
    # ancestor rows: copy parent's row up to parent level, self afterwards
    cols = jnp.arange(C.MAX_DEPTH + 1, dtype=jnp.int32)
    L = C.MAX_DEPTH + 1
    panc = state.anc[(tsafe[:, None] * L + cols[None, :]).reshape(-1)].reshape(-1, L)
    crow = jnp.where(cols[None, None, :] <= plvl[:, None, None],
                     panc[:, None, :],
                     (base[:, None] + octs[None, :])[:, :, None])
    n_anc = state.anc.shape[0]
    anc_idx = jnp.where(cid[:, None] < n_cap, cid[:, None] * L + cols[None, :], n_anc)
    state.anc = state.anc.at[anc_idx.reshape(-1)].set(
        crow.reshape(-1), mode="drop")
    state.child_base = state.child_base.at[
        jnp.where(tv, tsafe, n_cap)].set(base, mode="drop")
    state.num_nodes = state.num_nodes + 8 * n_take

    # --- gather stored points of split nodes (voxel sampling + sub-segmenting) ---
    # Cascade rounds split freshly created children that hold no stored points; the
    # whole spill pipeline (segment scan, ragged gather, candidate sampling, directory
    # surgery) is skipped under a cond in that common case.
    total_spill = jnp.sum(jnp.where(take, state.num_points, 0))

    just = jnp.zeros((n_cap,), jnp.bool_).at[
        jnp.where(tv, tsafe, n_cap)].set(True, mode="drop")

    def spill_block(state):
        s_cap = state.seg_node.shape[0]
        s_sel = (state.seg_cnt > 0) & (state.seg_node >= 0) & \
            just[jnp.clip(state.seg_node, 0, n_cap - 1)]
        SS = cfg.seg_select_cap  # selected-segment window (selection respects this budget)
        (sel_full,), n_sel = compact_mask_via_sort(
            s_sel, (jnp.arange(s_cap, dtype=jnp.int32),))
        state.mem_capacity_reached = state.mem_capacity_reached | (n_sel > SS)
        sv = jnp.arange(SS, dtype=jnp.int32) < n_sel
        ssafe = jnp.where(sv, sel_full[:SS], 0)
        scnt = jnp.where(sv, state.seg_cnt[ssafe], 0)
        soff = state.seg_off[ssafe]
        snode = jnp.where(sv, state.seg_node[ssafe], 0)
        snlvl = state.level[snode]

        SPW = ragged.window_for(cfg.spill_capacity, SS)
        rplan = ragged.plan(soff, scnt, SPW)
        segrow, elem, rvalid = rplan.seg_of, rplan.elem, rplan.valid
        # guard: a window overflow would silently drop whole segments
        state.mem_capacity_reached = state.mem_capacity_reached | (
            jnp.sum(rvalid.astype(jnp.int32)) != jnp.sum(scnt))
        gx = ragged.gather_column(rplan, state.pt_x)
        gy = ragged.gather_column(rplan, state.pt_y)
        gz = ragged.gather_column(rplan, state.pt_z)
        gc = jax.lax.bitcast_convert_type(
            ragged.gather_column(rplan, jax.lax.bitcast_convert_type(
                state.pt_rgba, jnp.float32)), jnp.uint32)
        gnode = snode[segrow]
        glvl = snlvl[segrow]
        gqx, gqy, gqz = morton.quantize_cols(gx, gy, gz, state.box_min,
                                             state.cube_size)

        # voxel candidates of the newly inner node, first-in-cell within each segment.
        # NOTE: a segment's first VALID row is elem == 0 — junk alignment rows before
        # it carry arbitrary pool data, so adjacent-compare alone is not a safe
        # boundary test there.
        pfx, pfy, pfz = morton.prefix_at_level(gqx, gqy, gqz, glvl)
        seg_first = rvalid & (elem == 0)
        cell_changed = ((pfx != jnp.roll(pfx, 1)) | (pfy != jnp.roll(pfy, 1))
                        | (pfz != jnp.roll(pfz, 1)))
        first_cell = rvalid & (seg_first | cell_changed)
        cell = morton.cell_at_level(gqx, gqy, gqz, glvl)
        state = _append_voxels(cfg, state, gnode, cell, gc, first_cell,
                               count_window=cfg.step_points)

        # sub-segment surgery: runs of (segment, octant) become child segments
        goct = morton.octant_at_level(gqx, gqy, gqz, glvl)
        oct_changed = goct != jnp.roll(goct, 1)
        srun = rvalid & (seg_first | oct_changed)
        runlen = run_reduce_sum(jnp.ones((SPW,), jnp.int32), srun, rvalid)
        child_of_row = state.child_base[gnode] + goct
        # compact the run rows (<= 8 per subdivided segment) so directory writes and
        # count updates scatter a small window instead of the whole spill window
        RUNW = 8 * SS
        (r_child, r_off, r_len), n_runs_all = compact_mask_via_sort(
            srun, (child_of_row, soff[segrow] + elem, runlen))
        r_child, r_off, r_len = r_child[:RUNW], r_off[:RUNW], r_len[:RUNW]
        rok = jnp.arange(RUNW, dtype=jnp.int32) < n_runs_all
        npos = state.num_segments + jnp.arange(RUNW, dtype=jnp.int32)
        fit = rok & (npos < s_cap)
        widx = jnp.where(fit, npos, s_cap)
        state.seg_node = state.seg_node.at[widx].set(r_child, mode="drop")
        state.seg_off = state.seg_off.at[widx].set(r_off, mode="drop")
        state.seg_cnt = state.seg_cnt.at[widx].set(r_len, mode="drop")
        n_runs = jnp.sum(fit.astype(jnp.int32))
        state.num_segments = state.num_segments + n_runs
        state.mem_capacity_reached = state.mem_capacity_reached | (n_runs_all > n_runs)
        # inherited counts: children take over the stored points they now own
        addi = jnp.where(fit, r_child, n_cap)
        addv = jnp.where(fit, r_len, 0)
        state.counter = state.counter.at[addi].add(addv, mode="drop")
        state.num_points = state.num_points.at[addi].add(addv, mode="drop")
        state.node_seg_count = state.node_seg_count.at[addi].add(
            jnp.where(fit, 1, 0), mode="drop")

        # kill the split nodes' old segments; zero their stored-point counts
        state.seg_cnt = state.seg_cnt.at[
            jnp.where(sv, ssafe, s_cap)].set(0, mode="drop")
        state.num_points = state.num_points.at[
            jnp.where(tv, tsafe, n_cap)].set(0, mode="drop")
        state.node_seg_count = state.node_seg_count.at[
            jnp.where(tv, tsafe, n_cap)].set(0, mode="drop")

        return state

    state = jax.lax.cond(total_spill > 0, spill_block, lambda st: st, state)

    # --- re-route batch rows whose leaf just split (one level down) ---
    # one fused lookup: cb_if_just[n] = child_base if the node split this round else -1
    cb_if_just = jnp.where(just, state.child_base, -1)
    lsafe = jnp.clip(work.leaf, 0, n_cap - 1)
    cb = cb_if_just[lsafe]
    aff = valid & (cb >= 0)
    new_leaf = jnp.where(
        aff, cb + morton.octant_at_level(work.qx, work.qy, work.qz, work.lvl),
        work.leaf)
    new_lvl = work.lvl + aff.astype(jnp.int32)
    work = work._replace(leaf=new_leaf, lvl=new_lvl)
    return state, work, n_take


def split_loop(cfg: EngineConfig, state: OctreeState, work: Work):
    """Iterate split rounds until no leaf is over capacity (reference expand())."""

    def cond(carry):
        state, work, n_take, rounds = carry
        return (n_take > 0) & (rounds < cfg.split_rounds)

    def body(carry):
        state, work, _n, rounds = carry
        state, work, n_take = _split_round(cfg, state, work)
        return state, work, n_take, rounds + 1

    # derive loop scalars from work.count so their sharding/varying type matches the
    # loop body's outputs under shard_map (vma typing)
    one = jnp.ones_like(work.count)
    state, work, _, _ = jax.lax.while_loop(
        cond, body, (state, work, one, jnp.zeros_like(work.count)))
    return state, work


def batch_voxel_candidates(cfg: EngineConfig, state: OctreeState, work: Work):
    """Emit the batch's first-in-cell voxel candidates for every inner ancestor level.

    Equivalent to the reference's voxelSampling() descent with per-node occupancy
    bitmasks (voxels.cu:417-484): sampled levels are 0..leaf_level-1, plus level 0 when
    the root is still a leaf (the root owns a sampling grid from reset, reset.cu:69).

    All per-candidate source lookups ride ONE packed row gather ([B,8] table), since
    row gathers cost the same as element gathers per row on this hardware.
    """
    B = work.leaf.shape[0]
    valid = jnp.arange(B, dtype=jnp.int32) < work.count
    nlev = jnp.maximum(work.lvl, 1)

    # levels above the tree's current max depth can't emit; bound both level loops
    # dynamically (MAX_DEPTH=20 static iterations would triple the pass count)
    n_cap_ids = jnp.arange(state.level.shape[0], dtype=jnp.int32)
    max_lvl = jnp.max(jnp.where(n_cap_ids < state.num_nodes, state.level, 0))

    rowi = jnp.arange(B, dtype=jnp.int32)

    def emit_level(l, bitmask):
        shift = (C.MAX_DEPTH + 1) - l
        px, py, pz = work.qx >> shift, work.qy >> shift, work.qz >> shift
        changed = ((px != jnp.roll(px, 1)) | (py != jnp.roll(py, 1))
                   | (pz != jnp.roll(pz, 1)) | (rowi == 0))
        emit = (l < nlev) & changed & valid
        return bitmask | (emit.astype(jnp.uint32) << l)

    # carry init derived from batch data so its varying-axes type matches the body
    # under shard_map (same vma rule as split_loop's scalars)
    bitmask = jax.lax.fori_loop(0, jnp.maximum(max_lvl, 1),
                                emit_level,
                                (work.qx ^ work.qx).astype(jnp.uint32))
    cnt = popcount32(bitmask)

    CC = cfg.candidate_factor * B  # candidate window
    offs = exclusive_cumsum(cnt)
    total = jnp.sum(cnt)
    drop_tail = total > CC  # overflow: tail candidates dropped (voxels appear later)
    src_mark = jnp.full((CC,), -1, jnp.int32).at[
        jnp.where(cnt > 0, jnp.minimum(offs, CC), CC)].max(rowi, mode="drop")
    carried = carry_last(src_mark)
    src = jnp.maximum(carried, 0)
    j = jnp.arange(CC, dtype=jnp.int32)
    jvalid = (j < jnp.minimum(total, CC)) & (carried >= 0)

    # one row gather for all source columns: qx,qy,qz,leaf,rgba,bitmask,offs
    table = jnp.stack([
        work.qx, work.qy, work.qz, work.leaf,
        jax.lax.bitcast_convert_type(work.rgba, jnp.int32).astype(jnp.int32),
        bitmask.astype(jnp.int32), offs, cnt], axis=-1)
    srow = table[src]
    sqx, sqy, sqz = srow[:, 0], srow[:, 1], srow[:, 2]
    sleaf = srow[:, 3]
    color = jax.lax.bitcast_convert_type(srow[:, 4], jnp.uint32)
    bm = srow[:, 5].astype(jnp.uint32)
    k = j - srow[:, 6]

    def pick_level(l, carry):
        lvl_out, cum = carry
        bit = ((bm >> l) & 1).astype(jnp.int32)
        hit = (bit == 1) & (cum == k)
        return jnp.where(hit, l, lvl_out), cum + bit

    zero_cc = (bm ^ bm).astype(jnp.int32)
    lvl_out, _ = jax.lax.fori_loop(
        0, jnp.maximum(max_lvl, 1), pick_level, (zero_cc, zero_cc))

    cell = morton.cell_at_level(sqx, sqy, sqz, lvl_out)
    node = gather1d(state.anc, sleaf * (C.MAX_DEPTH + 1) + lvl_out)
    state = _append_voxels(cfg, state, node, cell, color, jvalid,
                           count_window=cfg.step_points)
    state.mem_capacity_reached = state.mem_capacity_reached | drop_tail
    return state


def insert_points(cfg: EngineConfig, state: OctreeState, work: Work):
    """Bulk-append the routed batch to the point pool and register leaf segments.

    Replaces the reference's allocatePointChunks()+insertPoints() chunk walking
    (voxels.cu:485-640) with one contiguous pool write (the batch is Morton-sorted, so
    each leaf's contribution is a contiguous run = one segment). Segment-directory and
    per-leaf count updates compact the (few) run-start rows into a small window first —
    a full-width masked scatter costs like the full width on TPU.
    """
    B = work.leaf.shape[0]
    n_cap = state.child_base.shape[0]
    s_cap = state.seg_node.shape[0]
    rowi = jnp.arange(B, dtype=jnp.int32)

    room = jnp.maximum(cfg.point_capacity - state.pool_used, 0)
    new_count = jnp.minimum(work.count, room)
    valid = rowi < new_count
    dropped = work.count - new_count
    state.mem_capacity_reached = state.mem_capacity_reached | (dropped > 0)

    # pool append (one dynamic-update-slice; rows past new_count are garbage beyond
    # the watermark and are overwritten by later appends)
    dus = jax.lax.dynamic_update_slice
    state.pt_x = dus(state.pt_x, work.x, (state.pool_used,))
    state.pt_y = dus(state.pt_y, work.y, (state.pool_used,))
    state.pt_z = dus(state.pt_z, work.z, (state.pool_used,))
    state.pt_rgba = dus(state.pt_rgba, work.rgba, (state.pool_used,))

    # segments: one per leaf run; compact run-start rows via one sort (full-width
    # masked scatters cost ~20 ns per attempted row)
    starts = run_starts(work.leaf, valid)
    sums = run_reduce_sum(jnp.ones((B,), jnp.int32), starts, valid)
    RW = min(cfg.run_window, B)
    (c_leaf, c_off, c_cnt), n_runs_total = compact_mask_via_sort(
        starts, (work.leaf, state.pool_used + rowi, sums))
    r_leaf, r_off, r_cnt = c_leaf[:RW], c_off[:RW], c_cnt[:RW]
    rvalid = jnp.arange(RW, dtype=jnp.int32) < n_runs_total
    state.mem_capacity_reached = state.mem_capacity_reached | (n_runs_total > RW)

    pos = state.num_segments + jnp.arange(RW, dtype=jnp.int32)
    fit = rvalid & (pos < s_cap)
    sidx = jnp.where(fit, pos, s_cap)
    state.seg_node = state.seg_node.at[sidx].set(r_leaf, mode="drop")
    state.seg_off = state.seg_off.at[sidx].set(r_off, mode="drop")
    state.seg_cnt = state.seg_cnt.at[sidx].set(r_cnt, mode="drop")
    n_segs = jnp.sum(fit.astype(jnp.int32))
    state.num_segments = state.num_segments + n_segs
    state.mem_capacity_reached = state.mem_capacity_reached | jnp.any(rvalid & ~fit)

    # per-leaf bookkeeping from the compacted run window
    addi = jnp.where(fit, r_leaf, n_cap)
    addv = jnp.where(fit, r_cnt, 0)
    state.num_points = state.num_points.at[addi].add(addv, mode="drop")
    state.counter = state.counter.at[addi].add(addv, mode="drop")
    state.node_seg_count = state.node_seg_count.at[addi].add(
        jnp.where(fit, 1, 0), mode="drop")

    state.pool_used = state.pool_used + new_count
    state.num_points_processed = state.num_points_processed + new_count
    state.num_points_dropped = state.num_points_dropped + dropped
    return state


def build_step_impl(cfg: EngineConfig, state: OctreeState, x: jax.Array,
                    y: jax.Array, z: jax.Array, rgba: jax.Array,
                    count: jax.Array) -> OctreeState:
    """Ingest one batch: route -> split loop -> voxel sampling -> insert.

    Coordinates arrive as three 1-D columns (a [B,3] device array would lane-pad
    32x in HBM). The whole step is one fused jit program — the TPU analogue of one
    cooperative kernel_construct launch (XLA op boundaries are the grid.sync()s).
    """
    work = route(state, x, y, z, rgba, count)
    state, work = split_loop(cfg, state, work)
    state = batch_voxel_candidates(cfg, state, work)
    state = insert_points(cfg, state, work)
    return state


build_step = functools.partial(jax.jit, static_argnums=0,
                               donate_argnums=1)(build_step_impl)


def build_many_impl(cfg: EngineConfig, state: OctreeState, x_batches: jax.Array,
                    y_batches: jax.Array, z_batches: jax.Array,
                    rgba_batches: jax.Array, counts: jax.Array) -> OctreeState:
    """Ingest K batches in one program via lax.scan (pipelined ingest).

    The reference keeps its device busy by re-launching kernel_construct per frame
    against a pre-uploaded ring (main_progressive_octree.cpp:364-399); the XLA
    equivalent is scanning the step over device-resident batches, which removes all
    host round-trips between steps.
    """

    def body(st, inp):
        bx, by, bz, bc, n = inp
        return build_step_impl(cfg, st, bx, by, bz, bc, n), None

    state, _ = jax.lax.scan(
        body, state, (x_batches, y_batches, z_batches, rgba_batches, counts))
    return state


build_many = functools.partial(jax.jit, static_argnums=0,
                               donate_argnums=1)(build_many_impl)


def compact_voxels_impl(cfg: EngineConfig, state: OctreeState) -> OctreeState:
    """Sort the voxel store by (node, cell), drop duplicate cells (first arrival wins),
    and rebuild the per-node CSR directory + exact per-node voxel counts.

    This realizes the reference's first-come occupancy semantics
    (progressive_octree_voxels.cu:93-119) lazily and deterministically.
    """
    v_cap = state.vox_node.shape[0]
    n_cap = state.child_base.shape[0]
    rows = jnp.arange(v_cap, dtype=jnp.int32)
    valid = rows < state.vox_used
    nkey = jnp.where(valid, state.vox_node, jnp.int32(I32_MAX))
    snode, scell, srgba = jax.lax.sort(
        (nkey, state.vox_cell, state.vox_rgba), num_keys=2, is_stable=True)
    svalid = rows < state.vox_used
    uniq = svalid & ((snode != jnp.roll(snode, 1)) | (scell != jnp.roll(scell, 1))
                     | (rows == 0))
    (cnode, ccell, crgba), n_uniq = compact_mask_via_sort(uniq, (snode, scell, srgba))

    cvalid = rows < n_uniq
    state.vox_node = jnp.where(cvalid, cnode, 0)
    state.vox_cell = jnp.where(cvalid, ccell, 0)
    state.vox_rgba = jnp.where(cvalid, crgba, jnp.uint32(0))
    state.vox_used = n_uniq
    state.vox_compacted = n_uniq

    # exact per-node counts + CSR offsets
    nstart = run_starts(cnode, cvalid)
    csum = run_reduce_sum(jnp.ones((v_cap,), jnp.int32), nstart, cvalid)
    counts = jnp.zeros((n_cap + 1,), jnp.int32).at[
        jnp.where(nstart & cvalid, cnode, n_cap + 1)].set(csum, mode="drop")
    state.num_voxels = counts[:n_cap]
    state.vox_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:n_cap])])
    return state


def compact_segments_impl(cfg: EngineConfig, state: OctreeState) -> OctreeState:
    """Drop dead (split-killed) segment directory entries."""
    s_cap = state.seg_node.shape[0]
    rows = jnp.arange(s_cap, dtype=jnp.int32)
    alive = (rows < state.num_segments) & (state.seg_cnt > 0)
    (n, o, c), n_alive = compact_mask_via_sort(
        alive, (state.seg_node, state.seg_off, state.seg_cnt))
    keep = rows < n_alive
    state.seg_node = jnp.where(keep, n, -1)
    state.seg_off = jnp.where(keep, o, 0)
    state.seg_cnt = jnp.where(keep, c, 0)
    state.num_segments = n_alive
    return state


@functools.partial(jax.jit, static_argnums=(0, 2), donate_argnums=1)
def _compact_voxels_window(cfg: EngineConfig, state: OctreeState, w: int):
    """Windowed compaction: sort/dedup only the first `w` rows (w >= vox_used).

    The full store capacity can be 10-50x the live size; sorting only a power-of-two
    window around the watermark keeps compaction cost proportional to actual content.
    """
    n_cap = state.child_base.shape[0]
    rows = jnp.arange(w, dtype=jnp.int32)
    valid = rows < state.vox_used
    nkey = jnp.where(valid, state.vox_node[:w], jnp.int32(I32_MAX))
    snode, scell, srgba = jax.lax.sort(
        (nkey, state.vox_cell[:w], state.vox_rgba[:w]), num_keys=2, is_stable=True)
    uniq = valid & ((snode != jnp.roll(snode, 1)) | (scell != jnp.roll(scell, 1))
                    | (rows == 0))
    (cnode, ccell, crgba), n_uniq = compact_mask_via_sort(uniq, (snode, scell, srgba))
    cvalid = rows < n_uniq
    cnode = jnp.where(cvalid, cnode, 0)
    state.vox_node = jax.lax.dynamic_update_slice(state.vox_node, cnode, (0,))
    state.vox_cell = jax.lax.dynamic_update_slice(
        state.vox_cell, jnp.where(cvalid, ccell, 0), (0,))
    state.vox_rgba = jax.lax.dynamic_update_slice(
        state.vox_rgba, jnp.where(cvalid, crgba, jnp.uint32(0)), (0,))
    state.vox_used = n_uniq
    state.vox_compacted = n_uniq

    nstart = run_starts(cnode, cvalid)
    csum = run_reduce_sum(jnp.ones((w,), jnp.int32), nstart, cvalid)
    counts = jnp.zeros((n_cap + 1,), jnp.int32).at[
        jnp.where(nstart & cvalid, cnode, n_cap + 1)].set(csum, mode="drop")
    state.num_voxels = counts[:n_cap]
    state.vox_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:n_cap])])
    return state


def compact_voxels_auto(cfg: EngineConfig, state: OctreeState) -> OctreeState:
    """Host-driven compaction sized to the live store (power-of-two window buckets,
    so at most log2 variants ever compile)."""
    used = int(state.vox_used)
    v_cap = state.vox_node.shape[0]
    w = 1 << max(10, (max(used, 1) - 1).bit_length())
    w = min(w, v_cap)
    return _compact_voxels_window(cfg, state, w)


compact_voxels = functools.partial(jax.jit, static_argnums=0,
                                   donate_argnums=1)(compact_voxels_impl)
compact_segments = functools.partial(jax.jit, static_argnums=0,
                                     donate_argnums=1)(compact_segments_impl)
