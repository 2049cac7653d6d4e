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
  - Routing points to leaves uses ONE stable 2-key merge sort against a PERSISTENT
    sorted leaf-boundary directory (state.b_key0/b_key1/b_pack): after the sort every
    point's leaf is carried from the nearest preceding boundary row with a log-depth
    take-last scan. The directory holds one row per leaf (plus stale rows from splits;
    a stale parent's key equals its child 0's key and sorts before it, so the stale
    row is never the carried winner). The reference instead pointer-descends every
    point every phase (:169-187).
  - Splits NEVER move points. A stored segment is Morton-sorted, so a split is pure
    directory surgery: the segment's 8 child sub-ranges are found by octant run
    boundaries and become 8 child segments pointing into the same pool rows. The split
    node's points are gathered once, solely to voxel-sample the newly inner node
    (the reference re-inserts and re-counts all spilled points instead, :253-289).
  - Split selection runs on the batch's RUN WINDOW (one row per (leaf, contiguous
    Morton run)) — gathers and cumsums touch run_window rows, never the node
    directory's full capacity.
  - Voxel first-come dedup is lazy: candidates are deduplicated within the batch by
    sorted-adjacency (equal cells are adjacent in Morton order), appended raw, and
    duplicates across steps are removed by periodic compaction of the (node, cell)
    sorted voxel store (first arrival wins — same winner set as the reference's
    atomicOr race, but deterministic). Per-node voxel counts and the render CSR are
    exact only after compaction (the engine compacts before rendering).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import EngineConfig
from ..ops import morton
from ..ops.segments import (compact_indices, compact_mask_via_sort,
                            exclusive_cumsum, run_reduce_sum, run_starts)
from ..ops.fastops import gather1d
from ..ops import ragged
from .structures import OctreeState

I32_MAX = jnp.iinfo(jnp.int32).max


class Work(NamedTuple):
    """The routed, Morton-sorted working batch.

    Width is B + boundary_window: the leaf-boundary rows merged in by route()
    stay INTERLEAVED as invalid junk rows (compacting them out would cost a
    second full-width multi-payload sort). A boundary sorts at its leaf's
    Morton-interval start, before any of that leaf's points, so junk rows only
    ever sit at leaf-run starts — every run's valid rows are one contiguous
    stretch, which insert_points exploits (junk between runs becomes bounded
    pool waste, tracked in state.pool_waste)."""
    w0: jax.Array       # [BW] i32 full Morton words (84-bit position identity;
    w1: jax.Array       # positions reconstruct via morton.decode +
    w2: jax.Array       # dequantize_cols — no float columns ride the sorts)
    rgba: jax.Array     # [BW] u32
    qx: jax.Array       # [BW] i32 quantized (28-bit), decoded from the words
    qy: jax.Array
    qz: jax.Array
    leaf: jax.Array     # [BW] i32 current target leaf
    lvl: jax.Array      # [BW] i32 leaf level
    count: jax.Array    # i32 scalar: number of VALID rows
    valid: jax.Array    # [BW] bool: real routed points (junk/fill rows False)
    k0: jax.Array       # [BW] i32 route sort key words (Morton w0, w1<<1|flag);
    k1: jax.Array       # the stream stays sorted by them — split rounds binary-
                        # search child interval starts instead of re-deriving the
                        # run structure from the full batch


class Runs(NamedTuple):
    """Per-(leaf, contiguous Morton run) view of the working batch.

    Morton order makes each leaf's batch contribution one contiguous run, so this is
    simultaneously the per-leaf batch histogram (split selection), the segment list
    (insertion), and the re-route broadcast structure.
    """
    r_leaf: jax.Array   # [RW] leaf id per run (compacted, ascending row order)
    r_cnt: jax.Array    # [RW] run length
    r_row: jax.Array    # [RW] work-row index of the run start
    n_runs: jax.Array   # i32 total runs (> RW means the window overflowed)


def boundary_key(nx, ny, nz, level):
    """Morton interval-start key (2 int32 words) of a node's spatial interval.

    Words cover octant levels 0..9 and 10..19 (see ops/morton.py); two leaves at any
    depth <= MAX_DEPTH=20 have distinct (w0, w1) interval starts."""
    shift = C.FULL_GRID_BITS - level
    w0, w1, _ = morton.encode(nx << shift, ny << shift, nz << shift)
    return w0, w1


def route(cfg: EngineConfig, state: OctreeState, x: jax.Array, y: jax.Array,
          z: jax.Array, rgba: jax.Array, count: jax.Array) -> Work:
    """Sort the batch by Morton code and assign each point its current leaf.

    Replaces the reference's per-point root->leaf pointer traversal
    (progressive_octree_voxels.cu:169-187) with one stable merge-sort of the batch
    against the persistent sorted leaf-boundary directory. Sort keys are
    (morton word0, morton word1 << 1 | is_point) so boundaries precede equal-key
    points; each point's leaf then arrives via a take-last carry.
    """
    B = x.shape[0]
    n_cap = state.child_base.shape[0]
    W = min(cfg.boundary_window, n_cap)
    mx = jnp.int32(I32_MAX)

    qx, qy, qz = morton.quantize_cols(x, y, z, state.box_min, state.cube_size)
    valid = jnp.arange(B, dtype=jnp.int32) < count
    w0, w1, w2 = morton.encode(qx, qy, qz)
    pk0 = jnp.where(valid, w0, mx)
    pk1 = jnp.where(valid, (w1 << 1) | 1, mx)

    # Re-sort the boundary window (splits appended unsorted rows at the tail
    # last step). Key ties happen only along a stale-ancestor chain (a split
    # parent's interval start equals its child 0's); the LIVE leaf is the
    # newest/deepest of the chain, so its pack (id*32+lvl, ids allocated
    # monotonically) is the chain MAX — the pack itself is the tiebreak KEY,
    # making this 3-key sort of the SMALL window order-deterministic without
    # stability. The delta encoding below then telescopes every tie group to
    # that max under ANY later permutation (sums are permutation-invariant),
    # which is what lets the batch-wide merge sort drop stability too.
    state.mem_capacity_reached = state.mem_capacity_reached | \
        (state.num_boundaries > W)
    brow = jnp.arange(W, dtype=jnp.int32)
    bvalid = brow < state.num_boundaries
    bk0 = jnp.where(bvalid, state.b_key0[:W], mx)
    bk1 = jnp.where(bvalid, state.b_key1[:W], mx)
    sb0, sb1, sbp = jax.lax.sort(
        (bk0, bk1, jnp.where(bvalid, state.b_pack[:W], mx)), num_keys=3,
        is_stable=False)
    sbp = jnp.where(jnp.arange(W) < state.num_boundaries, sbp, 0)
    dus = jax.lax.dynamic_update_slice
    state.b_key0 = dus(state.b_key0, sb0, (0,))
    state.b_key1 = dus(state.b_key1, sb1, (0,))
    state.b_pack = dus(state.b_pack, sbp, (0,))

    # Merge points + boundaries; boundary flag bit 0 sorts before equal-key points.
    # Boundary rows carry their pack as a DELTA vs the previous boundary (in the
    # already-sorted window order, which the stable merge preserves): a plain
    # cumsum after the sort then telescopes to "pack of the last boundary at or
    # before this row" — no scan/carry/gather needed.
    bdelta = jnp.where(bvalid, sbp - jnp.where(brow > 0,
                                               jnp.roll(sbp, 1), 0), 0)
    k0 = jnp.concatenate([pk0, sb0])
    k1 = jnp.concatenate([pk1, jnp.where(bvalid, sb1 << 1, mx)])
    # positions ride as ONE payload column — the third Morton word (a node
    # boundary's sub-level-20 octant bits are all zero); the full 84-bit
    # position decodes from (k0, k1 >> 1, k2) after the sort. 4 sort columns
    # instead of 6 (the f32 x/y/z columns are gone) is direct traffic saved.
    k2 = jnp.concatenate([w2, jnp.zeros((W,), jnp.int32)])
    # rgba (point rows) and pack-delta (boundary rows) are mutually exclusive
    # per row, so ONE payload column carries both (~15% less sort traffic);
    # the flag bit of the sorted key separates them afterwards
    aux = jnp.concatenate([jax.lax.bitcast_convert_type(rgba, jnp.int32),
                           bdelta])
    # unstable merge (see the boundary resort above): boundary tie groups are
    # carry-safe under any permutation, point-vs-boundary ties are impossible
    # (flag bit), and among exact-duplicate POINTS only the voxel color winner
    # of a shared cell becomes order-defined — the same set the reference's
    # atomicOr race leaves undefined (voxels.cu:93-119)
    sk0, sk1, sk2, saux = jax.lax.sort(
        (k0, k1, k2, aux), num_keys=2, is_stable=False)

    is_pt = ((sk1 & 1) == 1) & (sk0 != mx)   # real points only (mx fill excluded)
    is_bnd = ((sk1 & 1) == 0) & (sk0 != mx)
    sc = jnp.where(is_pt, jax.lax.bitcast_convert_type(saux, jnp.uint32),
                   jnp.uint32(0))
    carried = jnp.cumsum(jnp.where(is_bnd, saux, 0))  # governing boundary pack

    # NO compaction: boundary/fill rows stay interleaved as invalid junk (see
    # Work docstring). Junk rows inherit their own boundary's pack, so their
    # leaf field matches the points that follow them — run detection needs only
    # the valid mask (plus leaf-change for post-split adjacency).
    cpk = jnp.maximum(carried, 0)
    sw1 = sk1 >> 1                       # flag stripped (junk rows: garbage)
    cqx, cqy, cqz = morton.decode(sk0, sw1, sk2)
    return state, Work(w0=sk0, w1=sw1, w2=sk2, rgba=sc, qx=cqx, qy=cqy,
                       qz=cqz, leaf=cpk >> 5, lvl=cpk & 31, count=count,
                       valid=is_pt, k0=sk0, k1=sk1)


def compute_runs(cfg: EngineConfig, work: Work) -> Runs:
    """Run structure of the current batch->leaf assignment.

    One 1-key/1-payload sort compacts the run-start row indices; run lengths are
    next-start differences on the compacted window and leaf ids one small gather —
    no full-width segmented reduction (run_reduce_sum's jnp.flip reversals cost
    ~8 ms per 2M-wide call on v5e).
    """
    B = work.leaf.shape[0]
    rowi = jnp.arange(B, dtype=jnp.int32)
    valid = work.valid
    prev_valid = jnp.roll(valid, 1).at[0].set(False)
    # a run starts at a valid row whose predecessor is junk (every leaf's batch
    # run is preceded by its boundary row) or carries a different leaf (children
    # created by this step's split rounds are adjacent with no junk between)
    starts = valid & (~prev_valid | (work.leaf != jnp.roll(work.leaf, 1)))
    RW = min(cfg.run_window, B)
    # single-key unstable index compaction (ops/segments.compact_indices):
    # the compacted value IS the row index, so no payload rides the sort
    r_row_f, n_runs = compact_indices(starts)
    r_row = jnp.minimum(r_row_f[:RW], B)   # INT_MAX tail -> clamp
    rw_i = jnp.arange(RW, dtype=jnp.int32)
    rv = rw_i < jnp.minimum(n_runs, RW)
    # a run's valid rows are contiguous from its start (junk sits before the
    # NEXT run's first valid row), so the length is the valid-row-count
    # difference between consecutive starts
    nxt = jnp.where(rw_i + 1 < n_runs,
                    jnp.concatenate([r_row[1:], r_row[:1]]), B)
    ecs = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    ecs_pad = jnp.concatenate([ecs, work.count[None]])
    r_cnt = jnp.where(rv,
                      gather1d(ecs_pad, jnp.clip(nxt, 0, B))
                      - gather1d(ecs_pad, jnp.clip(r_row, 0, B)), 0)
    r_leaf = gather1d(work.leaf, jnp.where(rv, r_row, 0))
    return Runs(r_leaf=r_leaf, r_cnt=r_cnt, r_row=jnp.where(rv, r_row, B),
                n_runs=n_runs)


def _append_voxels_prefix(cfg: EngineConfig, state: OctreeState, k0, k1, k2l, src,
                          rgba, n_emit):
    """Append candidate voxels already packed at the window front (lazy dedup).

    Rows are (global key words, emitting leaf, color) — morton.key_words_at_level;
    no node lookup happens at emission (compaction resolves node ids per group).
    One contiguous dynamic-update-slice per column; rows past n_emit are garbage
    beyond the watermark (the store is physically padded by the largest append
    window, structures._cand_capacity) and are overwritten by later appends.
    Per-node voxel counts are NOT updated here — compaction recomputes them exactly.
    """
    room = jnp.maximum(cfg.voxel_capacity - state.vox_used, 0)
    n_new = jnp.minimum(n_emit, room)
    start = state.vox_used
    dus = jax.lax.dynamic_update_slice
    state.vox_k0 = dus(state.vox_k0, k0, (start,))
    state.vox_k1 = dus(state.vox_k1, k1, (start,))
    state.vox_k2l = dus(state.vox_k2l, k2l, (start,))
    state.vox_node = dus(state.vox_node, src, (start,))
    state.vox_rgba = dus(state.vox_rgba, rgba, (start,))
    state.vox_used = state.vox_used + n_new
    state.mem_capacity_reached = state.mem_capacity_reached | (n_emit > room)
    return state


def _lower_bound2(k0arr, k1arr, q0, q1, lo, hi):
    """Vectorized 2-word lower bound: first i in [lo, hi) with
    (k0arr[i], k1arr[i]) >= (q0, q1); returns hi when none."""
    iters = max(1, int(k0arr.shape[0]).bit_length())

    def body(_, lh):
        lo, hi = lh
        mid = jnp.clip((lo + hi) // 2, 0, k0arr.shape[0] - 1)
        a0 = gather1d(k0arr, mid)
        a1 = gather1d(k1arr, mid)
        less = (a0 < q0) | ((a0 == q0) & (a1 < q1))
        take = lo < hi
        return (jnp.where(take & less, mid + 1, lo),
                jnp.where(take & ~less, mid, hi))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _create_children(cfg: EngineConfig, state: OctreeState, tids, tv, n_take):
    """Create 8 children for each taken node id (window K = tids.shape[0]).

    Contiguous 8-blocks (the reference's `atomicAdd(&numNodes, 8)`,
    progressive_octree_voxels.cu:317): one child_base index replaces 8 pointers.
    Appends the 8 boundary-directory rows per node (the parent's row goes stale;
    child 0 shares its key and, appended later, wins the stable-sort tie at the
    next route) and fills the ancestor table. Returns (state, base[K],
    cnx, cny, cnz, clvl [8K] flat child coords/levels)."""
    n_cap = state.child_base.shape[0]
    K = tids.shape[0]
    tsafe = jnp.maximum(tids, 0)

    base = state.num_nodes + 8 * jnp.arange(K, dtype=jnp.int32)
    plvl = state.level[tsafe]
    pnx, pny, pnz = state.nx[tsafe], state.ny[tsafe], state.nz[tsafe]
    octs = jnp.arange(8, dtype=jnp.int32)
    ox, oy, oz = (octs >> 2) & 1, (octs >> 1) & 1, octs & 1
    cid = jnp.where(tv[:, None], base[:, None] + octs[None, :], n_cap).reshape(-1)
    rep = lambda a: jnp.repeat(a, 8)
    cnx = (2 * pnx[:, None] + ox).reshape(-1)
    cny = (2 * pny[:, None] + oy).reshape(-1)
    cnz = (2 * pnz[:, None] + oz).reshape(-1)
    state.parent = state.parent.at[cid].set(rep(tids), mode="drop")
    state.level = state.level.at[cid].set(rep(plvl + 1), mode="drop")
    state.nx = state.nx.at[cid].set(cnx, mode="drop")
    state.ny = state.ny.at[cid].set(cny, mode="drop")
    state.nz = state.nz.at[cid].set(cnz, mode="drop")
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
    anc_idx = jnp.where(cid[:, None] < n_cap, cid[:, None] * L + cols[None, :],
                        n_anc)
    state.anc = state.anc.at[anc_idx.reshape(-1)].set(
        crow.reshape(-1), mode="drop")
    state.child_base = state.child_base.at[
        jnp.where(tv, tsafe, n_cap)].set(base, mode="drop")
    state.num_nodes = state.num_nodes + 8 * n_take

    # leaf-boundary directory: append the 8 child boundaries
    clvl = rep(plvl + 1)
    bw0, bw1 = boundary_key(cnx, cny, cnz, clvl)
    bpk = (rep(base) + jnp.tile(octs, (K,))) * 32 + clvl
    pos = state.num_boundaries + jnp.arange(8 * K, dtype=jnp.int32)
    fitb = rep(tv) & (pos < n_cap)
    widx = jnp.where(fitb, pos, n_cap)
    state.b_key0 = state.b_key0.at[widx].set(bw0, mode="drop")
    state.b_key1 = state.b_key1.at[widx].set(bw1, mode="drop")
    state.b_pack = state.b_pack.at[widx].set(bpk, mode="drop")
    nb = state.num_boundaries + 8 * n_take
    state.mem_capacity_reached = state.mem_capacity_reached | (nb > n_cap)
    state.num_boundaries = jnp.minimum(nb, n_cap)
    return state, base, cnx, cny, cnz, clvl


def _common_prefix_lo(qx, qy, qz, prev_ok):
    """Per-row first-in-cell emission floor from the Morton-sorted stream.

    In Morton order, the levels at which a row is first-in-cell form a contiguous
    range starting at lo = (common prefix bits with the previous row) - (GRID_BITS-1)
    (the level-l cell is the top l + GRID_BITS - 1... see batch_voxel_candidates).
    A junk predecessor shares NO bits (bounded re-emission; dedup removes it)."""
    xor3 = ((qx ^ jnp.roll(qx, 1)) | (qy ^ jnp.roll(qy, 1))
            | (qz ^ jnp.roll(qz, 1)))
    xor3 = jnp.where(prev_ok, xor3, -1)
    yv = (xor3.astype(jnp.uint32)) << (32 - C.FULL_GRID_BITS)
    yv = yv | (yv >> 1)
    yv = yv | (yv >> 2)
    yv = yv | (yv >> 4)
    yv = yv | (yv >> 8)
    yv = yv | (yv >> 16)
    from ..ops.segments import popcount32
    n_common = 32 - popcount32(yv)          # leading zeros = common prefix bits
    return jnp.maximum(n_common - (C.GRID_BITS - 1), 0)


def split_loop(cfg: EngineConfig, state: OctreeState, work: Work,
               force_ids=None):
    """Resolve ALL splits a batch causes with ONE stored-point spill.

    The reference iterates expand() {count, split, re-insert} until no leaf is
    over capacity (progressive_octree_voxels.cu:385-414), repeatedly touching
    every spilled point. Round-2's port iterated similarly, re-gathering and
    re-sorting the split nodes' stored points every cascade round (~3 rounds x
    ~12 ms at 2M steps). This version restructures the cascade around sorted
    INTERVALS so the heavy work happens once per step:

      1. round-1 selection picks over-capacity leaves from the batch's run
         window (stored counter + batch run > cap, spill/segment/node budgets);
      2. their stored points are gathered ONCE and sorted by full Morton key
         next to the (already sorted) batch stream — two sorted streams in
         which ANY node's population is a contiguous interval;
      3. the cascade runs on a FRONTIER of candidate child nodes (tiny arrays):
         per round, each candidate's population is two interval lengths (binary
         searches), over-capacity candidates split and push their 8 children —
         no window-wide pass of any kind inside the loop;
      4. finalization touches the wide windows once each: a single disjoint
         interval-scatter + cumsum re-routes every batch and spilled row to its
         FINAL leaf; stored segments subdivide directly to final depth (one
         sort of the spill window by (segment, leaf)); spilled rows join the
         batch's voxel-candidate emission with per-row level ranges
         [split node level, final level).

    Returns (state, work, runs, spill_extra) where spill_extra are the spilled
    rows' candidate-emission columns for batch_voxel_candidates.
    """
    n_cap = state.child_base.shape[0]
    s_cap = state.seg_node.shape[0]
    B = work.leaf.shape[0]
    K1 = cfg.max_splits_per_round
    CK = min(cfg.cascade_splits_per_round, K1)
    FW = 8 * K1                      # frontier capacity
    # final-leaf capacity: every split (round 1 <= K1, cascade <= CK per round)
    # contributes at most 8 leaves, plus the seed frontier
    FLW = 8 * (K1 + CK * cfg.split_rounds) + FW
    SS = cfg.seg_select_cap
    SPW = ragged.window_for(cfg.spill_capacity, SS)
    RUNW = 8 * SS
    valid = work.valid
    mx = jnp.int32(I32_MAX)

    runs = compute_runs(cfg, work)
    if force_ids is not None:
        # End-of-load convergence (split_finish): a leaf can end the stream
        # over-capacity when a step's round-1 budgets deferred its split and no
        # later batch routed points to it (the reference converges within each
        # batch instead — expand() loops until no leaf spills,
        # progressive_octree_voxels.cu:385-414). The finish pass re-enters this
        # machinery with an EMPTY batch (count == 0, so compute_runs found no
        # runs) and the overfull node ids as synthetic zero-length runs at the
        # window front: work intervals come out empty and the spill path
        # re-routes the nodes' stored segments to final depth as usual.
        KF = force_ids.shape[0]
        nf = jnp.sum((force_ids >= 0).astype(jnp.int32))
        ext = jnp.arange(KF, dtype=jnp.int32) < nf   # ids are front-compacted
        runs = Runs(
            r_leaf=jnp.concatenate([jnp.maximum(force_ids, 0), runs.r_leaf]),
            r_cnt=jnp.concatenate([jnp.zeros((KF,), jnp.int32), runs.r_cnt]),
            r_row=jnp.concatenate([jnp.zeros((KF,), jnp.int32), runs.r_row]),
            n_runs=nf + runs.n_runs * jnp.int32(0))
        del ext
    RW = runs.r_leaf.shape[0]

    # valid-row prefix counts of the work stream (shared by all interval counts)
    ecs = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    ecs_pad = jnp.concatenate([ecs, work.count[None]])

    # --- round-1 selection (cumsums over the RW run window) ---
    rvalid = jnp.arange(RW, dtype=jnp.int32) < jnp.minimum(runs.n_runs, RW)
    lsafe = jnp.where(rvalid, runs.r_leaf, 0)
    # for leaves, counter == stored num_points (they only diverge on inner nodes),
    # so one gather serves both the over-capacity test and the spill budget
    counter_r = gather1d(state.counter, lsafe)
    level_r = gather1d(state.level, lsafe)
    cb_r = gather1d(state.child_base, lsafe)
    over = (rvalid & (cb_r < 0)
            & (counter_r + runs.r_cnt > cfg.max_points_per_node)
            & (level_r < cfg.max_depth))
    # PRIORITY selection, biggest (stored + batch) first: budget starvation
    # must not compound. In run order, a hot leaf's split can be deferred by
    # the spill/seg budgets every step while it keeps absorbing batches; once
    # its stored count exceeds spill_capacity it can NEVER split (the spill
    # gather window is static) — the 64M bench grew three such leaves holding
    # 21M points. Greedy big-first bounds any leaf's stored count at take
    # time by ~(leaf cap + its single-step inflow), which spill_capacity is
    # sized to cover. One extra 1-key sort over the RW run window (~131k).
    prio = jnp.where(over, -(counter_r + runs.r_cnt), I32_MAX)
    _, perm = jax.lax.sort((prio, jnp.arange(RW, dtype=jnp.int32)),
                           num_keys=1, is_stable=False)
    over_p = gather1d(over.astype(jnp.int32), perm) > 0
    cnt_p = gather1d(counter_r, perm)
    rank_p = jnp.cumsum(over_p.astype(jnp.int32))      # inclusive
    pts_p = jnp.where(over_p, cnt_p, 0)
    pts_ex = exclusive_cumsum(pts_p)
    segs_p = jnp.where(over_p, gather1d(state.node_seg_count,
                                        gather1d(lsafe, perm)), 0)
    segs_ex = exclusive_cumsum(segs_p)
    node_room = (state.num_nodes + 8 * rank_p) <= n_cap
    take_p = (over_p & (rank_p <= K1) & (pts_ex + pts_p <= cfg.spill_capacity)
              & (segs_ex + segs_p <= cfg.seg_select_cap) & node_room)
    n_take1 = jnp.sum(take_p.astype(jnp.int32))
    state.mem_capacity_reached = state.mem_capacity_reached | \
        jnp.any(over_p & ~node_room)

    sel_p, _ = compact_indices(take_p)        # positions in priority order
    tv = jnp.arange(K1, dtype=jnp.int32) < n_take1
    srows = gather1d(perm, jnp.where(tv, jnp.minimum(sel_p[:K1], RW - 1), 0))
    tids_c = gather1d(runs.r_leaf, srows)
    trow_c = gather1d(runs.r_row, srows)
    tcnt_c = gather1d(runs.r_cnt, srows)
    tids = jnp.where(tv, tids_c, -1)
    tsafe = jnp.maximum(tids, 0)
    tstart = jnp.where(tv, trow_c, B)
    tend = jnp.where(tv, trow_c + tcnt_c, B)
    total_spill = jnp.sum(jnp.where(take_p, pts_p, 0))

    # --- gather the taken nodes' stored points ONCE; sort by full Morton key ---
    just = jnp.zeros((n_cap,), jnp.bool_).at[
        jnp.where(tv, tsafe, n_cap)].set(True, mode="drop")

    def spill_gather(_):
        memflag = jnp.zeros((), jnp.bool_)
        # scan only the live watermark region (pow-of-two window): the full
        # directory capacity can be 10-50x the live segment count (engine
        # compacts the directory before num_segments outgrows the window)
        SGW = min(cfg.seg_scan_window, s_cap)
        memflag = memflag | (state.num_segments > SGW)
        s_sel = (state.seg_cnt[:SGW] > 0) & (state.seg_node[:SGW] >= 0) & \
            just[jnp.clip(state.seg_node[:SGW], 0, n_cap - 1)]
        sel_full, n_sel = compact_indices(s_sel)
        memflag = memflag | (n_sel > SS)
        sv = jnp.arange(SS, dtype=jnp.int32) < n_sel
        ssafe = jnp.where(sv, sel_full[:SS], 0)
        scnt = jnp.where(sv, state.seg_cnt[ssafe], 0)
        soff = state.seg_off[ssafe]
        snode = jnp.where(sv, state.seg_node[ssafe], 0)
        snlvl = state.level[snode]

        rplan = ragged.plan(soff, scnt, SPW)
        rvalid_g = rplan.valid
        memflag = memflag | (
            jnp.sum(rvalid_g.astype(jnp.int32)) != jnp.sum(scnt))
        # the pool stores Morton words, so the gathered rows ARE the sort keys
        # (no quantize/encode, and the spilled re-route is bit-exact vs the
        # original ingest by construction)
        gw0 = ragged.gather_column(rplan, state.pt_w0)
        gw1 = ragged.gather_column(rplan, state.pt_w1)
        gw2 = ragged.gather_column(rplan, state.pt_w2)
        gc = jax.lax.bitcast_convert_type(
            ragged.gather_column(rplan, jax.lax.bitcast_convert_type(
                state.pt_rgba, jnp.float32)), jnp.uint32)
        # per-segment constants are BROADCAST (scatter-delta + cumsum), never
        # gathered (~7 ns per gathered row on v5e; see docs/PERFORMANCE.md)
        glvl = ragged.broadcast_i32(rplan, snlvl)
        goff0 = ragged.broadcast_i32(rplan, soff)
        # 4-key sort (goff breaks cell ties deterministically: pool order =
        # arrival order, matching first-come voxel semantics); junk alignment
        # rows sort to the tail via MAX keys
        k0m = jnp.where(rvalid_g, gw0, mx)
        ggoff = goff0 + rplan.elem
        sk0, sk1, sk2, sgoff, srgba, sseg, sglvl = jax.lax.sort(
            (k0m, gw1, gw2, ggoff,
             jax.lax.bitcast_convert_type(gc, jnp.int32), rplan.seg_of, glvl),
            num_keys=4, is_stable=False)
        n_spill = jnp.sum(rvalid_g.astype(jnp.int32))
        return (sk0, sk1, sk2, sgoff, srgba, sseg, sglvl, n_spill, memflag,
                sv, ssafe)

    def no_spill(_):
        # derive every output from a batch value so the varying-axes type
        # matches the spill branch under shard_map (vma typing)
        z = jnp.zeros((SPW,), jnp.int32) + (total_spill & 0)
        zs = jnp.zeros((SS,), jnp.int32) + (total_spill & 0)
        return (z + mx, z, z, z, z, z, z, jnp.zeros_like(total_spill),
                (total_spill & 0) > 0, zs > 1, zs)

    (sk0, sk1, sk2, sgoff, srgba, sseg, sglvl, n_spill, sp_flag, sv, ssafe) = \
        jax.lax.cond(total_spill > 0, spill_gather, no_spill, 0)
    state.mem_capacity_reached = state.mem_capacity_reached | sp_flag

    # taken nodes' spill intervals (their stored rows, contiguous post-sort)
    t_s0, t_s1 = boundary_key(state.nx[tsafe], state.ny[tsafe],
                              state.nz[tsafe], state.level[tsafe])
    # zK derives from n_spill so the search carry is varying under shard_map
    zK = jnp.zeros((K1,), jnp.int32) + (n_spill & 0)
    tss = _lower_bound2(sk0, sk1, t_s0, t_s1, zK, zK + SPW)
    # exclusive end: first spill key >= the next x-sibling's start works only
    # within a parent; use the generic successor query (e0, e1) of the interval
    # END key instead: boundary_key of (nx+1) wraps at axis ends, so search the
    # lexicographic successor of the node's LAST contained key
    tse = _lower_bound2(sk0, sk1, *_interval_end_query(
        state.nx[tsafe], state.ny[tsafe], state.nz[tsafe], state.level[tsafe]),
        zK, zK + SPW)
    tss = jnp.where(tv, jnp.minimum(tss, n_spill), 0)
    tse = jnp.where(tv, jnp.minimum(tse, n_spill), 0)

    # --- create round-1 children; they seed the frontier ---
    state, base1, cnx1, cny1, cnz1, clvl1 = _create_children(
        cfg, state, tids, tv, n_take1)
    f_id, f_lvl, f_nx, f_ny, f_nz, f_ws, f_we, f_ss, f_se = _child_rows(
        work, sk0, sk1, tv, base1, cnx1, cny1, cnz1, clvl1,
        tstart, tend, tss, tse)

    def pad_to(a, n, fill):
        return jnp.concatenate([a, jnp.full((n - a.shape[0],), fill, a.dtype)])

    frontier = tuple(pad_to(a, FW, f)
                     for a, f in ((f_id, -1), (f_lvl, 0), (f_nx, 0), (f_ny, 0),
                                  (f_nz, 0), (f_ws, B), (f_we, B), (f_ss, 0),
                                  (f_se, 0)))
    # id,lvl,ws,we,ss,se — zeros derived from a batch value (shard_map vma typing)
    fl = tuple(jnp.zeros((FLW,), jnp.int32) + (work.count & 0) for _ in range(6))
    fl_n = jnp.zeros_like(work.count)

    def cascade_cond(carry):
        state, frontier, fl, fl_n, used, n_alive, rounds = carry
        return (n_alive > 0) & (rounds < cfg.split_rounds)

    def cascade_body(carry):
        state, frontier, fl, fl_n, used, _na, rounds = carry
        c_id, c_lvl, c_nx, c_ny, c_nz, c_ws, c_we, c_ss, c_se = frontier
        alive = c_id >= 0
        wcnt = gather1d(ecs_pad, jnp.clip(c_we, 0, B)) \
            - gather1d(ecs_pad, jnp.clip(c_ws, 0, B))
        scnt2 = c_se - c_ss
        overc = alive & (wcnt + scnt2 > cfg.max_points_per_node) \
            & (c_lvl < cfg.max_depth)
        rank = jnp.cumsum(overc.astype(jnp.int32))
        room = (state.num_nodes + 8 * rank) <= n_cap
        # per-ROUND budget (matches the old cascade and the reference's bounded
        # spillingNodes scratch): over-budget rows stay in the frontier and
        # retry next round
        takec = overc & (rank <= CK) & room
        n_take = jnp.sum(takec.astype(jnp.int32))
        state.mem_capacity_reached = state.mem_capacity_reached | \
            jnp.any(overc & ~room)

        (ct_id, ct_lvl, ct_nx, ct_ny, ct_nz, ct_ws, ct_we, ct_ss, ct_se), _ = \
            compact_mask_via_sort(takec, frontier)
        ctv = jnp.arange(CK, dtype=jnp.int32) < n_take
        ct_id = jnp.where(ctv, ct_id[:CK], -1)
        sl = lambda a, f: jnp.where(ctv, a[:CK], f)
        ct_ws, ct_we = sl(ct_ws, B), sl(ct_we, B)
        ct_ss, ct_se = sl(ct_ss, 0), sl(ct_se, 0)

        state, baseC, cnxC, cnyC, cnzC, clvlC = _create_children(
            cfg, state, ct_id, ctv, n_take)
        rows = _child_rows(work, sk0, sk1, ctv, baseC,
                           cnxC, cnyC, cnzC, clvlC, ct_ws, ct_we, ct_ss, ct_se)

        # frontier rows that are NOT over capacity are decided: leaves.
        # Over-but-over-budget rows stay in the frontier and retry next round.
        done = alive & ~overc
        (d_id, d_lvl, d_ws, d_we, d_ss, d_se), n_done = compact_mask_via_sort(
            done, (c_id, c_lvl, c_ws, c_we, c_ss, c_se))
        dv = jnp.arange(FW, dtype=jnp.int32) < n_done
        pos = fl_n + jnp.arange(FW, dtype=jnp.int32)
        fit = dv & (pos < FLW)
        widx = jnp.where(fit, pos, FLW)
        fl = (fl[0].at[widx].set(d_id, mode="drop"),
              fl[1].at[widx].set(d_lvl, mode="drop"),
              fl[2].at[widx].set(d_ws, mode="drop"),
              fl[3].at[widx].set(d_we, mode="drop"),
              fl[4].at[widx].set(d_ss, mode="drop"),
              fl[5].at[widx].set(d_se, mode="drop"))
        fl_n = fl_n + jnp.sum(fit.astype(jnp.int32))
        state.mem_capacity_reached = state.mem_capacity_reached | \
            jnp.any(dv & ~fit)

        # next frontier = retained over-budget rows ++ the new children
        keep = overc & ~takec
        kept, n_keep = compact_mask_via_sort(keep, frontier)
        defaults = (-1, 0, 0, 0, 0, B, B, 0, 0)
        kv = jnp.arange(FW, dtype=jnp.int32) < n_keep
        cat = tuple(jnp.concatenate(
            [jnp.where(kv, k[:FW], jnp.asarray(f, k.dtype)), r])
            for k, r, f in zip(kept, rows, defaults))
        (cat_c), n_alive2 = compact_mask_via_sort(cat[0] >= 0, cat)
        state.mem_capacity_reached = state.mem_capacity_reached | (n_alive2 > FW)
        frontier = tuple(a[:FW] for a in cat_c)
        return state, frontier, fl, fl_n, used + n_take, n_take, rounds + 1

    one = jnp.ones_like(work.count)
    state, frontier, fl, fl_n, _, _, _ = jax.lax.while_loop(
        cascade_cond, cascade_body,
        (state, frontier, fl, fl_n, n_take1 & 0, n_take1, jnp.zeros_like(one)))

    # remaining frontier rows (loop exhausted) are leaves as well
    c_id, c_lvl, _, _, _, c_ws, c_we, c_ss, c_se = frontier
    rem = c_id >= 0
    (d_id, d_lvl, d_ws, d_we, d_ss, d_se), n_done = compact_mask_via_sort(
        rem, (c_id, c_lvl, c_ws, c_we, c_ss, c_se))
    dv = jnp.arange(FW, dtype=jnp.int32) < n_done
    pos = fl_n + jnp.arange(FW, dtype=jnp.int32)
    fit = dv & (pos < FLW)
    widx = jnp.where(fit, pos, FLW)
    fl = (fl[0].at[widx].set(d_id, mode="drop"),
          fl[1].at[widx].set(d_lvl, mode="drop"),
          fl[2].at[widx].set(d_ws, mode="drop"),
          fl[3].at[widx].set(d_we, mode="drop"),
          fl[4].at[widx].set(d_ss, mode="drop"),
          fl[5].at[widx].set(d_se, mode="drop"))
    fl_n = fl_n + jnp.sum(fit.astype(jnp.int32))
    state.mem_capacity_reached = state.mem_capacity_reached | jnp.any(dv & ~fit)

    # --- final re-route: ONE disjoint interval-scatter + cumsum per stream ---
    fl_id, fl_lvl, fl_ws, fl_we, fl_ss, fl_se = fl
    flv = jnp.arange(FLW, dtype=jnp.int32) < fl_n
    pk = jnp.where(flv, fl_id * 32 + fl_lvl + 1, 0)

    def reroute(n_rows, s_idx, e_idx):
        delta = jnp.zeros((n_rows + 1,), jnp.int32)
        delta = delta.at[jnp.where(flv, s_idx, n_rows)].add(pk, mode="drop")
        delta = delta.at[jnp.where(flv, e_idx, n_rows)].add(-pk, mode="drop")
        return jnp.cumsum(delta[:n_rows])

    cum_w = reroute(B, fl_ws, fl_we)
    new_leaf = jnp.where(cum_w > 0, (cum_w - 1) >> 5, work.leaf)
    new_lvl = jnp.where(cum_w > 0, (cum_w - 1) & 31, work.lvl)
    work = work._replace(leaf=new_leaf, lvl=new_lvl)
    runs = compute_runs(cfg, work)

    cum_s = reroute(SPW, fl_ss, fl_se)
    srow = jnp.arange(SPW, dtype=jnp.int32)
    svalid = srow < n_spill
    s_leaf = jnp.where(cum_s > 0, (cum_s - 1) >> 5, 0)
    s_flvl = jnp.where(cum_s > 0, (cum_s - 1) & 31, 0)

    # --- spilled rows join the voxel-candidate emission ---
    # levels [split-node level, final level): the newly inner chain samples the
    # same first-in-cell voxels the reference's per-level re-descent emits
    # (voxels.cu:417-484), floored at the PREFIX first-in-cell level
    sqx, sqy, sqz = morton.decode(sk0, sk1, sk2)
    prev_ok = svalid & jnp.roll(svalid, 1) & (srow > 0)
    s_lo = jnp.maximum(_common_prefix_lo(sqx, sqy, sqz, prev_ok), sglvl)
    s_cnt = jnp.where(svalid, jnp.maximum(s_flvl - s_lo, 0), 0)
    spill_extra = (sk0, sk1, sk2, s_leaf, srgba, s_lo, s_cnt)

    # --- segment surgery: subdivide stored segments straight to final depth ---
    def surgery(small):
        (seg_node, seg_off, seg_cnt, num_segments, counter, num_points,
         node_seg_count, memflag) = small
        skey = jnp.where(svalid, sseg, SS)
        o_seg, o_leaf, o_goff = jax.lax.sort(
            (skey, s_leaf, sgoff), num_keys=3, is_stable=False)
        starts = svalid & ((o_seg != jnp.roll(o_seg, 1))
                           | (o_leaf != jnp.roll(o_leaf, 1)) | (srow == 0))
        pos_f, n_runs_all = compact_indices(starts)
        rw_i = jnp.arange(RUNW, dtype=jnp.int32)
        rok = rw_i < n_runs_all
        r_pos = jnp.where(rok, jnp.minimum(pos_f[:RUNW], SPW - 1), 0)
        r_leaf = gather1d(o_leaf, r_pos)
        r_goff = gather1d(o_goff, r_pos)
        nxt = jnp.where(rw_i + 1 < n_runs_all,
                        jnp.concatenate([r_pos[1:], r_pos[:1]]), n_spill)
        r_len = jnp.where(rok, nxt - r_pos, 0)
        npos = num_segments + rw_i
        fit2 = rok & (npos < s_cap)
        widx2 = jnp.where(fit2, npos, s_cap)
        seg_node = seg_node.at[widx2].set(r_leaf, mode="drop")
        seg_off = seg_off.at[widx2].set(r_goff, mode="drop")
        seg_cnt = seg_cnt.at[widx2].set(r_len, mode="drop")
        n_runs = jnp.sum(fit2.astype(jnp.int32))
        num_segments = num_segments + n_runs
        memflag = memflag | (n_runs_all > n_runs)
        # inherited counts: final leaves take over the stored points they own
        addi = jnp.where(fit2, r_leaf, n_cap)
        addv = jnp.where(fit2, r_len, 0)
        counter = counter.at[addi].add(addv, mode="drop")
        num_points = num_points.at[addi].add(addv, mode="drop")
        node_seg_count = node_seg_count.at[addi].add(
            jnp.where(fit2, 1, 0), mode="drop")
        # kill the split nodes' old segments; zero their stored-point counts
        seg_cnt = seg_cnt.at[jnp.where(sv, ssafe, s_cap)].set(0, mode="drop")
        num_points = num_points.at[
            jnp.where(tv, tsafe, n_cap)].set(0, mode="drop")
        node_seg_count = node_seg_count.at[
            jnp.where(tv, tsafe, n_cap)].set(0, mode="drop")
        return (seg_node, seg_off, seg_cnt, num_segments, counter, num_points,
                node_seg_count, memflag)

    small = (state.seg_node, state.seg_off, state.seg_cnt, state.num_segments,
             state.counter, state.num_points, state.node_seg_count,
             state.mem_capacity_reached)
    small = jax.lax.cond(total_spill > 0, surgery, lambda s: s, small)
    (state.seg_node, state.seg_off, state.seg_cnt, state.num_segments,
     state.counter, state.num_points, state.node_seg_count,
     state.mem_capacity_reached) = small
    return state, work, runs, spill_extra


def _interval_end_query(nx, ny, nz, level):
    """2-word query strictly greater than every Morton key inside the node.

    The node's last contained key has all suffix octant levels set to 7; its
    lexicographic successor at (w0, w1) granularity is that key with w1 + 1
    (w1 may overflow its 30 payload bits into a larger int32 — still sorts
    after every real key). Works for the flagged work keys too: callers shift
    w1 into flag space themselves."""
    shift = C.FULL_GRID_BITS - level
    w0, w1, _ = morton.encode((nx << shift) | ((1 << shift) - 1),
                              (ny << shift) | ((1 << shift) - 1),
                              (nz << shift) | ((1 << shift) - 1))
    return w0, w1 + 1


def _child_rows(work, sk0, sk1, tv, base, cnx, cny, cnz,
                clvl, t_ws, t_we, t_ss, t_se):
    """Frontier rows for the 8 children of each taken node: ids, levels, coords,
    and their work/spill stream intervals (child interval starts are 2-word
    lower bounds of the child boundary keys restricted to the parent interval;
    child 0 shares the parent's interval start)."""
    K = tv.shape[0]
    B = work.leaf.shape[0]
    rep = lambda a: jnp.repeat(a, 8)
    bw0, bw1 = boundary_key(cnx, cny, cnz, clvl)
    posw = _lower_bound2(work.k0, work.k1, bw0, bw1 << 1,
                         rep(t_ws), rep(t_we)).reshape(K, 8)
    ws = posw.at[:, 0].set(t_ws)
    we = jnp.concatenate([ws[:, 1:], t_we[:, None]], axis=1)
    poss = _lower_bound2(sk0, sk1, bw0, bw1,
                         rep(t_ss), rep(t_se)).reshape(K, 8)
    ss = poss.at[:, 0].set(t_ss)
    se = jnp.concatenate([ss[:, 1:], t_se[:, None]], axis=1)
    kid = jnp.where(tv[:, None],
                    base[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :], -1)
    return (kid.reshape(-1), clvl, cnx, cny, cnz,
            jnp.where(kid >= 0, ws, B).reshape(-1),
            jnp.where(kid >= 0, we, B).reshape(-1),
            jnp.where(kid >= 0, ss, 0).reshape(-1),
            jnp.where(kid >= 0, se, 0).reshape(-1))


def batch_voxel_candidates(cfg: EngineConfig, state: OctreeState, work: Work,
                           spill_extra=None):
    """Emit the first-in-cell voxel candidates for every inner ancestor level.

    Equivalent to the reference's voxelSampling() descent with per-node occupancy
    bitmasks (voxels.cu:417-484): sampled levels are 0..leaf_level-1, plus level 0 when
    the root is still a leaf (the root owns a sampling grid from reset, reset.cu:69).

    Key structure: in Morton order, the levels at which a point is first-in-cell form
    a CONTIGUOUS range [lo, nlev): the cell prefix at level l is the top (l + 7) bits,
    so the point emits exactly at levels where the common-prefix length with its
    predecessor is shorter than l + 7. That makes the per-candidate level a direct
    offset (no per-level loops, no bitmask walks).

    `spill_extra` (from split_loop) carries the SPILLED rows' emission columns
    (keys, src leaf, rgba, lo, cnt) — stored points of split nodes sample the
    newly inner chain [node level, final level) through the same class-sorted
    machinery as the batch.
    """
    B = work.leaf.shape[0]
    rowi = jnp.arange(B, dtype=jnp.int32)
    valid = work.valid
    nlev = jnp.maximum(work.lvl, 1)

    # common leading bits with the previous row. A junk predecessor (boundary
    # row, see Work docstring) is treated as sharing NO bits: the following
    # point may then re-emit cells its true predecessor already covered — a
    # bounded, within-batch duplicate that the store's first-arrival dedup
    # removes (stable compaction keeps the earlier append)
    prev_ok = jnp.roll(valid, 1) & (rowi != 0)
    lo = _common_prefix_lo(work.qx, work.qy, work.qz, prev_ok)
    cnt = jnp.where(valid, jnp.maximum(nlev - lo, 0), 0)

    rgba_i = jax.lax.bitcast_convert_type(work.rgba, jnp.int32).astype(jnp.int32)
    w0, w1, w2 = work.w0, work.w1, work.w2   # route already carries the words
    leaf = work.leaf
    if spill_extra is not None:
        xw0, xw1, xw2, xleaf, xrgba, xlo, xcnt = spill_extra
        w0 = jnp.concatenate([w0, xw0])
        w1 = jnp.concatenate([w1, xw1])
        w2 = jnp.concatenate([w2, xw2])
        leaf = jnp.concatenate([leaf, xleaf])
        rgba_i = jnp.concatenate([rgba_i, xrgba])
        lo = jnp.concatenate([lo, xlo])
        cnt = jnp.concatenate([cnt, xcnt])
    W2 = w0.shape[0]

    # Intra-batch candidate order is free: first-in-cell emission means each
    # (node, cell) appears AT MOST ONCE per batch, so dedup-by-store-position
    # (compaction keeps the earliest entry) is unaffected by reordering within
    # one step's appends. Split emitters by class: the common cnt == 1 rows
    # (~90%+ on scan-ordered data) emit IN PLACE with no ragged expansion at
    # all; only cnt >= 2 rows go through a narrow expansion window. This
    # replaces a full-batch marker scatter (~8 ns/attempted row) and a
    # 3B-wide row gather (~4.5 ns/row) with one class sort (~3 ns/row).
    cls = jnp.where(cnt == 1, 0, jnp.where(cnt >= 2, 1, 2)).astype(jnp.int32)
    total = jnp.sum(cnt)
    # lo/cnt (< 32 each: bounded by FULL_GRID_BITS) ride the key's low bits —
    # order within a class is free, and fewer payload columns is direct sort
    # traffic saved. When the node pool fits 19 bits the emitting leaf rides
    # the key too (cls 2b | inv-cnt 5b | leaf 19b | lo 5b = 31b): one less
    # column is ~1.5 ms at the 2.75M-row bench width. cnt sorts INVERTED right
    # after cls so the multi block comes out cnt-DESCENDING — the round-major
    # emission below depends on it.
    inv_cnt = 31 - cnt
    if cfg.node_capacity <= (1 << 19):
        safe_leaf = jnp.clip(leaf, 0, (1 << 19) - 1)
        ckey = (cls << 29) | (inv_cnt << 24) | (safe_leaf << 5) | lo
        skey, sw0, sw1, sw2, srgba = jax.lax.sort(
            (ckey, w0, w1, w2, rgba_i), num_keys=1, is_stable=False)
        sleaf = (skey >> 5) & ((1 << 19) - 1)
        scnt = 31 - ((skey >> 24) & 31)
    else:
        ckey = (cls << 10) | (inv_cnt << 5) | lo
        skey, sw0, sw1, sw2, sleaf, srgba = jax.lax.sort(
            (ckey, w0, w1, w2, leaf, rgba_i),
            num_keys=1, is_stable=False)
        scnt = 31 - ((skey >> 5) & 31)
    slo = skey & 31
    n_single = jnp.sum((cls == 0).astype(jnp.int32))
    n_multi = jnp.sum((cls == 1).astype(jnp.int32))

    # --- single-level emitters: packed at [0, n_single), level == lo ---
    # emitted as global prefix keys; no anc lookup (512-byte-row gathers from the
    # flat ancestor table measured ~17 ns/row — the node resolves at compaction)
    lvl1 = jnp.maximum(slo, 0)
    k0, k1, k2l = morton.key_words_at_level(sw0, sw1, sw2, lvl1)
    state = _append_voxels_prefix(
        cfg, state, k0, k1, k2l, sleaf,
        jax.lax.bitcast_convert_type(srgba, jnp.uint32), n_single)

    # --- multi-level emitters: round-major prefix appends ---
    # The class key sorts the multi block cnt-DESCENDING, so the cells still
    # active at round r (cnt > r) are EXACTLY the first k_r rows of the block.
    # Round r appends every active cell's level-(lo + r) key: one prefix
    # append per round, no per-output source mapping at all. This replaces the
    # ragged expansion (src scatter ~20 ns x G2W attempted rows + CCS-wide
    # cummax + 7-column row gather ~7 ns/row — together ~13 ms/2M step) with
    # max(cnt) rounds of G2W-wide elementwise work, and retires the CCS/CC2
    # output windows and their overflow drop mode: only cells past the G2W
    # block window can drop now (transient, counted, engine-adaptive).
    G2W = min(W2, cfg.cand_multi_rows or max(W2 // 4, 1024))
    grow = jnp.arange(G2W, dtype=jnp.int32)
    # G2W zero-pad so the block slice never start-clamps (n_single > W2 - G2W
    # is common on scan-ordered data where most emitters are single-level)
    pz = lambda a: jnp.concatenate([a, jnp.zeros((G2W,), a.dtype)])
    ds = lambda a: jax.lax.dynamic_slice(pz(a), (n_single,), (G2W,))
    mw0, mw1, mw2 = ds(sw0), ds(sw1), ds(sw2)
    mleaf, mlo = ds(sleaf), ds(slo)
    mrgba = jax.lax.bitcast_convert_type(ds(srgba), jnp.uint32)
    ecnt = jnp.where(grow < n_multi, ds(scnt), 0)
    total2 = jnp.sum(ecnt)
    max_cnt = jnp.max(ecnt)

    def _round(carry):
        r, vk0, vk1, vk2l, vnode, vrgba, vused, memf = carry
        k_r = jnp.sum((ecnt > r).astype(jnp.int32))
        ek0, ek1, ek2l = morton.key_words_at_level(mw0, mw1, mw2, mlo + r)
        room = jnp.maximum(cfg.voxel_capacity - vused, 0)
        n_new = jnp.minimum(k_r, room)
        dus = jax.lax.dynamic_update_slice
        return (r + 1,
                dus(vk0, ek0, (vused,)), dus(vk1, ek1, (vused,)),
                dus(vk2l, ek2l, (vused,)), dus(vnode, mleaf, (vused,)),
                dus(vrgba, mrgba, (vused,)),
                vused + n_new, memf | (k_r > room))

    (_, state.vox_k0, state.vox_k1, state.vox_k2l, state.vox_node,
     state.vox_rgba, state.vox_used, state.mem_capacity_reached) = \
        jax.lax.while_loop(
            lambda c: c[0] < max_cnt, _round,
            (jnp.int32(0), state.vox_k0, state.vox_k1, state.vox_k2l,
             state.vox_node, state.vox_rgba, state.vox_used,
             state.mem_capacity_reached))

    # overflow (multi rows past the G2W block window) is TRANSIENT: dropped
    # candidates reappear with later batches in the same cells (lazy
    # first-come dedup tolerates omission, unlike pool exhaustion)
    state.num_candidates_dropped = state.num_candidates_dropped + \
        jnp.maximum(total - n_single - total2, 0)
    return state


def insert_points(cfg: EngineConfig, state: OctreeState, work: Work, runs: Runs):
    """Bulk-append the routed batch to the point pool and register leaf segments.

    Replaces the reference's allocatePointChunks()+insertPoints() chunk walking
    (voxels.cu:485-640) with one contiguous pool write (the batch is Morton-sorted, so
    each leaf's contribution is a contiguous run = one segment), reusing the split
    loop's final run structure.
    """
    B = work.leaf.shape[0]
    n_cap = state.child_base.shape[0]
    s_cap = state.seg_node.shape[0]
    RW = runs.r_leaf.shape[0]

    # the pool receives work rows VERBATIM up to the end of the last run (junk
    # rows between runs become pool waste, bounded by the boundary directory
    # size per step — tracked so a future defrag policy has a real signal)
    rv0 = jnp.arange(RW, dtype=jnp.int32) < jnp.minimum(runs.n_runs, RW)
    span = jnp.max(jnp.where(rv0, runs.r_row + runs.r_cnt, 0))
    room = jnp.maximum(cfg.point_capacity - state.pool_used, 0)
    new_span = jnp.minimum(span, room)
    state.mem_capacity_reached = state.mem_capacity_reached | (span > room)

    # pool append (one dynamic-update-slice; rows past new_span are garbage beyond
    # the watermark and are overwritten by later appends)
    dus = jax.lax.dynamic_update_slice
    state.pt_w0 = dus(state.pt_w0, work.w0, (state.pool_used,))
    state.pt_w1 = dus(state.pt_w1, work.w1, (state.pool_used,))
    state.pt_w2 = dus(state.pt_w2, work.w2, (state.pool_used,))
    state.pt_rgba = dus(state.pt_rgba, work.rgba, (state.pool_used,))

    # segments: one per leaf run (runs are ascending by row and each run's valid
    # rows are contiguous from its start, so truncation at new_span only clips
    # the tail)
    n_runs = jnp.minimum(runs.n_runs, RW)
    state.mem_capacity_reached = state.mem_capacity_reached | (runs.n_runs > RW)
    r_start = jnp.minimum(runs.r_row, new_span)
    r_end = jnp.minimum(runs.r_row + runs.r_cnt, new_span)
    r_cnt = jnp.maximum(r_end - r_start, 0)
    rvalid = (jnp.arange(RW, dtype=jnp.int32) < n_runs) & (r_cnt > 0)

    pos = state.num_segments + jnp.arange(RW, dtype=jnp.int32)
    fit = rvalid & (pos < s_cap)
    sidx = jnp.where(fit, pos, s_cap)
    state.seg_node = state.seg_node.at[sidx].set(runs.r_leaf, mode="drop")
    state.seg_off = state.seg_off.at[sidx].set(state.pool_used + r_start, mode="drop")
    state.seg_cnt = state.seg_cnt.at[sidx].set(r_cnt, mode="drop")
    n_segs = jnp.sum(fit.astype(jnp.int32))
    state.num_segments = state.num_segments + n_segs
    state.mem_capacity_reached = state.mem_capacity_reached | jnp.any(rvalid & ~fit)

    # per-leaf bookkeeping from the run window
    addi = jnp.where(fit, runs.r_leaf, n_cap)
    addv = jnp.where(fit, r_cnt, 0)
    state.num_points = state.num_points.at[addi].add(addv, mode="drop")
    state.counter = state.counter.at[addi].add(addv, mode="drop")
    state.node_seg_count = state.node_seg_count.at[addi].add(
        jnp.where(fit, 1, 0), mode="drop")

    stored = jnp.sum(jnp.where(fit, r_cnt, 0))
    state.pool_used = state.pool_used + new_span
    state.pool_waste = state.pool_waste + (new_span - stored)
    state.num_points_processed = state.num_points_processed + stored
    state.num_points_dropped = state.num_points_dropped + (work.count - stored)
    return state


def build_step_impl(cfg: EngineConfig, state: OctreeState, x: jax.Array,
                    y: jax.Array, z: jax.Array, rgba: jax.Array,
                    count: jax.Array) -> OctreeState:
    """Ingest one batch: route -> split loop -> voxel sampling -> insert.

    Coordinates arrive as three 1-D columns (a [B,3] device array would lane-pad
    32x in HBM). The whole step is one fused jit program — the TPU analogue of one
    cooperative kernel_construct launch (XLA op boundaries are the grid.sync()s).
    """
    state, work = route(cfg, state, x, y, z, rgba, count)
    state, work, runs, spill_extra = split_loop(cfg, state, work)
    state = batch_voxel_candidates(cfg, state, work, spill_extra)
    state = insert_points(cfg, state, work, runs)
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

    The voxel-store watermark is carried DEVICE-side: when the lazy store
    crosses the compaction watermark between steps, the scan body compacts
    in-program (lax.cond — the dedup sort only runs when triggered). This is
    what lets a whole-file load ride ONE dispatch with zero host polls: the
    round-3 group loop's `int(vox_used)` readbacks between donated dispatches
    measured ~5 s each on the tunneled runtime (VERDICT r3 item 1a).
    """
    wm = jnp.int32(int(cfg.voxel_capacity * cfg.voxel_compact_watermark))

    def body(st, inp):
        bx, by, bz, bc, n = inp
        st = build_step_impl(cfg, st, bx, by, bz, bc, n)
        st = jax.lax.cond(
            st.vox_used > wm,
            lambda s: _compact_voxels_core(cfg, s, s.vox_k0.shape[0]),
            lambda s: s, st)
        return st, None

    state, _ = jax.lax.scan(
        body, state, (x_batches, y_batches, z_batches, rgba_batches, counts))
    return state


build_many = functools.partial(jax.jit, static_argnums=0,
                               donate_argnums=1)(build_many_impl)


def overfull_leaf_ids_impl(cfg: EngineConfig, state: OctreeState):
    """Leaves still over the split threshold -> (ids [max_splits_per_round]
    front-compacted, -1 padded; total count). Feeds split_finish."""
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    over = ((state.child_base < 0) & (ids < state.num_nodes)
            & (state.counter > cfg.max_points_per_node)
            & (state.level < cfg.max_depth))
    (sel,), n = compact_mask_via_sort(over, (ids,))
    K1 = cfg.max_splits_per_round
    kf = jnp.arange(K1, dtype=jnp.int32)
    return jnp.where(kf < jnp.minimum(n, K1), sel[:K1], -1), n


overfull_leaf_ids = functools.partial(jax.jit, static_argnums=0)(
    overfull_leaf_ids_impl)

# the finish pass carries no batch; a small work width keeps its program cheap
_FINISH_B = 1024


def split_finish_impl(cfg: EngineConfig, state: OctreeState,
                      force_ids: jax.Array) -> OctreeState:
    """One end-of-load split-convergence pass: split the given overfull leaves.

    The reference's expand() converges within every batch (voxels.cu:385-414);
    here round-1 budgets (max_splits_per_round / spill_capacity /
    seg_select_cap) may defer splits to later steps, and splits deferred from
    the LAST batches would otherwise never happen. This runs the normal step
    machinery on an empty batch with a forced selection; the engine loops it
    until overfull_leaf_ids is empty."""
    zf = jnp.zeros((_FINISH_B,), jnp.float32)
    zc = jnp.zeros((_FINISH_B,), jnp.uint32)
    state, work = route(cfg, state, zf, zf, zf, zc, jnp.int32(0))
    state, work, runs, spill_extra = split_loop(cfg, state, work,
                                                force_ids=force_ids)
    state = batch_voxel_candidates(cfg, state, work, spill_extra)
    state = insert_points(cfg, state, work, runs)
    return state


split_finish = functools.partial(jax.jit, static_argnums=0,
                                 donate_argnums=1)(split_finish_impl)


def _compact_voxels_core(cfg: EngineConfig, state: OctreeState,
                         w: int) -> OctreeState:
    """Sort the first `w` store rows by (level, global key), drop duplicate keys
    (first arrival wins), resolve each node GROUP's id with one anc lookup per
    group, and rebuild the per-node (vox_voff, vox_vcnt) directory + exact counts.

    This realizes the reference's first-come occupancy semantics
    (progressive_octree_voxels.cu:93-119) lazily and deterministically. Level-major
    key order groups each node's voxels contiguously (a node's voxels would
    interleave with its descendants' in plain Morton order), and within a node the
    masked key ascends exactly like the packed (cx,cy,cz) cell index.

    Cost structure (this is the single most expensive program of a bulk load —
    44% of the round-4 64M build): the (lvl 5b, k0 30b, k1 30b, cell 18b) key is
    83 bits and packs into THREE 31-bit words; the append row index rides as a
    4th sort key, making the sort unstable-but-deterministic (min row index =
    first arrival — the exact stable-sort winner) AND serving as the recovery
    handle for the columns that no longer ride the sort (rgba is gathered once
    at the end; src only at the few group-start rows). Dedup-compaction re-sorts
    the same 4 key words with duplicates sent to the tail (their relative order
    is already final, so no payload or stability is needed), and the group pass
    is an index compaction + small gathers instead of a third wide payload sort.
    18 effective wide columns -> 9 vs the round-4 version (measured 1.51 s ->
    see docs/PERFORMANCE.md round-5 table).
    """
    n_cap = state.child_base.shape[0]
    rows = jnp.arange(w, dtype=jnp.int32)
    valid = rows < state.vox_used
    mx = jnp.int32(I32_MAX)
    # pack (lvl, k0, k1, k2cell) -> (a0, a1, a2), lexicographic, each < 2^31:
    #   a0 = lvl:5 | k0[29:4]:26       a1 = k0[3:0]:4 | k1[29:3]:27
    #   a2 = k1[2:0]:3 | k2cell:18 (k2l bits 23..6; low 6 bits of the masked
    #        word are always zero for voxel levels <= 19)
    k0u = state.vox_k0[:w].astype(jnp.uint32)
    k1u = state.vox_k1[:w].astype(jnp.uint32)
    k2u = state.vox_k2l[:w].astype(jnp.uint32)
    lvl = k2u & 31
    a0 = ((lvl << 26) | (k0u >> 4)).astype(jnp.int32)
    a1 = (((k0u & 15) << 27) | (k1u >> 3)).astype(jnp.int32)
    a2 = (((k1u & 7) << 24) | (k2u & ~jnp.uint32(31))).astype(jnp.int32)
    a0 = jnp.where(valid, a0, mx)
    a1 = jnp.where(valid, a1, mx)
    a2 = jnp.where(valid, a2, mx)
    # rgba rides as the one payload (a post-hoc w-wide gather1d would
    # materialize a [w, 128] lane-select intermediate — 36 GB at the 64M
    # bench's store window; src does NOT ride: it is only read at the few
    # group-start rows, recovered through the iota key)
    sa0, sa1, sa2, siota, srgba = jax.lax.sort(
        (a0, a1, a2, rows,
         jax.lax.bitcast_convert_type(state.vox_rgba[:w], jnp.int32)),
        num_keys=4, is_stable=False)
    uniq = valid & ((sa0 != jnp.roll(sa0, 1)) | (sa1 != jnp.roll(sa1, 1))
                    | (sa2 != jnp.roll(sa2, 1)) | (rows == 0))
    # dedup compaction: unique rows' keys are already ascending AND distinct,
    # so sending duplicates to the tail with MAX keys and re-sorting the SAME
    # key words is a stable compaction (3 keys, no tiebreak needed; the
    # equal-MAX tail rows land in arbitrary order and are masked off)
    ca0, ca1, ca2, ciota, crgba_i = jax.lax.sort(
        (jnp.where(uniq, sa0, mx), jnp.where(uniq, sa1, mx),
         jnp.where(uniq, sa2, mx), jnp.where(uniq, siota, mx), srgba),
        num_keys=3, is_stable=False)
    n_uniq = jnp.sum(uniq.astype(jnp.int32))
    cvalid = rows < n_uniq

    # unpack the compacted key words (exact inverse of the packing above)
    clvl = (ca0 >> 26) & 31
    ck0 = ((ca0 & ((1 << 26) - 1)) << 4) | ((ca1 >> 27) & 15)
    ck1 = ((ca1 & ((1 << 27) - 1)) << 3) | ((ca2 >> 24) & 7)
    ck2l = (ca2 & jnp.int32(0x00FFFFC0)) | clvl
    ciota_s = jnp.where(cvalid, ciota, 0)
    crgba = jax.lax.bitcast_convert_type(crgba_i, jnp.uint32)

    # node-group boundaries: level change or node-prefix change (the node prefix is
    # the key with its 21 cell bits stripped = key masked to 3*level octant levels)
    # keep = (clvl - GRID_BITS) + GRID_BITS = exactly the node's 3*level bits
    # (negative intermediate levels clip to keep-nothing per word)
    n0, n1, n2l = morton.key_words_at_level(
        ck0, ck1, ck2l & ~31, clvl - C.GRID_BITS)
    # the level term is load-bearing: for levels < GRID_BITS the prefix masks
    # collapse (keep = level), and an ancestor/descendant pair along the all-zero
    # octant path would otherwise share a masked prefix
    gstart = cvalid & ((clvl != jnp.roll(clvl, 1)) | (n0 != jnp.roll(n0, 1))
                       | (n1 != jnp.roll(n1, 1)) | (n2l != jnp.roll(n2l, 1))
                       | (rows == 0))
    # group extraction: index compaction (1-key sort, no payloads) + gathers at
    # the few group rows; src (the emitting leaf pre-compaction, the node itself
    # post-compaction) is recovered through ciota, and anc[src, lvl] is the
    # node either way — one anc lookup per GROUP
    NW = min(n_cap, w)
    g_pos, n_groups = compact_indices(gstart)
    gi = jnp.arange(NW, dtype=jnp.int32)
    gok = gi < n_groups
    g_row = jnp.where(gok, jnp.minimum(g_pos[:NW], w - 1), 0)
    g_lvl = gather1d(clvl, g_row)
    g_src = gather1d(state.vox_node, gather1d(ciota_s, g_row))
    g_row = jnp.where(gok, g_row, w)
    g_node = gather1d(state.anc,
                      jnp.where(gok, g_src, 0) * (C.MAX_DEPTH + 1)
                      + jnp.where(gok, g_lvl, 0))
    nxt = jnp.where(gi + 1 < n_groups,
                    jnp.concatenate([g_row[1:], g_row[:1]]), n_uniq)
    g_len = jnp.where(gok, nxt - g_row, 0)

    # resolved node per row (broadcast from group starts: scatter-delta + cumsum)
    prev_node = jnp.roll(g_node, 1).at[0].set(0)
    delta = jnp.where(gok, g_node - jnp.where(gi > 0, prev_node, 0), 0)
    dacc = jnp.zeros((w,), jnp.int32).at[
        jnp.where(gok, g_row, w)].add(delta, mode="drop")
    cnode = jnp.cumsum(dacc)

    state.vox_k0, state.vox_k1, state.vox_k2l = \
        _store_prefix(state.vox_k0, ck0, cvalid, w), \
        _store_prefix(state.vox_k1, ck1, cvalid, w), \
        _store_prefix(state.vox_k2l, ck2l, cvalid, w)
    state.vox_node = _store_prefix(state.vox_node,
                                   jnp.where(cvalid, cnode, 0), cvalid, w)
    state.vox_rgba = _store_prefix(
        state.vox_rgba, jnp.where(cvalid, crgba, jnp.uint32(0)), cvalid, w)
    state.vox_used = n_uniq
    state.vox_compacted = n_uniq

    nidx = jnp.where(gok, g_node, n_cap)
    zn = jnp.zeros((n_cap,), jnp.int32)
    state.vox_voff = zn.at[nidx].set(g_row, mode="drop")
    state.vox_vcnt = zn.at[nidx].set(g_len, mode="drop")
    state.num_voxels = zn.at[nidx].set(g_len, mode="drop")
    state.mem_capacity_reached = state.mem_capacity_reached | (n_groups > NW)
    return state


def _store_prefix(col, new, cvalid, w):
    """Write the first w rows of a store column (zero-masked past the watermark)."""
    new = jnp.where(cvalid, new, jnp.zeros((), new.dtype))
    if col.shape[0] == w:
        return new
    return jax.lax.dynamic_update_slice(col, new, (0,))


def compact_voxels_impl(cfg: EngineConfig, state: OctreeState) -> OctreeState:
    """Full-capacity voxel compaction (see _compact_voxels_core)."""
    return _compact_voxels_core(cfg, state, state.vox_k0.shape[0])


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
    return _compact_voxels_core(cfg, state, w)


def compact_voxels_auto(cfg: EngineConfig, state: OctreeState,
                        min_window: int = 0,
                        used: int | None = None) -> OctreeState:
    """Host-driven compaction sized to the live store (1-8-pow2 window buckets:
    3-bit mantissa x pow2, <= 12.5% pad rows — this program is the single most
    expensive of a bulk load, and a plain pow2 bucket sorted a 67M-row window
    for the 64M bench's 35M live voxels). min_window floors the bucket so a
    caller that compacts repeatedly during a stream (the simultaneous loop's
    draw-pool cadence) reuses ONE program instead of walking the bucket ladder.
    used: the live watermark if the caller already read it back (saves the
    tunnel round trip of int(state.vox_used))."""
    if used is None:
        used = int(state.vox_used)
    v_cap = state.vox_node.shape[0]
    n = max(used, 1024)
    b = max((n - 1).bit_length() - 3, 7)
    w = ((n + (1 << b) - 1) >> b) << b
    w = min(max(w, min_window), v_cap)
    return _compact_voxels_window(cfg, state, w)


compact_voxels = functools.partial(jax.jit, static_argnums=0,
                                   donate_argnums=1)(compact_voxels_impl)
compact_segments = functools.partial(jax.jit, static_argnums=0,
                                     donate_argnums=1)(compact_segments_impl)
