"""Octree device data model: dense capacity-padded arrays with watermark counters.

The reference's device model is pointer-based: a linked `Node` tree with 16 KB chunk
linked lists and a device-side bump allocator (structures.cuh:62-102, utils.h.cu:180-227).
None of that is expressible or fast in XLA. The TPU-native equivalent used here:

  - Node pool: SoA int32 arrays indexed by node id. Children are always allocated as a
    contiguous block of 8 (the reference does the same: `atomicAdd(&numNodes, 8)`,
    progressive_octree_voxels.cu:317), so one `child_base` index replaces 8 pointers and
    descent is a single gather: child = child_base[n] + octant; child_base < 0 == leaf.
  - Ancestor table: anc[n, l] = ancestor of node n at level l (n itself for l >= level).
    Immutable once a node is created; lets the builder resolve "which inner node does
    this point sample a voxel in at level l" with one gather instead of a pointer walk.
  - Point pool: flat SoA (xyz, rgba) appended in bulk, addressed by *segments*
    (node, offset, count) — each segment is one step's Morton-sorted contribution to one
    leaf. This replaces chunk linked lists; splits mark a node's segments dead and
    respill its points, with periodic defragmentation reclaiming dead slots (the
    reference recycles chunks through a queue instead, voxels.cu:346-357).
  - Voxel store: flat SoA keyed by GLOBAL Morton-prefix cell identity
    (k0, k1, k2|level = ops/morton.key_words_at_level): a level-l voxel cell is the
    top 3*(l+7) bits of the point's 84-bit code, so emission needs NO node lookup at
    all (the 512-byte-row anc gathers this replaces cost ~17 ns/row on v5e). Node ids
    are resolved once per node GROUP at compaction, which sorts by (level, key),
    dedups (first arrival wins, matching the reference's first-come atomicOr
    semantics, progressive_octree_voxels.cu:93-119), and rebuilds the per-node
    (vox_voff, vox_vcnt) directory. Rows [0, vox_compacted) are (level, key)-sorted
    with vox_node resolved; the append-only tail carries the emitting leaf in
    vox_node (any descendant works: anc[leaf, l] == anc[node, l]). This replaces
    the 256 KB/node occupancy bitmaps, which do not scale on HBM.

All capacities are static (EngineConfig); "allocation" is a watermark increment, exactly
the role of the reference's AllocatorGlobal (utils.h.cu:180-227) but data-race-free.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import EngineConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OctreeState:
    """The complete device-resident engine state (one pytree)."""

    # --- node pool (SoA, [node_capacity]) ---
    child_base: jax.Array      # i32; id of first of 8 children, or -1 if leaf
    parent: jax.Array          # i32; -1 for root
    level: jax.Array           # i32
    nx: jax.Array              # i32 node coords at its level (reference Node::X/Y/Z)
    ny: jax.Array
    nz: jax.Array
    counter: jax.Array         # i32; points ever routed while leaf (reference Node::counter)
    num_points: jax.Array      # i32; points stored (leaves)
    num_voxels: jax.Array      # i32; voxels attributed (approximate until compaction)
    node_seg_count: jax.Array  # i32; live segments owned by the node (split budgeting)
    anc: jax.Array             # i32 [node_capacity * (MAX_DEPTH+1)] flat ancestor table
                               # (flat: narrow 2-D arrays lane-pad 128x in TPU HBM)
    num_nodes: jax.Array       # i32 scalar watermark

    # --- point pool (1-D columns; see ops/ragged.py for why not [P,4]) ---
    # Positions are stored as the three 28-bit-per-axis Morton WORDS, not
    # floats: the words are exactly the route/spill sort keys and the voxel
    # key prefixes, so spilled points re-route bit-identically with zero
    # re-quantization, and the route sort carries one word column instead of
    # three f32 columns. World positions reconstruct via morton.decode +
    # morton.dequantize_cols (cell centers; finer than f32 resolution over
    # most of the cube — see dequantize_cols).
    pt_w0: jax.Array           # i32 [point_capacity + pad] Morton word 0
    pt_w1: jax.Array           # i32 word 1
    pt_w2: jax.Array           # i32 word 2
    pt_rgba: jax.Array         # u32
    pool_used: jax.Array       # i32 scalar watermark
    pool_waste: jax.Array      # i32 scalar: junk rows appended between segments
                               # (interleaved boundary rows; see build.Work)

    # --- leaf-boundary directory (1-D columns, [node_capacity]) ---
    # Sorted Morton interval starts of the active leaves; route() merges the point
    # batch against rows [0, num_boundaries). Splits append the 8 child boundaries
    # (the parent's row goes stale but stays: child 0 shares its key and, being
    # appended later, wins the stable sort tie, so the stale row is never carried).
    b_key0: jax.Array          # i32 morton word 0 (levels 0..9)
    b_key1: jax.Array          # i32 morton word 1 (levels 10..19) — NOT shifted
    b_pack: jax.Array          # i32 leaf_id * 32 + level
    num_boundaries: jax.Array  # i32 scalar watermark

    # --- segment directory (1-D columns) ---
    seg_node: jax.Array        # i32 [segment_capacity]; -1 = never used
    seg_off: jax.Array         # i32
    seg_cnt: jax.Array         # i32; 0 = dead
    num_segments: jax.Array    # i32 scalar watermark

    # --- voxel store (1-D columns) ---
    vox_k0: jax.Array          # i32 [voxel_capacity + pad] global key word 0
    vox_k1: jax.Array          # i32 key word 1
    vox_k2l: jax.Array         # i32 key word 2 | level (morton.key_words_at_level)
    vox_node: jax.Array        # i32 emitting leaf (tail) / resolved node (compacted)
    vox_rgba: jax.Array        # u32
    vox_used: jax.Array        # i32 scalar watermark (compacted + tail)
    vox_compacted: jax.Array   # i32 scalar: rows [0, vox_compacted) are sorted+deduped
    vox_voff: jax.Array        # i32 [node_capacity] per-node row offset (compacted)
    vox_vcnt: jax.Array        # i32 [node_capacity] per-node voxel count (compacted)

    # --- octree domain (fixed at reset; reference Uniforms boxMin/boxMax) ---
    box_min: jax.Array         # f32 [3]
    cube_size: jax.Array       # f32 scalar (max extent; the octree cube is cubical)

    # --- bookkeeping ---
    num_points_processed: jax.Array  # i32
    num_points_dropped: jax.Array    # i32
    # transient per-step candidate-window overflow (dropped voxel candidates reappear
    # with later batches; distinct from pool exhaustion — see ADVICE round 1)
    num_candidates_dropped: jax.Array  # i32
    mem_capacity_reached: jax.Array  # bool

    def pt_positions(self):
        """Decoded world positions (x, y, z) f32 columns (not hot-path)."""
        from ..ops import morton
        qx, qy, qz = morton.decode(self.pt_w0, self.pt_w1, self.pt_w2)
        return morton.dequantize_cols(qx, qy, qz, self.box_min, self.cube_size)

    @property
    def pt_xyz(self) -> jax.Array:
        """[P,3] view for host-side inspection/tests (materializes; not hot-path)."""
        return jnp.stack(self.pt_positions(), axis=-1)


def init_state(cfg: EngineConfig, box_min, box_max) -> OctreeState:
    """Create the initial single-root state (the reference's reset.cu kernel).

    `box_min`/`box_max` are the dataset bounds; the octree domain is the cube with
    edge max(extent) anchored at box_min (reference render.cu:1137-1140 cubeSize/cubeMin).
    """
    n_cap = cfg.node_capacity
    # Padded pools so bulk appends can write a full static window past the watermark;
    # rounded so the aligned-row-gather views ([P/32,128] / [V/64,128]) tile exactly.
    rnd = lambda v, m: ((v + m - 1) // m) * m
    p_cap = rnd(cfg.point_capacity + cfg.working_capacity, 128)
    v_cap = rnd(cfg.voxel_capacity + _cand_capacity(cfg), 128)

    box_min = jnp.asarray(box_min, jnp.float32)
    box_max = jnp.asarray(box_max, jnp.float32)
    cube_size = jnp.max(box_max - box_min).astype(jnp.float32)

    i32 = jnp.int32
    zeros_n = lambda: jnp.zeros((n_cap,), i32)
    neg_n = lambda: jnp.full((n_cap,), -1, i32)

    anc = jnp.zeros((n_cap * (C.MAX_DEPTH + 1),), i32)

    return OctreeState(
        child_base=neg_n(), parent=neg_n(), level=zeros_n(),
        nx=zeros_n(), ny=zeros_n(), nz=zeros_n(),
        counter=zeros_n(), num_points=zeros_n(), num_voxels=zeros_n(),
        node_seg_count=zeros_n(),
        anc=anc,
        num_nodes=jnp.asarray(1, i32),
        b_key0=zeros_n(), b_key1=zeros_n(), b_pack=zeros_n(),
        num_boundaries=jnp.asarray(1, i32),  # the root leaf (keys 0,0; pack 0)
        pt_w0=jnp.zeros((p_cap,), jnp.int32),
        pt_w1=jnp.zeros((p_cap,), jnp.int32),
        pt_w2=jnp.zeros((p_cap,), jnp.int32),
        pt_rgba=jnp.zeros((p_cap,), jnp.uint32),
        pool_used=jnp.asarray(0, i32),
        pool_waste=jnp.asarray(0, i32),
        seg_node=jnp.full((cfg.segment_capacity,), -1, i32),
        seg_off=jnp.zeros((cfg.segment_capacity,), i32),
        seg_cnt=jnp.zeros((cfg.segment_capacity,), i32),
        num_segments=jnp.asarray(0, i32),
        vox_k0=jnp.zeros((v_cap,), i32),
        vox_k1=jnp.zeros((v_cap,), i32),
        vox_k2l=jnp.zeros((v_cap,), i32),
        vox_node=jnp.zeros((v_cap,), i32),
        vox_rgba=jnp.zeros((v_cap,), jnp.uint32),
        vox_used=jnp.asarray(0, i32), vox_compacted=jnp.asarray(0, i32),
        vox_voff=jnp.zeros((n_cap,), i32),
        vox_vcnt=jnp.zeros((n_cap,), i32),
        box_min=box_min, cube_size=cube_size,
        num_points_processed=jnp.asarray(0, i32),
        num_points_dropped=jnp.asarray(0, i32),
        num_candidates_dropped=jnp.asarray(0, i32),
        mem_capacity_reached=jnp.asarray(False, jnp.bool_),
    )


def _cand_capacity(cfg: EngineConfig) -> int:
    """Voxel-store physical padding: must cover the LARGEST single append window so
    the contiguous watermark writes in build._append_voxels stay in bounds
    (vox_used itself never exceeds cfg.voxel_capacity)."""
    from ..ops import ragged
    spill_window = ragged.window_for(cfg.spill_capacity, cfg.seg_select_cap)
    # append windows: the single-level candidate append is full Work-width
    # (batch + interleaved boundary junk, build.Work), NOT step_points wide —
    # undersizing here lets near-capacity appends clamp the
    # dynamic_update_slice start and overwrite committed store rows (ADVICE
    # r2). The round-major multi-level appends are G2W wide (<= cand_width).
    work_width = cfg.step_points + min(cfg.boundary_window, cfg.node_capacity)
    # spilled rows ride the same class-sorted emission as the batch, so the
    # candidate stream (and its append windows) is work + spill wide
    cand_width = work_width + spill_window
    return max(cand_width, spill_window) + 256


def node_min_size(state: OctreeState, ids=None):
    """World-space node AABB min corner and edge length for node ids (defaults: all)."""
    if ids is None:
        nx, ny, nz, lvl = state.nx, state.ny, state.nz, state.level
    else:
        nx, ny, nz, lvl = state.nx[ids], state.ny[ids], state.nz[ids], state.level[ids]
    size = state.cube_size / jnp.exp2(lvl.astype(jnp.float32))
    mn = state.box_min[None, :] + size[:, None] * jnp.stack(
        [nx, ny, nz], axis=-1).astype(jnp.float32)
    return mn, size


def is_leaf(state: OctreeState) -> jax.Array:
    return state.child_base < 0


def active_mask(state: OctreeState) -> jax.Array:
    return jnp.arange(state.child_base.shape[0], dtype=jnp.int32) < state.num_nodes
