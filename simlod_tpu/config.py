"""Typed configuration for the engine.

The reference scatters its knobs across three tiers (compile-time constants in
structures.cuh:21-28 and main_progressive_octree.cpp:35-38, the ImGui-bound `settings`
struct at main_progressive_octree.cpp:123-139, and the per-frame `Uniforms` ABI at
HostDeviceInterface.h:10-44). Here all three are promoted to typed dataclasses with the
same knob names.

  - EngineConfig : capacities and step sizing (static; baked into jit traces)
  - Settings     : interactive render/LOD knobs (mirrors reference `settings`)
  - Uniforms     : per-frame values passed into the jitted step
  - Stats        : device-computed counters pytree (mirrors HostDeviceInterface.h:46-71)
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import constants as C


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static capacities. Changing any of these re-traces the jitted step.

    The reference sizes these buffers at startup (main_progressive_octree.cpp:560-586);
    XLA needs them static, so they live here with watermark counters in state.
    """

    # Octree capacities
    node_capacity: int = 1 << 20          # node pool (reference: 200k nodes, :564)
    point_capacity: int = 64 << 20        # point pool entries
    voxel_capacity: int = 64 << 20        # voxel store entries (incl. lazy duplicates)
    segment_capacity: int = 1 << 22       # point-segment directory entries

    # Per-step sizing
    step_points: int = 2 << 20            # points ingested per jitted step (batch budget;
                                          # analogue of the reference's "<=20 batches x 1M
                                          # per 10ms frame", progressive_octree_voxels.cu:883)
    spill_capacity: int = 4 << 20         # spilled-point working buffer per step
                                          # (reference: 10M scratch, voxels.cu:846)
    max_splits_per_round: int = 1024      # round-1 split selection budget per step,
                                          # and the total cascade budget
                                          # (reference: 100k spillingNodes scratch, :843)
    cascade_splits_per_round: int = 256   # frontier nodes split per cascade round
                                          # (bounded by live over-capacity nodes,
                                          # <= points-per-step / leaf capacity)
    seg_select_cap: int = 4096            # segments subdivided per split-loop round
    seg_scan_window: int = 1 << 18        # directory rows scanned for spill selection
                                          # (engine compacts segments before the live
                                          # count outgrows this; overflow flags)
                                          # (also sizes the spill gather window's
                                          # per-segment alignment padding)
    run_window: int = 1 << 17             # per-step leaf-run window (distinct leaves
                                          # touched per step; overflow sets the flag)
    boundary_window: int = 1 << 17        # leaf-boundary directory rows merged by
                                          # route(); must cover the live leaf count
                                          # (incl. stale split rows; overflow flags)
    split_rounds: int = 24                # max split-loop rounds per step (reference caps
                                          # expand() at 20 iterations, voxels.cu:394)
    steps_per_dispatch: int = 4           # step batches fused into one build_many
                                          # dispatch by Engine.ingest_next (host
                                          # round-trips amortize over the chunk)
    max_batches_per_frame: int = 20       # frame-budget ceiling (reference consumes
                                          # <=20 ring batches/frame, voxels.cu:883)

    # Octree parameters (reference structures.cuh:21-26)
    max_points_per_node: int = C.MAX_POINTS_PER_NODE
    max_depth: int = C.MAX_DEPTH

    # Rasterizer backend: tile-binned sort-based Pallas kernel on TPU (see
    # render/raster_tiles.py); the scatter path is used on other backends.
    use_tile_raster: bool = True
    # Pixel-sort tiebreak: True reproduces the reference's exact u64 atomicMin
    # winner (min depth THEN min color, render.cu:95-99) by sorting a 3rd
    # color-key column. False demotes color to a payload — the winner's DEPTH
    # is still exact (HQS output identical); only equal-(pixel,depth) color
    # ties resolve arbitrarily, in exchange for a cheaper comparator.
    raster_exact_tiebreak: bool = True

    # Screen-budgeted decimation (render/drawpool.py): per-node rows stored in
    # the draw pool. Nodes with more samples than this keep the exact
    # primary-pool path, so any draw_cap is lossless when the budget clears
    # the node's sample count. Multiple of 128 (pool rows stay lane-aligned).
    # MUST clear max_points_per_node (50k): full leaves are the common case on
    # dense data, and a cap below their occupancy routes them all to the
    # exact path — measured at the 64M bench view, a 16384 cap left ~80% of
    # the frame's samples undecimated. Inner nodes on steep terrain hold up
    # to ~200k voxels (128^2 surface cells x slope factor), so the cap sits
    # above that; nodes beyond it (near-root inner nodes) are never emitted
    # by the LOD rule anyway (they are 'large', so their children draw).
    draw_cap: int = 1 << 18

    # Render capacities
    max_render_points: int = 8 << 20      # visible point samples per frame (padded)
    max_render_voxels: int = 8 << 20      # visible voxel samples per frame (padded)
    max_render_lines: int = 1 << 16       # line-list capacity (reference: 1M verts, render.cu:1120)
    line_steps: int = 128                 # max 1-px DDA samples per line segment
                                          # (reference clamps at 400, rasterization.cuh:149)
    max_point_size: int = 1               # static unroll bound for settings.point_size

    # Kept for config compatibility; the round-major candidate emission has no
    # output expansion window any more (build.batch_voxel_candidates), so this
    # no longer sizes anything.
    candidate_factor: int = 3
    # Rows of the batch allowed to emit candidates at MULTIPLE levels per step
    # (the cnt-descending block window in build.batch_voxel_candidates;
    # single-level emitters — the vast majority on scan-ordered data — emit in
    # place with no block slice). 0 = auto (batch/4). A too-small window drops
    # candidates that only "reappear" if later batches revisit the cell —
    # watch num_candidates_dropped (the engine auto-doubles this under
    # sustained drops).
    cand_multi_rows: int = 1 << 18

    # Voxel-store lazy-dedup compaction trigger: compact when the store holds more
    # than this fraction of voxel_capacity (near-capacity-only policy; renders
    # that need an exact CSR force-compact regardless). The remaining headroom
    # must absorb the raw appends between two engine capacity polls.
    voxel_compact_watermark: float = 0.6

    @property
    def working_capacity(self) -> int:
        # the pool append window is the full routed batch width (points +
        # interleaved boundary junk, build.Work), hence + boundary_window
        return self.step_points + self.spill_capacity + self.boundary_window

    def estimated_state_bytes(self) -> int:
        """Device bytes of the persistent OctreeState this config allocates
        (structures.init_state): point pool 16 B/row, voxel store 20 B/row,
        node arrays ~144 B/node (15 i32 columns + the 21-level ancestor
        table), segments 12 B/row."""
        from .octree.structures import _cand_capacity
        pt = (self.point_capacity + self.working_capacity) * 16
        vx = (self.voxel_capacity + _cand_capacity(self)) * 20
        nd = self.node_capacity * 4 * (15 + C.MAX_DEPTH + 1)
        sg = self.segment_capacity * 12
        return pt + vx + nd + sg

    @classmethod
    def auto(cls, total_points: int | None = None, device=None,
             memory_bytes: int | None = None, **overrides) -> "EngineConfig":
        """Derive pool capacities from device memory and the dataset size.

        The reference sizes its persistent buffer to 80% of free VRAM at init
        (main_progressive_octree.cpp:580-586); here capacities are static jit
        shapes, so they are derived once per load instead: the point pool
        covers the stream, the voxel store covers the worst-case live voxel
        count (~1 voxel/point on surface scans), and the whole state is kept
        under ~45% of device memory — the rest is XLA scratch headroom (the
        compaction sort's working set alone is ~2.4x the voxel store).
        Datasets that exceed memory get a clamped point pool; the engine's
        watermarks then stop ingestion with mem_capacity_reached, the same
        degradation the reference shows when VRAM runs out.
        """
        budget = memory_bytes
        if budget is None:
            budget = _device_memory_bytes(device)
        state_budget = int(budget * 0.45)
        if total_points is None:
            # no stream known: assume the state budget splits like a
            # just-fits dataset at ~36 combined bytes/point
            total_points = max(state_budget // 36, 1 << 22)
        n = int(total_points)

        def bucket(v: int) -> int:   # 1-8-pow2 (<= 12.5% pad steps)
            v = max(v, 1024)
            b = max((v - 1).bit_length() - 3, 0)
            return ((v + (1 << b) - 1) >> b) << b

        kw: dict = dict(
            step_points=2 << 20,
            spill_capacity=1 << 20,
            seg_select_cap=2048,
            node_capacity=(1 << 19) if n >= 16_000_000 else (1 << 17),
            segment_capacity=min(max(bucket(n // 32), 1 << 16), 1 << 22),
            point_capacity=n + (1 << 20),
            voxel_capacity=max(bucket(n), 1 << 22),
            max_render_points=4 << 20,
            max_render_voxels=4 << 20,
        )
        kw.update(overrides)
        cfg = cls(**kw)
        # shrink the two big pools until the state fits the budget (files
        # larger than device memory load until the watermark flags capacity)
        while cfg.estimated_state_bytes() > state_budget \
                and cfg.point_capacity > (1 << 22):
            kw["point_capacity"] = max(kw["point_capacity"] // 2, 1 << 22)
            kw["voxel_capacity"] = max(kw["voxel_capacity"] // 2, 1 << 22)
            kw.update(overrides)
            cfg = cls(**kw)
        return cfg


def _device_memory_bytes(device=None) -> int:
    """Free device memory, best effort. The tunneled TPU attachment reports no
    memory_stats(); fall back to the v5e/v5p floor (16 GB HBM)."""
    try:
        import jax
        if device is None:
            device = jax.devices()[0]
        stats = device.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
        if device.platform == "tpu":
            return 16 << 30
    except Exception:
        pass
    try:   # CPU backend (tests): half of physical RAM
        import os
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // 2
    except (ValueError, OSError, AttributeError):
        return 8 << 30


@dataclasses.dataclass
class Settings:
    """Interactive knobs (reference: main_progressive_octree.cpp:123-139)."""

    use_high_quality_shading: bool = True
    show_bounding_box: bool = False
    do_update_visibility: bool = True
    show_points: bool = True
    color_by_node: bool = False
    color_by_lod: bool = False
    color_white: bool = False
    auto_focus_on_load: bool = True
    benchmark_rendering: bool = False
    lod: float = 0.2
    min_node_size: float = 64.0
    point_size: int = 1
    fovy: float = 60.0
    # host analogue of the construct kernel's 10 ms self-limit
    # (progressive_octree_voxels.cu:22,939-949): target wall-clock per frame used
    # to adapt batches-per-frame; <= 0 pins one batch per frame
    frame_budget_ms: float = 50.0
    enable_edl: bool = True
    # The reference GUI default is 0.8 (main...cpp:138) but the kernel hard-codes 0.4
    # (render.cu:1290); we honour the uniform and default to the kernel's effective value.
    edl_strength: float = 0.4
    # Samples drawn per covered pixel per node (render/drawpool.py): a node's
    # frame budget is point_budget * dx * dy of its screen extent; nodes under
    # budget draw exactly. 0 disables decimation entirely — every stored
    # sample of every emitted node is drawn, the reference's semantics
    # (render.cu:161-634). The TPU rasterizer's cost scales with drawn
    # samples (sort + kernel, not hardware-atomic overdraw), so the viewer
    # and bench default this ON (1.0).
    point_budget: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Uniforms:
    """Per-frame values handed to the jitted step (reference: HostDeviceInterface.h:10-44).

    Matrices are row-major [4,4] float32 acting on column vectors, exactly like the
    reference's `uniforms.transform * float4` (getUniforms transposes GLM's column-major
    storage for the same effect, main_progressive_octree.cpp:283-297).
    """

    width: jax.Array                      # f32 scalar
    height: jax.Array                     # f32 scalar
    transform: jax.Array                  # [4,4] f32: proj @ view @ world
    transform_update_bound: jax.Array     # frozen copy while !doUpdateVisibility
    # render flags / knobs as jnp scalars so settings changes don't retrace
    show_bounding_box: jax.Array          # bool
    show_points: jax.Array                # bool
    color_by_node: jax.Array              # bool
    color_by_lod: jax.Array               # bool
    color_white: jax.Array                # bool
    use_high_quality_shading: jax.Array   # bool
    lod: jax.Array                        # f32
    min_node_size: jax.Array              # f32
    point_size: jax.Array                 # i32
    enable_edl: jax.Array                 # bool
    edl_strength: jax.Array               # f32
    point_budget: jax.Array               # f32 samples/covered-pixel; 0 = exact

    @staticmethod
    def make(width: int, height: int, transform, transform_update_bound=None,
             settings: Settings | None = None) -> "Uniforms":
        s = settings or Settings()
        transform = jnp.asarray(transform, jnp.float32)
        if transform_update_bound is None:
            transform_update_bound = transform
        f32 = partial(jnp.asarray, dtype=jnp.float32)
        b = partial(jnp.asarray, dtype=jnp.bool_)
        return Uniforms(
            width=f32(width), height=f32(height),
            transform=transform,
            transform_update_bound=jnp.asarray(transform_update_bound, jnp.float32),
            show_bounding_box=b(s.show_bounding_box),
            show_points=b(s.show_points),
            color_by_node=b(s.color_by_node),
            color_by_lod=b(s.color_by_lod),
            color_white=b(s.color_white),
            use_high_quality_shading=b(s.use_high_quality_shading),
            lod=f32(s.lod), min_node_size=f32(s.min_node_size),
            point_size=jnp.asarray(s.point_size, jnp.int32),
            enable_edl=b(s.enable_edl), edl_strength=f32(s.edl_strength),
            point_budget=f32(s.point_budget),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Stats:
    """Device-side counters pytree (reference: HostDeviceInterface.h:46-71).

    Returned from the jitted step and polled host-side, replacing the reference's
    pinned-memory async Stats download (main_progressive_octree.cpp:1201-1204).
    """

    num_nodes: jax.Array
    num_inner: jax.Array
    num_leaves: jax.Array
    num_nonempty_leaves: jax.Array
    num_points: jax.Array
    num_voxels: jax.Array                 # logical voxel count (sum over nodes)
    num_voxels_stored: jax.Array          # physical store entries incl. lazy duplicates
    num_visible_nodes: jax.Array
    num_visible_inner: jax.Array
    num_visible_leaves: jax.Array
    num_visible_points: jax.Array
    num_visible_voxels: jax.Array
    num_points_processed: jax.Array
    num_points_dropped: jax.Array         # overflow guard drops (capacity semantics)
    num_candidates_dropped: jax.Array     # transient voxel-candidate window overflows
    pool_used: jax.Array
    num_segments: jax.Array
    mem_capacity_reached: jax.Array       # bool (reference: voxels.cu:896-912)
    render_truncated: jax.Array           # bool: last frame dropped visible samples

    @staticmethod
    def zeros() -> "Stats":
        z = jnp.zeros((), jnp.int32)
        return Stats(
            num_nodes=z + 1, num_inner=z, num_leaves=z + 1, num_nonempty_leaves=z,
            num_points=z, num_voxels=z, num_voxels_stored=z,
            num_visible_nodes=z, num_visible_inner=z, num_visible_leaves=z,
            num_visible_points=z, num_visible_voxels=z,
            num_points_processed=z, num_points_dropped=z,
            num_candidates_dropped=z,
            pool_used=z, num_segments=z,
            mem_capacity_reached=jnp.zeros((), jnp.bool_),
            render_truncated=jnp.zeros((), jnp.bool_),
        )
