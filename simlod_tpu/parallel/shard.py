"""Multi-chip octree sharding over a jax.sharding.Mesh — a NEW capability vs the
reference, which is strictly single-GPU (cuDeviceGet(&device, 0),
main_progressive_octree.cpp:274). See SURVEY.md section 2 (parallelism inventory).

Strategy: spatial data parallelism by top-level Morton brick.
  - The octree cube is divided into 8^L bricks (L = smallest level with >= n_devices
    bricks); each device owns a contiguous Morton range of bricks and builds its own
    LOCAL octree from the points routed into its bricks.
  - Batches arrive SHARDED: each device holds B/n points. Points are routed to their
    owning device with ONE all-to-all over ICI: sort the local shard by owner, slice
    n fixed-size slots, lax.all_to_all the slots (+ their counts), then compact the
    received rows. Per-chip ingest work is O(slot_factor * B / n) — it scales with
    devices instead of replicating the batch (the round-1 design masked a replicated
    batch, which kept per-chip work O(B)).
  - Per-device voxel cell sets at shared coarse levels are DISJOINT (a 128^3 sampling
    cell lies entirely inside one brick for cells below the brick level, and coarse
    cells are only sampled from a device's own points), so the union of local trees
    renders like one global tree; only coarse split *timing* differs per device, which
    shifts where the point/voxel LOD boundary sits — LOD-equivalent output.
  - Rendering composites per-device framebuffers with a depth-min reduction: the
    reference's 64-bit atomicMin depth|color (render.cu:95-99) is associative, so the
    cross-chip composite is a pmin + unique-winner psum over ICI. EDL runs on the
    composited buffer, identical to single-chip.
  - Voxel compaction and rendering are host-gated per step (do_compact / do_render),
    matching the single-chip engine's periodic-compaction policy instead of paying a
    full-store sort every step.

Slot overflow (heavily skewed batches) drops the excess points and counts them in
state.num_points_dropped — the same graceful-degradation semantics as pool
exhaustion, but transient and observable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import constants as C
from ..config import EngineConfig, Uniforms
from ..octree import build
from ..octree.structures import OctreeState, init_state
from ..ops import morton
from ..ops.segments import compact_mask_via_sort
from ..render import raster, visibility

AXIS = "bricks"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def brick_level_for(n_devices: int) -> int:
    """Smallest octree level with at least n_devices bricks."""
    level = 0
    while (8 ** level) < n_devices:
        level += 1
    return level


def init_sharded_state(cfg: EngineConfig, mesh: Mesh, box_min, box_max) -> OctreeState:
    """Per-device local octree states, stacked on a sharded leading axis."""
    n = mesh.devices.size
    base = init_state(cfg, box_min, box_max)
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(
        lambda x: jax.device_put(
            jnp.broadcast_to(x[None], (n,) + x.shape), sharding), base)


def _slot_rows(Bl: int, n: int, slot_factor: int) -> int:
    """Rows per exchange slot: slot_factor x the even share (skew headroom),
    clamped to Bl — a device can never send more rows to one destination than
    it holds, so slots beyond Bl are pure padding (at n=1 the unclamped slot
    made the exchange compact a 4x-batch window for a no-op all_to_all)."""
    return max(128, min(Bl, (slot_factor * Bl) // max(n, 1)))


def _brick_owner(qx, qy, qz, level: int, n_devices: int):
    """Device owning each point: Morton brick id scaled onto the device range."""
    bits = jnp.zeros_like(qx)
    for l in range(level):
        s = C.FULL_GRID_BITS - 1 - l
        bits = (bits << 3) | (((qx >> s) & 1) << 2) \
            | (((qy >> s) & 1) << 1) | ((qz >> s) & 1)
    n_bricks = 8 ** level
    return (bits * n_devices) // n_bricks


def _exchange(x_cols, owner, count_l, n: int, S: int):
    """All-to-all point exchange: sort the local shard by owner, slice n slots of S
    rows, swap slots across devices, return received columns + per-source counts.

    Mirrors the reference's host->device ring commit (counter-published batches,
    main_progressive_octree.cpp:1040-1050) — here the 'ring' is the ICI exchange.
    """
    Bl = owner.shape[0]
    rows = jnp.arange(Bl, dtype=jnp.int32)
    okey = jnp.where(rows < count_l, owner, n)
    sorted_all = jax.lax.sort((okey,) + tuple(x_cols), num_keys=1, is_stable=False)
    sowner, scols = sorted_all[0], sorted_all[1:]

    bounds = jnp.arange(n + 1, dtype=jnp.int32)
    offs = jnp.searchsorted(sowner, bounds, side="left").astype(jnp.int32)
    cnt = offs[1:] - offs[:-1]                       # [n] points per destination
    send_cnt = jnp.minimum(cnt, S)
    dropped = jnp.sum(cnt - send_cnt)

    # one gather per column instead of n dynamic_slices: program size stays
    # O(1) in the device count (the slice loop compiled n separate slices —
    # fine at n=8, quadratic program growth toward pod scale, VERDICT r2)
    srow_idx = offs[:n, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    srow_idx = jnp.minimum(srow_idx, Bl - 1).reshape(-1)

    def slots(col):
        return col[srow_idx].reshape(n, S)           # [n, S]

    sent = [jax.lax.all_to_all(slots(c), AXIS, 0, 0, tiled=True) for c in scols]
    recv_cnt = jax.lax.all_to_all(send_cnt, AXIS, 0, 0, tiled=True)  # [n]

    # compact received rows (slot padding interleaves) to the front
    srow = jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)
    rvalid = (srow < recv_cnt[:, None]).reshape(-1)
    flat = [c.reshape(-1) for c in sent]
    comp, my_count = compact_mask_via_sort(rvalid, tuple(flat))
    return comp, my_count, dropped


_STEP_CACHE: dict = {}
_CHUNK_CACHE: dict = {}


def _cache_key(cfg, mesh, *extra):
    return (cfg, tuple(d.id for d in mesh.devices.flat), *extra)


def build_sharded_step(cfg: EngineConfig, mesh: Mesh, width: int, height: int,
                       slot_factor: int = 4):
    """Returns a jitted sharded simultaneous step:

        (stacked_state, x, y, z, rgba, count, uniforms, do_render)
            -> (stacked_state, image, depth_bits, my_counts)

    Batch columns are SHARDED over the mesh (each device receives B/n rows; `count`
    is the global valid prefix of the [B] batch). Voxel compaction is host-gated
    via `sharded_compact` (the single-chip engine's cadence policy; a per-step
    full-store sort would dominate). The returned function exposes .recv_window
    (per-chip post-exchange work width) for scaling assertions.
    """
    key = _cache_key(cfg, mesh, width, height, slot_factor)
    if key in _STEP_CACHE:
        return _STEP_CACHE[key]
    n = mesh.devices.size
    level = brick_level_for(n)

    def local_step(state, x, y, z, rgba, count, uniforms, do_render):
        state = jax.tree.map(lambda a: jnp.squeeze(a, 0), state)
        Bl = x.shape[0]
        S = _slot_rows(Bl, n, slot_factor)
        dev = jax.lax.axis_index(AXIS).astype(jnp.int32)

        # local valid prefix of the shard (the global batch is a valid prefix)
        count_l = jnp.clip(count - dev * Bl, 0, Bl)

        qx, qy, qz = morton.quantize_cols(x, y, z, state.box_min, state.cube_size)
        owner = _brick_owner(qx, qy, qz, level, n)
        (rx, ry, rz, rc), my_count, dropped = _exchange(
            (x, y, z, rgba), owner, count_l, n, S)
        state.num_points_dropped = state.num_points_dropped + dropped
        state = build.build_step_impl(cfg, state, rx, ry, rz, rc, my_count)

        def render(state):
            vis = visibility.compute_visibility(state, uniforms)
            pts = raster.gather_point_samples(cfg, state, vis.emitted)
            vox = raster.gather_voxel_samples(cfg, state, vis.emitted)
            pts = pts._replace(valid=pts.valid & uniforms.show_points)
            vox = vox._replace(valid=vox.valid & uniforms.show_points)
            # per-chip rasterization uses the same backend gate as render_frame
            # (Pallas tile kernel on TPU, scatter path elsewhere); the cross-chip
            # composite is the associative u64-atomicMin equivalent: pmin depth,
            # unique-winner psum color
            if cfg.use_tile_raster and jax.default_backend() == "tpu":
                from ..render import raster_tiles
                color, depth = raster_tiles.rasterize_tiles(
                    cfg, uniforms, width, height, [pts, vox])
            else:
                color, depth = raster.rasterize(cfg, uniforms, width, height,
                                                [pts, vox])
            gmin = jax.lax.pmin(depth, AXIS)
            big = jnp.int32(1 << 30)
            windev = jax.lax.pmin(jnp.where(depth == gmin, dev, big), AXIS)
            is_winner = (depth == gmin) & (dev == windev)
            comp = jax.lax.psum(jnp.where(is_winner, color, jnp.uint32(0)), AXIS)
            # depth rides out for cross-BRICK composites (out-of-core); EDL
            # respects uniforms.enable_edl (off when compositing happens later)
            return raster.edl(comp, gmin, uniforms, width, height), gmin

        def no_render(state):
            # invariant across devices, like the psum/pmin-composited render output
            npx = width * height
            return (jnp.full((npx,), jnp.uint32(C.BACKGROUND_COLOR)),
                    jnp.full((npx,), jnp.int32(C.DEPTH_INF_BITS)))

        img, depth = jax.lax.cond(do_render, render, no_render, state)

        state = jax.tree.map(lambda a: a[None], state)
        return (state, img.reshape(height, width),
                depth.reshape(height, width), my_count[None])

    def step(state, x, y, z, rgba, count, uniforms, do_render=True):
        do_render = jnp.asarray(do_render, jnp.bool_)
        return shard_map(
            local_step, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(),
                      P()),
            out_specs=(P(AXIS), P(), P(), P(AXIS)),
        )(state, x, y, z, rgba, count, uniforms, do_render)

    fn = jax.jit(step, donate_argnums=0)

    class _Step:
        """Callable wrapper exposing the per-chip work width for a batch size."""

        def __call__(self, *args, **kw):
            return fn(*args, **kw)

        @staticmethod
        def recv_window(batch_rows: int) -> int:
            Bl = batch_rows // n
            return n * _slot_rows(Bl, n, slot_factor)

    _STEP_CACHE[key] = _Step()
    return _STEP_CACHE[key]


def build_sharded_chunk(cfg: EngineConfig, mesh: Mesh, slot_factor: int = 4):
    """Returns a jitted K-step sharded BUILD chunk (no render, no uniforms):

        (stacked_state, bx, by, bz, brgba, counts) -> stacked_state

    with bx.. [K, B] sharded over rows (each chip scans its [K, B/n] slice)
    and counts [K] the global valid prefixes. This is the multi-chip analogue
    of build.build_many: K exchange+build steps ride ONE dispatch via
    lax.scan, with the voxel-store watermark carried device-side (in-program
    lax.cond compaction) — the single-chip engine measured per-step dispatch
    + per-step uniforms rebuild as fatal on the tunneled runtime (VERDICT r3
    weak #6); the sharded load path gets the same dispatch shape here.
    """
    key = _cache_key(cfg, mesh, slot_factor)
    if key in _CHUNK_CACHE:
        return _CHUNK_CACHE[key]
    n = mesh.devices.size
    level = brick_level_for(n)
    wm = jnp.int32(int(cfg.voxel_capacity * cfg.voxel_compact_watermark))

    def local_chunk(state, bx, by, bz, brgba, counts):
        state = jax.tree.map(lambda a: jnp.squeeze(a, 0), state)
        dev = jax.lax.axis_index(AXIS).astype(jnp.int32)
        Bl = bx.shape[1]
        S = _slot_rows(Bl, n, slot_factor)

        def body(st, inp):
            x, y, z, rgba, count = inp
            count_l = jnp.clip(count - dev * Bl, 0, Bl)
            qx, qy, qz = morton.quantize_cols(x, y, z, st.box_min,
                                              st.cube_size)
            owner = _brick_owner(qx, qy, qz, level, n)
            (rx, ry, rz, rc), my_count, dropped = _exchange(
                (x, y, z, rgba), owner, count_l, n, S)
            st.num_points_dropped = st.num_points_dropped + dropped
            st = build.build_step_impl(cfg, st, rx, ry, rz, rc, my_count)
            st = jax.lax.cond(
                st.vox_used > wm,
                lambda s: build._compact_voxels_core(cfg, s,
                                                     s.vox_k0.shape[0]),
                lambda s: s, st)
            return st, None

        state, _ = jax.lax.scan(body, state, (bx, by, bz, brgba, counts))
        return jax.tree.map(lambda a: a[None], state)

    def chunk(state, bx, by, bz, brgba, counts):
        return shard_map(
            local_chunk, mesh=mesh,
            in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS), P(None, AXIS),
                      P(None, AXIS), P()),
            out_specs=P(AXIS))(state, bx, by, bz, brgba, counts)

    _CHUNK_CACHE[key] = jax.jit(chunk, donate_argnums=0)
    return _CHUNK_CACHE[key]


@functools.partial(jax.jit, static_argnums=(0, 1, 3), donate_argnums=2)
def _sharded_compact(cfg: EngineConfig, mesh: Mesh, state, w: int):
    def local(st):
        st = jax.tree.map(lambda a: jnp.squeeze(a, 0), st)
        st = build._compact_voxels_window(cfg, st, w)
        return jax.tree.map(lambda a: a[None], st)

    return shard_map(local, mesh=mesh, in_specs=(P(AXIS),),
                     out_specs=P(AXIS))(state)


def sharded_compact(cfg: EngineConfig, mesh: Mesh, state):
    """Host-driven windowed voxel compaction across all chips.

    The window is one pow2 bucket over the LARGEST per-chip watermark (one small
    readback; all chips run the same program, as shard_map requires)."""
    used = int(jnp.max(state.vox_used))
    v_cap = state.vox_node.shape[1]
    w = min(1 << max(10, (max(used, 1) - 1).bit_length()), v_cap)
    return _sharded_compact(cfg, mesh, state, w)


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=2)
def _sharded_finish_round(cfg: EngineConfig, mesh: Mesh, state):
    """One per-chip forced split pass; returns pre-pass overfull counts [n].

    Each chip selects its own overfull leaves (local octrees are independent —
    no collectives needed); chips already converged run the pass with an all
    -1 selection, which is a no-op (split_finish masks id < 0)."""
    def local(st):
        st = jax.tree.map(lambda a: jnp.squeeze(a, 0), st)
        ids, n = build.overfull_leaf_ids_impl(cfg, st)
        st = build.split_finish_impl(cfg, st, ids)
        return jax.tree.map(lambda a: a[None], st), n[None]

    # check_vma off: the pass is purely chip-local (no collectives), but its
    # empty-batch constants trip the varying-axes inference inside the
    # builder's while_loops
    return shard_map(local, mesh=mesh, in_specs=(P(AXIS),),
                     out_specs=(P(AXIS), P(AXIS)), check_vma=False)(state)


def sharded_finish_splits(cfg: EngineConfig, mesh: Mesh, state,
                          max_rounds: int = 32):
    """End-of-load split convergence across all chips (the sharded analogue of
    Engine.finish_splits): loop per-chip forced splits until NO chip has an
    overfull leaf. The sharded step defers splits under the same round-1
    budgets as the single-chip step, so skipping this diverges the sharded
    tree from the single-chip result on dense/clustered tails."""
    for _ in range(max_rounds):
        state, n = _sharded_finish_round(cfg, mesh, state)
        if int(jnp.max(n)) == 0:
            break
    return state
