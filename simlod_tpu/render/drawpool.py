"""Screen-budgeted sample decimation: the draw pool.

The reference draws EVERY stored point of every emitted leaf and every voxel of
every emitted inner node (render.cu:161-634) — at a whole-dataset view that is
10-20 MILLION point samples into ~2M covered pixels, pure overdraw the 4090
brute-forces through hardware atomics. The TPU rasterizer's cost is
sort+matmul over the sample window (docs/PERFORMANCE.md cost model), so frame
cost must be proportional to SCREEN COVERAGE, not point count.

The draw pool makes any per-node sample budget a O(1) slice:

  - per node, a contiguous copy of its samples (leaf points; inner-node
    voxels) ordered by a HASH of the sample's Morton words. Hash order makes
    EVERY PREFIX of a node's range a deterministic uniform spatial subsample
    (the Potree/progressive-rendering shuffled-order trick), so "draw k of n"
    is a ragged prefix gather at aligned-row cost (~0.05 ns/element) — no
    per-sample stride gathers (7 ns/row), no render-time shuffling.
  - per-node storage is capped at cfg.draw_cap rows; nodes bigger than the
    cap keep their exact path: LARGE emitted leaves (screen extent above the
    2*minNodeSize threshold, the close-up regime) always render their full
    point set from the primary pool.
  - at render time visibility computes budget = point_budget * dx * dy
    (samples ~ covered pixels, uniforms.point_budget is a Settings knob;
    0 disables decimation entirely = exact reference semantics), and the
    gather uses min(stored, budget) per node.

Rebuild policy: the pool derives from (segments, voxel CSR), so the engine
rebuilds it on its compaction cadence / before post-load renders; during
streaming the current pool keeps rendering (new points appear with the next
rebuild — bounded staleness, the same cadence the voxel CSR already has).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig
from ..octree.structures import OctreeState
from ..ops import ragged
from ..ops.fastops import gather1d

I32_MAX = jnp.iinfo(jnp.int32).max


class DrawPool(NamedTuple):
    """Per-node hash-ordered sample copies + CSR directories ([NW] node cols)."""
    pt_off: jax.Array      # [NW] i32
    pt_cnt: jax.Array      # [NW] i32 (min(node points, draw_cap))
    p_w0: jax.Array        # [PC] Morton words + color of the copied points
    p_w1: jax.Array
    p_w2: jax.Array
    p_rgba: jax.Array      # u32
    vx_off: jax.Array      # [NW] i32
    vx_cnt: jax.Array      # [NW] i32 (min(node voxels, draw_cap))
    v_k0: jax.Array        # [VC] global prefix keys + color of copied voxels
    v_k1: jax.Array
    v_k2l: jax.Array
    v_rgba: jax.Array      # u32


def _hash2(a: jax.Array, b: jax.Array) -> jax.Array:
    """32-bit mix of two words (fxhash-style multiply-xor; determinism is the
    point — the same node always yields the same prefix ordering)."""
    h = (a.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)) ^ \
        (b.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0xC2B2AE35)
    return jax.lax.bitcast_convert_type(h ^ (h >> 13), jnp.int32)


def _node_ranges(snode: jax.Array, total: jax.Array, node_window: int):
    """Per-node (start, count) of the node-sorted stream via searchsorted over
    the live node-id window (node ids ascend after the sort)."""
    q = jnp.arange(node_window + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(snode, q, side="left").astype(jnp.int32)
    pos = jnp.minimum(pos, total)
    return pos[:-1], pos[1:] - pos[:-1]


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7))
def build_draw_pool(cfg: EngineConfig, state: OctreeState, pool_window: int,
                    vox_window: int, node_window: int, cap: int,
                    pc: int | None = None, vc: int | None = None) -> DrawPool:
    """Build both draw pools (points + voxels) from the current state.

    pool_window/vox_window are pow2 buckets >= the live watermarks (engine
    picks them; a window smaller than the live data only truncates the copy —
    counts clamp). node_window >= num_nodes. cap = cfg.draw_cap. pc/vc size
    the output copies (engine: sum of per-node min(cnt, cap) + plan padding);
    default cap*node_window clamped to the input windows.
    """
    n_cap = state.child_base.shape[0]
    NW = min(node_window, n_cap)

    # --- leaf points: gather all live segments, sort by (node, hash) ---
    sn = state.seg_node
    ok = (state.seg_cnt > 0) & (sn >= 0)
    counts = jnp.where(ok, state.seg_cnt, 0)
    offs = jnp.where(ok, state.seg_off, 0)
    p = ragged.plan(offs, counts, pool_window)
    gw0 = ragged.gather_column(p, state.pt_w0)
    gw1 = ragged.gather_column(p, state.pt_w1)
    gw2 = ragged.gather_column(p, state.pt_w2)
    grgba = ragged.gather_column(p, jax.lax.bitcast_convert_type(
        state.pt_rgba, jnp.float32))
    gnode = jnp.where(p.valid, ragged.broadcast_i32(p, jnp.clip(sn, 0, n_cap)),
                      NW)
    gnode = jnp.where(gnode < NW, gnode, NW)   # out-of-window nodes drop
    h = _hash2(gw0 ^ gw2, gw1)
    snode, _, sw0, sw1, sw2, srgba = jax.lax.sort(
        (gnode, h, gw0, gw1, gw2, grgba), num_keys=2, is_stable=False)
    total_p = jnp.sum((gnode < NW).astype(jnp.int32))
    nstart, ncnt = _node_ranges(snode, total_p, NW)
    pt_cnt = jnp.minimum(ncnt, cap)
    # prefix gather of each node's first pt_cnt rows into the compact pool
    PC = pc if pc is not None else min(cap * NW, pool_window)
    dp = ragged.plan(nstart, pt_cnt, PC)
    # nodes whose copy overflows PC get cnt=0 — the renderer's split_masks
    # routes pool-missing nodes to the exact path, so overflow degrades to
    # exact cost, never to dropped samples
    pt_cnt = jnp.where(dp.mpos + pt_cnt <= PC, pt_cnt, 0)
    srgba_u = jax.lax.bitcast_convert_type(srgba, jnp.uint32)
    # gather_column needs 128-aligned sources; the sorted intermediates are
    # pool_window-sized (pool_window % 128 == 0 by engine bucketing)
    p_w0 = ragged.gather_column(dp, sw0)
    p_w1 = ragged.gather_column(dp, sw1)
    p_w2 = ragged.gather_column(dp, sw2)
    p_rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(dp, jax.lax.bitcast_convert_type(
            srgba_u, jnp.float32)), jnp.uint32)
    pt_off = jnp.where(pt_cnt > 0, dp.mpos, 0)
    # dp.mpos marks each node's first output position; invalid (empty) nodes 0

    # --- voxels: same over the compacted store's live prefix ---
    rows = jnp.arange(vox_window, dtype=jnp.int32)
    vvalid = rows < jnp.minimum(state.vox_compacted, vox_window)
    vnode = jnp.where(vvalid, state.vox_node[:vox_window], NW)
    vnode = jnp.where(vnode < NW, vnode, NW)
    vh = _hash2(state.vox_k0[:vox_window] ^ state.vox_k2l[:vox_window],
                state.vox_k1[:vox_window])
    vsn, _, vk0, vk1, vk2l, vrgba = jax.lax.sort(
        (vnode, vh, state.vox_k0[:vox_window], state.vox_k1[:vox_window],
         state.vox_k2l[:vox_window],
         jax.lax.bitcast_convert_type(state.vox_rgba[:vox_window], jnp.int32)),
        num_keys=2, is_stable=False)
    total_v = jnp.sum(vvalid.astype(jnp.int32))
    vstart, vncnt = _node_ranges(vsn, total_v, NW)
    vx_cnt = jnp.minimum(vncnt, cap)
    VC = vc if vc is not None else min(cap * NW, vox_window)
    dv = ragged.plan(vstart, vx_cnt, VC)
    vx_cnt = jnp.where(dv.mpos + vx_cnt <= VC, vx_cnt, 0)
    v_k0 = ragged.gather_column(dv, vk0)
    v_k1 = ragged.gather_column(dv, vk1)
    v_k2l = ragged.gather_column(dv, vk2l)
    v_rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(dv, jax.lax.bitcast_convert_type(
            vrgba, jnp.float32)), jnp.uint32)
    vx_off = jnp.where(vx_cnt > 0, dv.mpos, 0)

    pad_n = lambda a: jnp.concatenate(
        [a, jnp.zeros((n_cap - NW,), jnp.int32)]) if NW < n_cap else a
    return DrawPool(
        pt_off=pad_n(pt_off), pt_cnt=pad_n(pt_cnt),
        p_w0=p_w0, p_w1=p_w1, p_w2=p_w2, p_rgba=p_rgba,
        vx_off=pad_n(vx_off), vx_cnt=pad_n(vx_cnt),
        v_k0=v_k0, v_k1=v_k1, v_k2l=v_k2l, v_rgba=v_rgba)


# --- render-side: budgeted sample gathers -----------------------------------

def node_budgets(cfg: EngineConfig, vis, uniforms) -> jax.Array:
    """Per-node sample budget = point_budget * dx * dy of the node's screen
    extent (samples ~ covered pixels; uniforms.point_budget is the Settings
    knob). point_budget == 0 disables decimation: budget = INT_MAX."""
    area = jnp.maximum(vis.dx, 0.0) * jnp.maximum(vis.dy, 0.0)
    b = jnp.ceil(uniforms.point_budget * jnp.minimum(area, 2.0e9))
    b = jnp.clip(b, 0.0, 2.0e9).astype(jnp.int32)
    return jnp.where(uniforms.point_budget > 0.0, b, I32_MAX)


def split_masks(cfg: EngineConfig, state: OctreeState, vis, pool: DrawPool):
    """Partition emitted nodes between the pooled (budgeted) and exact paths.

    The budget applies to EVERY emitted node, large close-up leaves included:
    at point_budget >= 1 a node whose screen extent exceeds its sample count
    is uncut (budget = dx*dy >= cnt), so close-ups keep full detail while
    grazing-distance nodes — where the reference brute-forces overdraw
    through hardware atomics (render.cu:95-99) — draw in proportion to their
    coverage.

    Exact path: any node whose sample count exceeds draw_cap (its pool copy
    is truncated, so the budgeted path could not draw it fully even under a
    clearing budget) and any node the pool MISSES — created after the pool
    build (staleness) or dropped by a pool-copy overflow. Pool gaps therefore
    degrade to exact cost, never to dropped samples."""
    n = pool.pt_cnt.shape[0]
    ids = jnp.arange(state.num_points.shape[0], dtype=jnp.int32)
    in_pool_p = (ids < n) & (gather1d(pool.pt_cnt, jnp.minimum(ids, n - 1)) > 0)
    in_pool_v = (ids < n) & (gather1d(pool.vx_cnt, jnp.minimum(ids, n - 1)) > 0)
    poolable_p = (state.num_points <= cfg.draw_cap) \
        & (in_pool_p | (state.num_points == 0))
    poolable_v = (state.num_voxels <= cfg.draw_cap) \
        & (in_pool_v | (state.num_voxels == 0))
    pool_pts = vis.emitted & poolable_p
    exact_pts = vis.emitted & (state.num_points > 0) & ~poolable_p
    pool_vox = vis.emitted & poolable_v
    exact_vox = vis.emitted & (state.num_voxels > 0) & ~poolable_v
    return pool_pts, exact_pts, pool_vox, exact_vox


def _pool_take(mask, stored_cnt, budgets):
    return jnp.where(mask, jnp.minimum(stored_cnt, budgets), 0)


def gather_pool_points(cfg: EngineConfig, state: OctreeState, pool: DrawPool,
                       take: jax.Array, window: int) -> "raster.Samples":
    """Budgeted prefix gather of pooled leaf points -> Samples (hash order
    makes the prefix a deterministic uniform subsample)."""
    from . import raster
    N = pool.pt_off.shape[0]
    take = jnp.minimum(take[:N], pool.pt_cnt)
    W = (window // 128) * 128
    p = ragged.plan(jnp.where(take > 0, pool.pt_off, 0), take, W)
    w0 = ragged.gather_column(p, pool.p_w0)
    w1 = ragged.gather_column(p, pool.p_w1)
    w2 = ragged.gather_column(p, pool.p_w2)
    from ..ops import morton
    qx, qy, qz = morton.decode(w0, w1, w2)
    x, y, z = morton.dequantize_cols(qx, qy, qz, state.box_min, state.cube_size)
    rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(p, jax.lax.bitcast_convert_type(
            pool.p_rgba, jnp.float32)), jnp.uint32)

    def node_fn():
        ids = jnp.arange(N, dtype=jnp.int32)
        return jnp.where(p.valid, ragged.broadcast_i32(p, ids), 0)

    def level_fn():
        return gather1d(state.level, node_fn())

    return raster.Samples(x=x, y=y, z=z, rgba=rgba, node_fn=node_fn,
                          level_fn=level_fn, valid=p.valid,
                          count=jnp.minimum(jnp.sum(take), W))


def gather_pool_voxels(cfg: EngineConfig, state: OctreeState, pool: DrawPool,
                       take: jax.Array, window: int) -> "raster.Samples":
    """Budgeted prefix gather of pooled inner-node voxels -> Samples."""
    from . import raster
    N = pool.vx_off.shape[0]
    take = jnp.minimum(take[:N], pool.vx_cnt)
    W = (window // 128) * 128
    p = ragged.plan(jnp.where(take > 0, pool.vx_off, 0), take, W)
    k0 = ragged.gather_column(p, pool.v_k0)
    k1 = ragged.gather_column(p, pool.v_k1)
    k2l = ragged.gather_column(p, pool.v_k2l)
    rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(p, jax.lax.bitcast_convert_type(
            pool.v_rgba, jnp.float32)), jnp.uint32)
    x, y, z, lvl = raster.voxel_positions_from_keys(state, k0, k1, k2l)

    def node_fn():
        ids = jnp.arange(N, dtype=jnp.int32)
        return jnp.where(p.valid, ragged.broadcast_i32(p, ids), 0)

    return raster.Samples(x=x, y=y, z=z, rgba=rgba, node_fn=node_fn,
                          level_fn=lambda: lvl, valid=p.valid,
                          count=jnp.minimum(jnp.sum(take), W))
