"""Software point/voxel rasterization — the TPU-native kernel_render drawing stage.

The reference draws with one workgroup per visible node walking chunk linked lists and
splatting through a 64-bit atomicMin depth|color framebuffer (render.cu:161-634). TPUs
have no global atomics; the equivalent here is data-parallel:

  1. gather visible samples into dense arrays (ragged segment/CSR expansion),
  2. project all samples at once ([S,4] @ [4,4] on the MXU),
  3. depth pass: scatter-min of float32 depth bits into the framebuffer,
  4. color pass:
       - high-quality shading (default, drawNodesHQS:212): accept samples with
         depth < closest*1.01 and scatter-add RGB+count, then resolve to the average
         (identical math to render.cu:487-493, 606-634);
       - plain mode (drawNodes/drawPoint:61-99): accept samples with depth bits equal
         to the closest and scatter-min the color value — exactly the winner the
         reference's (depth<<32|color) u64 atomicMin would pick, including the
         smallest-color tiebreak.

Pixel layout is flat row-major pixel = x + width*y, like the reference framebuffer.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import EngineConfig, Uniforms
from ..octree.structures import OctreeState
from ..ops import morton
from ..ops.fastops import gather1d
from ..ops import ragged

DEPTH_INF = jnp.int32(C.DEPTH_INF_BITS)


class Samples(NamedTuple):
    """Column-form sample set ([S,k] stacks lane-pad 32x on TPU, so columns only).

    node/level are THUNKS (zero-arg callables evaluated inside a lax.cond) because
    they cost a gather each and are only needed for the colorByNode/colorByLOD debug
    modes (reference render.cu:74-78)."""
    x: jax.Array        # [S] f32 world positions
    y: jax.Array
    z: jax.Array
    rgba: jax.Array     # [S] u32
    node_fn: object     # () -> [S] i32 owning node
    level_fn: object    # () -> [S] i32 node level
    valid: jax.Array    # [S] bool
    count: jax.Array    # i32


def gather_point_samples(cfg: EngineConfig, state: OctreeState,
                         emitted: jax.Array, window: int | None = None) -> Samples:
    """Expand the live segments of emitted nodes into a dense sample window
    (aligned-row column gathers: ~0.05 ns/element, see ops/ragged.py)."""
    n_cap = state.child_base.shape[0]
    sn = state.seg_node
    ok = (state.seg_cnt > 0) & (sn >= 0) & gather1d(
        emitted.astype(jnp.int32), jnp.clip(sn, 0, n_cap - 1)).astype(bool)
    counts = jnp.where(ok, state.seg_cnt, 0)
    offs = jnp.where(ok, state.seg_off, 0)
    W = ((window or cfg.max_render_points) // 128) * 128
    p = ragged.plan(offs, counts, W)
    # pool positions are Morton words; decode to cell-center floats (elementwise
    # on the gathered window — the gather itself moves the same 12 B/row)
    gw0 = ragged.gather_column(p, state.pt_w0)
    gw1 = ragged.gather_column(p, state.pt_w1)
    gw2 = ragged.gather_column(p, state.pt_w2)
    qx, qy, qz = morton.decode(gw0, gw1, gw2)
    x, y, z = morton.dequantize_cols(qx, qy, qz, state.box_min,
                                     state.cube_size)
    rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(p, jax.lax.bitcast_convert_type(
            state.pt_rgba, jnp.float32)), jnp.uint32)

    def node_fn():
        return jnp.where(p.valid, ragged.broadcast_i32(p, sn), 0)

    def level_fn():
        return gather1d(state.level, node_fn())

    return Samples(
        x=x, y=y, z=z, rgba=rgba,
        node_fn=node_fn, level_fn=level_fn, valid=p.valid,
        count=jnp.minimum(jnp.sum(counts), W))


def voxel_positions_from_keys(state: OctreeState, k0, k1, k2l):
    """Voxel cell-center world positions from global prefix keys.

    The global prefix key IS the voxel's absolute address: level rides k2l's
    low 5 bits and the decoded per-axis prefix q >> (MAX_DEPTH+1-level) is
    node coords (top bits) ++ 128^3 cell coords (low 7 bits). Deriving
    (level, nx..nz, cell) per row from the key replaces five per-segment
    broadcasts (one full-window cumsum each, ~0.75 ms/scan at 4M rows).
    Returns (x, y, z, level)."""
    lvl = k2l & 31
    qx, qy, qz = morton.decode(k0, k1, k2l & ~31)
    shift = jnp.clip((C.MAX_DEPTH + 1) - lvl, 0, C.FULL_GRID_BITS)
    px, py, pz = qx >> shift, qy >> shift, qz >> shift
    m = C.GRID_SIZE - 1
    size = state.cube_size / jnp.exp2(lvl.astype(jnp.float32))
    # float op order matches the reference exactly (sampleVoxel voxels.cu:103-115):
    # nodeMin = X*nodeSize + min; voxel = nodeMin + nodeSize*(cell+0.5)/128
    g = jnp.float32(C.GRID_SIZE)
    x = ((px >> C.GRID_BITS).astype(jnp.float32) * size
         + state.box_min[0]) + size * (((px & m).astype(jnp.float32) + 0.5) / g)
    y = ((py >> C.GRID_BITS).astype(jnp.float32) * size
         + state.box_min[1]) + size * (((py & m).astype(jnp.float32) + 0.5) / g)
    z = ((pz >> C.GRID_BITS).astype(jnp.float32) * size
         + state.box_min[2]) + size * (((pz & m).astype(jnp.float32) + 0.5) / g)
    return x, y, z, lvl


def gather_voxel_samples(cfg: EngineConfig, state: OctreeState,
                         emitted: jax.Array, window: int | None = None) -> Samples:
    """Expand emitted nodes' voxel ranges; positions are the stored cell centers
    (reference sampleVoxel voxels.cu:103-115: nodeMin + nodeSize*(cell+0.5)/128).
    Cell coords come from the global prefix keys (morton.key_words_decode)."""
    counts = jnp.where(emitted, state.vox_vcnt, 0)
    offs = jnp.where(emitted, state.vox_voff, 0)
    W = ((window or cfg.max_render_voxels) // 128) * 128
    p = ragged.plan(offs, counts, W)
    k0 = ragged.gather_column(p, state.vox_k0)
    k1 = ragged.gather_column(p, state.vox_k1)
    k2l = ragged.gather_column(p, state.vox_k2l)
    rgba = jax.lax.bitcast_convert_type(
        ragged.gather_column(p, jax.lax.bitcast_convert_type(
            state.vox_rgba, jnp.int32).astype(jnp.int32)), jnp.uint32)
    x, y, z, lvl = voxel_positions_from_keys(state, k0, k1, k2l)

    def node_fn():   # debug color modes only (colorByNode): lazy, costs a cumsum
        return jnp.where(p.valid, ragged.broadcast_i32(
            p, jnp.arange(counts.shape[0], dtype=jnp.int32)), 0)

    return Samples(x=x, y=y, z=z, rgba=rgba, node_fn=node_fn,
                   level_fn=lambda: lvl, valid=p.valid,
                   count=jnp.minimum(jnp.sum(counts), W))


def _lod_color(level: jax.Array) -> jax.Array:
    """Spectral LOD palette (reference render.cu:49-59)."""
    idx = jnp.clip(((8.0 - level.astype(jnp.float32)) * 1.8).astype(jnp.int32), 0, 7)
    return jnp.asarray(C.SPECTRAL, jnp.uint32)[idx]


def _sample_colors(s: Samples, uniforms: Uniforms) -> jax.Array:
    """Debug color modes run under a cond so their node/level gathers cost nothing
    in the default path."""

    def fancy(rgba):
        node = s.node_fn()
        color = jnp.where(uniforms.color_by_node,
                          ((node % 127).astype(jnp.uint32)
                           * jnp.uint32(123456789)), rgba)
        color = jnp.where(uniforms.color_by_lod, _lod_color(s.level_fn()), color)
        return jnp.where(uniforms.color_white, jnp.uint32(0x00FFFFFF), color)

    any_mode = (uniforms.color_by_node | uniforms.color_by_lod
                | uniforms.color_white)
    return jax.lax.cond(any_mode, fancy, lambda c: c, s.rgba)


def _project(s: Samples, uniforms: Uniforms):
    """Project samples; returns (x, y, depth, ok) with the reference's window guard
    x in (1, width-2), y in (1, height-2), depth > 0 (render.cu:290-298).

    Column-wise (12 FMAs on the VPU) — a [S,4] @ [4,4] formulation would move a
    lane-padded [S,128] intermediate through HBM."""
    m = uniforms.transform
    ndc0 = s.x * m[0, 0] + s.y * m[0, 1] + s.z * m[0, 2] + m[0, 3]
    ndc1 = s.x * m[1, 0] + s.y * m[1, 1] + s.z * m[1, 2] + m[1, 3]
    wdepth = s.x * m[3, 0] + s.y * m[3, 1] + s.z * m[3, 2] + m[3, 3]
    sx = (ndc0 / wdepth * 0.5 + 0.5) * uniforms.width
    sy = (ndc1 / wdepth * 0.5 + 0.5) * uniforms.height
    x = sx.astype(jnp.int32)
    y = sy.astype(jnp.int32)
    ok = (s.valid & (x > 1) & (x.astype(jnp.float32) < uniforms.width - 2.0)
          & (y > 1) & (y.astype(jnp.float32) < uniforms.height - 2.0)
          & (wdepth > 0.0))
    return x, y, wdepth, ok


def _splat_pixels(x, y, ok, uniforms, width: int, height: int,
                  max_point_size: int = 1):
    """Yield (pixel, mask) for each of the point_size x point_size splat offsets
    (static unroll to cfg.max_point_size; masked by the dynamic uniforms.point_size)."""
    out = []
    for ox in range(max_point_size):
        for oy in range(max_point_size):
            use = ok & (ox < uniforms.point_size) & (oy < uniforms.point_size)
            px = jnp.clip(x + ox, 0, width - 1)
            py = jnp.clip(y + oy, 0, height - 1)
            out.append((px + width * py, use))
    return out


def rasterize(cfg: EngineConfig, uniforms: Uniforms, width: int, height: int,
              sample_sets: list[Samples]):
    """Full drawing stage over one or more sample sets.

    Returns (color u32 [H*W], depth_bits i32 [H*W]) with background where uncovered
    (clear values per render.cu:1126-1131).
    """
    npx = width * height
    projected = []
    for s in sample_sets:
        x, y, d, ok = _project(s, uniforms)
        dbits = jax.lax.bitcast_convert_type(d, jnp.int32)
        color = _sample_colors(s, uniforms)
        projected.append((x, y, dbits, d, color, ok))

    # pass 1: depth (scatter-min of positive-float bits behaves like float min)
    fbd = jnp.full((npx,), DEPTH_INF, jnp.int32)
    for (x, y, dbits, d, color, ok) in projected:
        for pix, use in _splat_pixels(x, y, ok, uniforms, width, height,
                                          cfg.max_point_size):
            fbd = fbd.at[jnp.where(use, pix, npx)].min(dbits, mode="drop")
    fbd_f = jax.lax.bitcast_convert_type(fbd, jnp.float32)

    def hq_pass(fbd):
        fbd_f2 = jax.lax.bitcast_convert_type(fbd, jnp.float32)
        acc = jnp.zeros((npx, 4), jnp.uint32)
        for (x, y, dbits, d, color, ok) in projected:
            for pix, use in _splat_pixels(x, y, ok, uniforms, width, height,
                                          cfg.max_point_size):
                accept = use & (d < gather1d(fbd_f2, jnp.clip(pix, 0, npx - 1))
                                * 1.01)
                i = jnp.where(accept, pix, npx)
                rgb1 = jnp.stack([color & 0xFF, (color >> 8) & 0xFF,
                                  (color >> 16) & 0xFF,
                                  jnp.ones_like(color)], -1)
                acc = acc.at[i].add(rgb1, mode="drop")
        cnt = acc[:, 3]
        return jnp.where(
            cnt > 0,
            (acc[:, 0] // jnp.maximum(cnt, 1))
            | ((acc[:, 1] // jnp.maximum(cnt, 1)) << 8)
            | ((acc[:, 2] // jnp.maximum(cnt, 1)) << 16)
            | jnp.uint32(0xFF000000),
            jnp.uint32(C.BACKGROUND_COLOR))

    def plain_pass(fbd):
        cmin = jnp.full((npx,), jnp.uint32(0xFFFFFFFF))
        for (x, y, dbits, d, color, ok) in projected:
            for pix, use in _splat_pixels(x, y, ok, uniforms, width, height,
                                          cfg.max_point_size):
                eq = use & (dbits == gather1d(fbd, jnp.clip(pix, 0, npx - 1)))
                cmin = cmin.at[jnp.where(eq, pix, npx)].min(color, mode="drop")
        covered = fbd < DEPTH_INF
        return jnp.where(covered, cmin, jnp.uint32(C.BACKGROUND_COLOR))

    color = jax.lax.cond(uniforms.use_high_quality_shading, hq_pass, plain_pass, fbd)
    return color, fbd


def edl(color: jax.Array, depth_bits: jax.Array, uniforms: Uniforms,
        width: int, height: int) -> jax.Array:
    """Eye-dome lighting post-process (reference render.cu:1255-1325).

    response = sum over 4 neighbors of max(log2(d) - log2(d_n), 0) / 50;
    shade = exp(-response * 300 * edlStrength). Background-vs-background pairs give
    inf - inf = NaN which CUDA's fmaxf treats as 0 — replicated explicitly.
    """
    d = jax.lax.bitcast_convert_type(depth_bits, jnp.float32).reshape(height, width)
    logd = jnp.log2(d)
    resp = jnp.zeros_like(logd)
    for dx, dy in ((0, 1), (1, 0), (0, -1), (-1, 0)):
        # neighbor indexing matches pixelID + dx + width*dy with clamping
        shifted = jnp.roll(logd, shift=(-dy, -dx), axis=(0, 1))
        diff = logd - shifted
        diff = jnp.where(jnp.isnan(diff), 0.0, jnp.maximum(diff, 0.0))
        resp = resp + diff
    resp = resp / 50.0
    shade = jnp.exp(-resp * 300.0 * uniforms.edl_strength).reshape(-1)
    r = ((color & 0xFF).astype(jnp.float32) * shade).astype(jnp.uint32)
    g = (((color >> 8) & 0xFF).astype(jnp.float32) * shade).astype(jnp.uint32)
    b = (((color >> 16) & 0xFF).astype(jnp.float32) * shade).astype(jnp.uint32)
    shaded = r | (g << 8) | (b << 16) | jnp.uint32(0xFF000000)
    return jnp.where(uniforms.enable_edl, shaded, color)
