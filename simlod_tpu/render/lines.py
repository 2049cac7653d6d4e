"""Line and bounding-box overlays (reference rasterization.cuh:5-147, render.cu:637-688,
1197-1233).

The reference rasterizes lines by DDA-walking every covered pixel with a u64 atomicMin.
Here each line segment is sampled at `line_steps` evenly spaced parametric points and
splatted through the same depth-min framebuffer — visually equivalent for overlay
wireframes (and bounded, which XLA needs). Line depth is biased slightly toward the
viewer so box edges win against coincident splats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EngineConfig, Uniforms
from ..octree.structures import OctreeState
from ..ops.segments import expand_segments
from .raster import DEPTH_INF

# 12 box edges as pairs of corner octants ((x<<2)|(y<<1)|z)
_BOX_EDGES = (
    (0b000, 0b100), (0b000, 0b010), (0b000, 0b001),
    (0b111, 0b011), (0b111, 0b101), (0b111, 0b110),
    (0b100, 0b110), (0b100, 0b101),
    (0b010, 0b110), (0b010, 0b011),
    (0b001, 0b101), (0b001, 0b011),
)


def node_box_lines(state: OctreeState, emitted: jax.Array, max_lines: int):
    """Wireframe edges for emitted nodes' AABBs -> (a [L,3], b [L,3], color, valid)."""
    n_cap = state.child_base.shape[0]
    sel = jnp.where(emitted, jnp.int32(1), jnp.int32(0))
    node_of, _elem, valid, _tot = expand_segments(sel, max_lines // 12)
    size = state.cube_size / jnp.exp2(state.level[node_of].astype(jnp.float32))
    mn = state.box_min[None, :] + size[:, None] * jnp.stack(
        [state.nx[node_of], state.ny[node_of], state.nz[node_of]], -1
    ).astype(jnp.float32)
    mx = mn + size[:, None]

    def corner(o):
        return jnp.stack([
            jnp.where((o >> 2) & 1, mx[:, 0], mn[:, 0]),
            jnp.where((o >> 1) & 1, mx[:, 1], mn[:, 1]),
            jnp.where(o & 1, mx[:, 2], mn[:, 2]),
        ], -1)

    a = jnp.concatenate([corner(e[0]) for e in _BOX_EDGES])
    b = jnp.concatenate([corner(e[1]) for e in _BOX_EDGES])
    v = jnp.concatenate([valid] * 12)
    color = jnp.full((a.shape[0],), jnp.uint32(0x000000FF))  # reference box color
    return a, b, color, v


def rasterize_lines(cfg: EngineConfig, uniforms: Uniforms, width: int, height: int,
                    color_fb: jax.Array, depth_fb: jax.Array,
                    a: jax.Array, b: jax.Array, line_color: jax.Array,
                    valid: jax.Array):
    """Splat sampled line points with depth test into (color_fb, depth_fb)."""
    steps = cfg.line_steps
    npx = width * height
    t = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps
    pts = a[:, None, :] + (b - a)[:, None, :] * t[None, :, None]   # [L,S,3]
    pts = pts.reshape(-1, 3)
    col = jnp.repeat(line_color, steps)
    val = jnp.repeat(valid, steps)

    m = uniforms.transform
    p = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), jnp.float32)], -1)
    ndc = p @ m.T
    w = ndc[:, 3]
    x = ((ndc[:, 0] / w * 0.5 + 0.5) * uniforms.width).astype(jnp.int32)
    y = ((ndc[:, 1] / w * 0.5 + 0.5) * uniforms.height).astype(jnp.int32)
    ok = (val & (x > 1) & (x.astype(jnp.float32) < uniforms.width - 2.0)
          & (y > 1) & (y.astype(jnp.float32) < uniforms.height - 2.0) & (w > 0))
    pix = jnp.clip(x, 0, width - 1) + width * jnp.clip(y, 0, height - 1)
    dbits = jax.lax.bitcast_convert_type(w * 0.999, jnp.int32)  # slight viewer bias

    dmin = depth_fb.at[jnp.where(ok, pix, npx)].min(dbits, mode="drop")
    won = ok & (dbits <= dmin[jnp.clip(pix, 0, npx - 1)])
    cmin = jnp.full((npx,), jnp.uint32(0xFFFFFFFF)).at[
        jnp.where(won, pix, npx)].min(col, mode="drop")
    color_out = jnp.where(cmin < jnp.uint32(0xFFFFFFFF), cmin, color_fb)
    return color_out, dmin
