"""Line and bounding-box overlays (reference rasterization.cuh:90-183, render.cu:637-688,
1197-1223).

The reference rasterizes a line by frustum-clipping its endpoints, projecting, and
stepping one pixel at a time along the screen-space length (clamped to 400 steps),
depth-testing each covered pixel (rasterization.cuh:147-178). The TPU equivalent is
fully data-parallel: clip every line's parametric range against the homogeneous view
volume (each clip plane is linear in t), then expand each line into `line_steps`
NDC-lerped samples with per-sample validity j <= screen_length — gap-free up to the
static budget, and no samples are wasted on off-screen portions.
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


def frustum_lines(uniforms: Uniforms):
    """The frozen-visibility camera frustum wireframe (render.cu:1197-1223).

    Corners come from unprojecting the NDC cube with the inverse of the FROZEN
    transform (the reference precomputes transformInv_updateBound); fend matches
    the reference's 0.99995 so the far quad stays finite.
    """
    minv = jnp.linalg.inv(uniforms.transform_update_bound)
    fend = 0.99995

    def unproject(x, y, z):
        p = minv @ jnp.asarray([x, y, z, 1.0], jnp.float32)
        return p[:3] / p[3]

    # 4 near->far edges + 4 far-quad edges, exactly the reference's draw list
    segs = [((1, 1, -1.0), (1, 1, fend)), ((1, -1, -1.0), (1, -1, fend)),
            ((-1, 1, -1.0), (-1, 1, fend)), ((-1, -1, -1.0), (-1, -1, fend)),
            ((-1, -1, fend), (1, -1, fend)), ((-1, 1, fend), (1, 1, fend)),
            ((-1, -1, fend), (-1, 1, fend)), ((1, -1, fend), (1, 1, fend))]
    a = jnp.stack([unproject(*s) for s, _ in segs])
    b = jnp.stack([unproject(*e) for _, e in segs])
    color = jnp.full((len(segs),), jnp.uint32(0x000000FF))
    valid = jnp.ones((len(segs),), jnp.bool_)
    return a, b, color, valid


def _clip_t_range(ca, cb, t_lo, t_hi):
    """Intersect [t_lo, t_hi] with { t : ca*(1-t) + cb*t >= 0 } (linear clip plane)."""
    cross = ca / jnp.where(ca == cb, 1.0, ca - cb)
    t_lo = jnp.where((ca < 0) & (cb >= 0), jnp.maximum(t_lo, cross), t_lo)
    t_hi = jnp.where((ca >= 0) & (cb < 0), jnp.minimum(t_hi, cross), t_hi)
    empty = (ca < 0) & (cb < 0)
    return jnp.where(empty, 1.0, t_lo), jnp.where(empty, 0.0, t_hi)


def rasterize_lines(cfg: EngineConfig, uniforms: Uniforms, width: int, height: int,
                    color_fb: jax.Array, depth_fb: jax.Array,
                    a: jax.Array, b: jax.Array, line_color: jax.Array,
                    valid: jax.Array):
    """Clip, project, and DDA-splat lines into (color_fb, depth_fb)."""
    steps = cfg.line_steps
    npx = width * height
    m = uniforms.transform

    def clip4(p):   # [L,3] world -> [L,4] clip space
        ph = jnp.concatenate([p, jnp.ones((p.shape[0], 1), jnp.float32)], -1)
        return ph @ m.T

    ca4, cb4 = clip4(a), clip4(b)
    eps = 1e-6
    # homogeneous clip: w >= eps, |x'| <= w, |y'| <= w — each linear in t
    t_lo = jnp.zeros(a.shape[0], jnp.float32)
    t_hi = jnp.ones(a.shape[0], jnp.float32)
    for wa, wb in (
        (ca4[:, 3] - eps, cb4[:, 3] - eps),
        (ca4[:, 3] - ca4[:, 0], cb4[:, 3] - cb4[:, 0]),
        (ca4[:, 3] + ca4[:, 0], cb4[:, 3] + cb4[:, 0]),
        (ca4[:, 3] - ca4[:, 1], cb4[:, 3] - cb4[:, 1]),
        (ca4[:, 3] + ca4[:, 1], cb4[:, 3] + cb4[:, 1]),
    ):
        t_lo, t_hi = _clip_t_range(wa, wb, t_lo, t_hi)
    ok_line = valid & (t_lo < t_hi)

    lerp = lambda p, q, t: p * (1.0 - t[:, None]) + q * t[:, None]
    cs = lerp(ca4, cb4, t_lo)
    ce = lerp(ca4, cb4, t_hi)
    ndc_s = cs[:, :2] / cs[:, 3:4]
    ndc_e = ce[:, :2] / ce[:, 3:4]
    sx_s = (ndc_s[:, 0] * 0.5 + 0.5) * uniforms.width
    sy_s = (ndc_s[:, 1] * 0.5 + 0.5) * uniforms.height
    sx_e = (ndc_e[:, 0] * 0.5 + 0.5) * uniforms.width
    sy_e = (ndc_e[:, 1] * 0.5 + 0.5) * uniforms.height
    # screen-length stepping, clamped to the static budget (reference clamps at 400)
    slen = jnp.sqrt((sx_e - sx_s) ** 2 + (sy_e - sy_s) ** 2)
    nstep = jnp.clip(jnp.ceil(slen), 1.0, float(steps - 1))

    j = jnp.arange(steps, dtype=jnp.float32)
    u = jnp.minimum(j[None, :] / nstep[:, None], 1.0)          # [L,S]
    use = ok_line[:, None] & (j[None, :] <= nstep[:, None])

    def lerpv(p, q):
        return p[:, None] * (1.0 - u) + q[:, None] * u

    x = lerpv(sx_s, sx_e)
    y = lerpv(sy_s, sy_e)
    # linear depth interpolation, like the reference (rasterization.cuh:152-158)
    d = lerpv(cs[:, 3], ce[:, 3]) * 0.999   # slight viewer bias for overlay wins

    xi = jnp.clip(x.astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, height - 1)
    pix = (xi + width * yi).reshape(-1)
    use = (use & (x >= 0) & (x < uniforms.width)
           & (y >= 0) & (y < uniforms.height) & (d > 0)).reshape(-1)
    dbits = jax.lax.bitcast_convert_type(d, jnp.int32).reshape(-1)
    col = jnp.repeat(line_color, steps)

    dmin = depth_fb.at[jnp.where(use, pix, npx)].min(dbits, mode="drop")
    won = use & (dbits <= dmin[jnp.clip(pix, 0, npx - 1)])
    cmin = jnp.full((npx,), jnp.uint32(0xFFFFFFFF)).at[
        jnp.where(won, pix, npx)].min(col, mode="drop")
    color_out = jnp.where(cmin < jnp.uint32(0xFFFFFFFF), cmin, color_fb)
    return color_out, dmin
