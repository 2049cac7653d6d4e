"""Multi-chip octree sharding over a jax.sharding.Mesh — a NEW capability vs the
reference, which is strictly single-GPU (cuDeviceGet(&device, 0),
main_progressive_octree.cpp:274). See SURVEY.md section 2 (parallelism inventory).

Strategy: spatial data parallelism by top-level Morton brick.
  - The octree cube is divided into 8^L bricks (L = smallest level with >= n_devices
    bricks); each device owns a contiguous Morton range of bricks and builds its own
    LOCAL octree from the points routed into its bricks.
  - Per-device voxel cell sets at shared coarse levels are DISJOINT (a 128^3 sampling
    cell lies entirely inside one brick for cells below the brick level, and coarse
    cells are only sampled from a device's own points), so the union of local trees
    renders like one global tree; only coarse split *timing* differs per device, which
    shifts where the point/voxel LOD boundary sits — LOD-equivalent output.
  - Rendering composites per-device framebuffers with a depth-min reduction: the
    reference's 64-bit atomicMin depth|color (render.cu:95-99) is associative, so the
    cross-chip composite is a pmin + unique-winner psum over ICI. EDL runs on the
    composited buffer, identical to single-chip.

The batch is currently replicated to every device and masked locally (correct and
simple); all-to-all routing of pre-bucketed points is the planned optimization once
single-chip throughput saturates.
"""
from __future__ import annotations

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


def _brick_owner(qx, qy, qz, level: int, n_devices: int):
    """Device owning each point: Morton brick id scaled onto the device range."""
    bits = jnp.zeros_like(qx)
    for l in range(level):
        s = C.FULL_GRID_BITS - 1 - l
        bits = (bits << 3) | (((qx >> s) & 1) << 2) \
            | (((qy >> s) & 1) << 1) | ((qz >> s) & 1)
    n_bricks = 8 ** level
    return (bits * n_devices) // n_bricks


def build_sharded_step(cfg: EngineConfig, mesh: Mesh, width: int, height: int):
    """Returns a jitted sharded simultaneous step:
    (stacked_state, xyz, rgba, count, uniforms) -> (stacked_state, image, counts)."""
    n = mesh.devices.size
    level = brick_level_for(n)

    def local_step(state, x, y, z, rgba, count, uniforms):
        state = jax.tree.map(lambda a: jnp.squeeze(a, 0), state)

        # route: keep only this device's points (replicated batch, local mask)
        qx, qy, qz = morton.quantize_cols(x, y, z, state.box_min, state.cube_size)
        owner = _brick_owner(qx, qy, qz, level, n)
        dev = jax.lax.axis_index(AXIS).astype(jnp.int32)
        rows = jnp.arange(x.shape[0], dtype=jnp.int32)
        mine = (rows < count) & (owner == dev)
        (sx, sy, sz, sc), my_count = compact_mask_via_sort(mine, (x, y, z, rgba))

        # local build + voxel compaction (keeps the CSR fresh for rendering)
        state = build.build_step_impl(cfg, state, sx, sy, sz, sc, my_count)
        state = build.compact_voxels_impl(cfg, state)

        # local render (pre-EDL), then cross-chip depth-min composite
        vis = visibility.compute_visibility(state, uniforms)
        pts = raster.gather_point_samples(cfg, state, vis.emitted)
        vox = raster.gather_voxel_samples(cfg, state, vis.emitted)
        pts = pts._replace(valid=pts.valid & uniforms.show_points)
        vox = vox._replace(valid=vox.valid & uniforms.show_points)
        color, depth = raster.rasterize(cfg, uniforms, width, height, [pts, vox])

        gmin = jax.lax.pmin(depth, AXIS)
        big = jnp.int32(1 << 30)
        windev = jax.lax.pmin(jnp.where(depth == gmin, dev, big), AXIS)
        is_winner = (depth == gmin) & (dev == windev)
        comp_color = jax.lax.psum(jnp.where(is_winner, color, jnp.uint32(0)), AXIS)
        img = raster.edl(comp_color, gmin, uniforms, width, height)

        state = jax.tree.map(lambda a: a[None], state)
        return state, img.reshape(height, width), my_count[None]

    def step(state, x, y, z, rgba, count, uniforms):
        return shard_map(
            local_step, mesh=mesh,
            in_specs=(P(AXIS), P(), P(), P(), P(), P(), P()),
            out_specs=(P(AXIS), P(), P(AXIS)),
        )(state, x, y, z, rgba, count, uniforms)

    return jax.jit(step, donate_argnums=0)
