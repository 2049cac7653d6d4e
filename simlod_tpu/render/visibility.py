"""Visible-node selection with pixel-projected-size LOD (the reference's
compute_visibility_disjunct, render.cu:690-934) as one dense vectorized pass.

Per node: project the 8 AABB corners with the FROZEN transform_updateBound matrix
(frozen while doUpdateVisibility is off — lets the user inspect a fixed LOD cut),
take the screen-extent (dx, dy), frustum-test the box, then select:

  node emitted  <=>  (parent.isLarge and not node.isLarge and node.visible)
                 or  (node.isLarge and node.isLeaf and node.visible)

  visible = intersects frustum AND has samples (points or voxels)
  isLarge = dx > 2*minNodeSize or dy > 2*minNodeSize        (render.cu:861)

All math is column-wise over 1-D node arrays (no [N,8,4] corner tensors — narrow
trailing dims lane-pad 32x on TPU).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Uniforms
from ..octree.structures import OctreeState
from . import frustum


class Visibility(NamedTuple):
    emitted: jax.Array          # [N] bool: node's samples are drawn this frame
    visible: jax.Array          # [N] bool
    is_large: jax.Array         # [N] bool
    dx: jax.Array               # [N] f32 screen extent (render.cu:817)
    dy: jax.Array               # [N] f32
    num_visible_nodes: jax.Array
    num_visible_inner: jax.Array
    num_visible_leaves: jax.Array
    num_visible_points: jax.Array
    num_visible_voxels: jax.Array


def compute_visibility(state: OctreeState, uniforms: Uniforms) -> Visibility:
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    active = ids < state.num_nodes

    size = state.cube_size / jnp.exp2(state.level.astype(jnp.float32))
    mnx = state.box_min[0] + size * state.nx.astype(jnp.float32)
    mny = state.box_min[1] + size * state.ny.astype(jnp.float32)
    mnz = state.box_min[2] + size * state.nz.astype(jnp.float32)
    mxx, mxy, mxz = mnx + size, mny + size, mnz + size

    # 8 corners -> screen extents (reference render.cu:780-846), column-wise
    m = uniforms.transform_update_bound
    big = jnp.float32(3.4e38)
    sminx = jnp.full((n_cap,), big)
    smaxx = jnp.full((n_cap,), -big)
    sminy = jnp.full((n_cap,), big)
    smaxy = jnp.full((n_cap,), -big)
    for c in range(8):
        px = mxx if (c >> 2) & 1 else mnx
        py = mxy if (c >> 1) & 1 else mny
        pz = mxz if c & 1 else mnz
        n0 = px * m[0, 0] + py * m[0, 1] + pz * m[0, 2] + m[0, 3]
        n1 = px * m[1, 0] + py * m[1, 1] + pz * m[1, 2] + m[1, 3]
        w = px * m[3, 0] + py * m[3, 1] + pz * m[3, 2] + m[3, 3]
        sx = (n0 / w * 0.5 + 0.5) * uniforms.width
        sy = (n1 / w * 0.5 + 0.5) * uniforms.height
        sminx = jnp.minimum(sminx, sx)
        smaxx = jnp.maximum(smaxx, sx)
        sminy = jnp.minimum(sminy, sy)
        smaxy = jnp.maximum(smaxy, sy)
    dx = smaxx - sminx
    dy = smaxy - sminy

    planes = frustum.frustum_planes(m)
    in_frustum = frustum.intersects_frustum_cols(
        planes, mnx, mny, mnz, mxx, mxy, mxz)
    # num_voxels is exact only after compaction (lazy voxel dedup); a fresh inner
    # node counts as having samples — its voxels exist in the uncompacted tail
    has_samples = (state.num_points > 0) | (state.num_voxels > 0) \
        | (state.child_base >= 0)
    visible = active & in_frustum & has_samples
    is_large = active & ((dx > 2.0 * uniforms.min_node_size)
                         | (dy > 2.0 * uniforms.min_node_size))

    parent = jnp.clip(state.parent, 0, n_cap - 1)
    parent_large = jnp.where(state.parent >= 0, is_large[parent], False)
    is_leaf = state.child_base < 0
    emitted = visible & ((parent_large & ~is_large)
                         | (is_large & is_leaf))

    # stats replicate makeVisible (render.cu:744-758): a node counts as a leaf if it
    # has points, else as inner if it has voxels
    asz = lambda b: jnp.sum(b.astype(jnp.int32))
    leafish = emitted & (state.num_points > 0)
    innerish = emitted & (state.num_points == 0) & (state.num_voxels > 0)
    return Visibility(
        emitted=emitted, visible=visible, is_large=is_large,
        dx=dx, dy=dy,
        num_visible_nodes=asz(emitted),
        num_visible_inner=asz(innerish),
        num_visible_leaves=asz(leafish),
        num_visible_points=jnp.sum(jnp.where(leafish, state.num_points, 0)),
        num_visible_voxels=jnp.sum(jnp.where(innerish, state.num_voxels, 0)),
    )
