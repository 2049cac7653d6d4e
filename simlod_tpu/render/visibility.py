"""Visible-node selection with pixel-projected-size LOD (the reference's
compute_visibility_disjunct, render.cu:690-934) as one dense vectorized pass.

Per node: project the 8 AABB corners with the FROZEN transform_updateBound matrix
(frozen while doUpdateVisibility is off — lets the user inspect a fixed LOD cut),
take the screen-extent (dx, dy), frustum-test the box, then select:

  node emitted  <=>  (parent.isLarge and not node.isLarge and node.visible)
                 or  (node.isLarge and node.isLeaf and node.visible)

  visible = intersects frustum AND has samples (points or voxels)
  isLarge = dx > 2*minNodeSize or dy > 2*minNodeSize        (render.cu:861)
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
    mn = state.box_min[None, :] + size[:, None] * jnp.stack(
        [state.nx, state.ny, state.nz], -1).astype(jnp.float32)
    mx = mn + size[:, None]

    # 8 corners -> screen extents (reference render.cu:780-846)
    octs = jnp.arange(8)
    corners = jnp.stack([
        jnp.where(((octs >> 2) & 1)[None, :] == 1, mx[:, 0:1], mn[:, 0:1]),
        jnp.where(((octs >> 1) & 1)[None, :] == 1, mx[:, 1:2], mn[:, 1:2]),
        jnp.where((octs & 1)[None, :] == 1, mx[:, 2:3], mn[:, 2:3]),
        jnp.ones((n_cap, 8), jnp.float32),
    ], axis=-1)                                           # [N,8,4]
    m = uniforms.transform_update_bound                   # [4,4] row-major
    ndc = jnp.einsum("nok,rk->nor", corners, m)           # [N,8,4]
    w = ndc[..., 3]
    sxy = (ndc[..., :2] / w[..., None] * 0.5 + 0.5) * jnp.stack(
        [uniforms.width, uniforms.height])[None, None, :]
    dx = jnp.max(sxy[..., 0], axis=1) - jnp.min(sxy[..., 0], axis=1)
    dy = jnp.max(sxy[..., 1], axis=1) - jnp.min(sxy[..., 1], axis=1)

    planes = frustum.frustum_planes(m)
    in_frustum = frustum.intersects_frustum(planes, mn, mx)
    has_samples = (state.num_points > 0) | (state.num_voxels > 0)
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
        num_visible_nodes=asz(emitted),
        num_visible_inner=asz(innerish),
        num_visible_leaves=asz(leafish),
        num_visible_points=jnp.sum(jnp.where(leafish, state.num_points, 0)),
        num_visible_voxels=jnp.sum(jnp.where(innerish, state.num_voxels, 0)),
    )
