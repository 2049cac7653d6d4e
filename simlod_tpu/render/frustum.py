"""Frustum culling math (device-side, jnp).

Gribb-Hartmann plane extraction from a world-view-projection matrix plus the
positive-vertex AABB test, matching the reference math.cuh:154-199 (itself derived from
three.js). Planes are normalized; a box is "intersecting" if its p-vertex is on or in
front of all six planes.
"""
from __future__ import annotations

import jax.numpy as jnp


def frustum_planes(m: jnp.ndarray) -> jnp.ndarray:
    """Extract 6 normalized planes [6,4] (nx,ny,nz,d) from a row-major transform `m`
    that acts on column vectors (reference math.cuh:69-108 / 154-186)."""
    rows = m  # m[r, c]
    planes = jnp.stack([
        rows[3] - rows[0],   # right
        rows[3] + rows[0],   # left
        rows[3] + rows[1],   # bottom
        rows[3] - rows[1],   # top
        rows[3] - rows[2],   # far
        rows[3] + rows[2],   # near
    ])
    n = jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    return planes / jnp.maximum(n, 1e-30)


def intersects_frustum_cols(planes, mnx, mny, mnz, mxx, mxy, mxz):
    """Column-wise p-vertex test over 1-D AABB coordinate arrays (no [N,3] stacks)."""
    ok = None
    for i in range(6):
        nx, ny, nz, d = planes[i, 0], planes[i, 1], planes[i, 2], planes[i, 3]
        px = jnp.where(nx > 0, mxx, mnx)
        py = jnp.where(ny > 0, mxy, mny)
        pz = jnp.where(nz > 0, mxz, mnz)
        dist = px * nx + py * ny + pz * nz + d
        good = dist >= 0.0
        ok = good if ok is None else (ok & good)
    return ok


def intersects_frustum(planes: jnp.ndarray, box_min: jnp.ndarray,
                       box_max: jnp.ndarray) -> jnp.ndarray:
    """Vectorized p-vertex test: box_min/box_max are [N,3]; returns [N] bool.

    Matches reference math.cuh:186-199: pick the box corner most positive along each
    plane normal; the box passes iff that corner's signed distance >= 0 on every plane.
    """
    n = planes[:, :3]                      # [6,3]
    d = planes[:, 3]                       # [6]
    # p-vertex per plane: max where normal > 0 else min -> [N,6,3]
    pv = jnp.where(n[None, :, :] > 0, box_max[:, None, :], box_min[:, None, :])
    dist = jnp.einsum("npk,pk->np", pv, n) + d[None, :]
    return jnp.all(dist >= 0.0, axis=1)
