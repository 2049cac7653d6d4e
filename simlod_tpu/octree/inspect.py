"""Host-side octree inspection: pull a dense OctreeState back into Python dicts.

Used by tests (cross-checking against reference_impl.RefOctree) and debugging tools.
Slow by design; never on the hot path.
"""
from __future__ import annotations

import numpy as np

from .structures import OctreeState


def snapshot(state: OctreeState) -> dict:
    """Device -> host copy of all fields as numpy arrays."""
    out = {}
    for name in state.__dataclass_fields__:
        out[name] = np.asarray(getattr(state, name))
    return out


def node_table(state: OctreeState) -> dict:
    """dict (level, x, y, z) -> node info dict, mirroring RefOctree.node_map()."""
    s = snapshot(state)
    n = int(s["num_nodes"])
    table = {}
    # per-node stored points via live segments
    nseg = int(s["num_segments"])
    seg_n = s["seg_node"][:nseg]
    seg_o = s["seg_off"][:nseg]
    seg_c = s["seg_cnt"][:nseg]
    pts_by_node: dict[int, list] = {}
    for sn, so, sc in zip(seg_n, seg_o, seg_c):
        if sc > 0 and sn >= 0:
            pts_by_node.setdefault(int(sn), []).append((int(so), int(sc)))
    # per-node voxels from the store; requires a COMPACTED store (vox_node is the
    # emitting leaf, not the owner, in the uncompacted tail)
    vox_by_node: dict[int, dict] = {}
    vu = int(s["vox_used"])
    if vu:
        import jax.numpy as jnp

        from .. import constants as C
        from ..ops import morton
        _, cx, cy, cz = morton.key_words_decode(
            jnp.asarray(s["vox_k0"][:vu]), jnp.asarray(s["vox_k1"][:vu]),
            jnp.asarray(s["vox_k2l"][:vu]))
        cell = ((np.asarray(cx) << (2 * C.GRID_BITS))
                | (np.asarray(cy) << C.GRID_BITS) | np.asarray(cz))
        for i in range(vu):
            vox_by_node.setdefault(int(s["vox_node"][i]), {}).setdefault(
                int(cell[i]), int(s["vox_rgba"][i]))
    pool_xyz = np.asarray(state.pt_xyz)  # decoded once (words -> cell centers)
    for i in range(n):
        spans = pts_by_node.get(i, [])
        idx = np.concatenate([np.arange(o, o + c) for (o, c) in spans]) \
            if spans else np.zeros((0,), np.int64)
        table[(int(s["level"][i]), int(s["nx"][i]), int(s["ny"][i]),
               int(s["nz"][i]))] = dict(
            id=i,
            is_leaf=bool(s["child_base"][i] < 0),
            child_base=int(s["child_base"][i]),
            parent=int(s["parent"][i]),
            counter=int(s["counter"][i]),
            num_points=int(s["num_points"][i]),
            num_voxels=int(s["num_voxels"][i]),
            points_xyz=pool_xyz[idx],
            points_rgba=s["pt_rgba"][idx],
            voxels=vox_by_node.get(i, {}),
        )
    return table


def voxel_cells(state: OctreeState) -> np.ndarray:
    """Packed 21-bit local cell per store row [0, vox_used) (host-side; tests)."""
    import jax.numpy as jnp

    from .. import constants as C
    from ..ops import morton
    vu = int(state.vox_used)
    if vu == 0:
        return np.zeros((0,), np.int64)
    _, cx, cy, cz = morton.key_words_decode(
        jnp.asarray(np.asarray(state.vox_k0)[:vu]),
        jnp.asarray(np.asarray(state.vox_k1)[:vu]),
        jnp.asarray(np.asarray(state.vox_k2l)[:vu]))
    return ((np.asarray(cx).astype(np.int64) << (2 * C.GRID_BITS))
            | (np.asarray(cy).astype(np.int64) << C.GRID_BITS)
            | np.asarray(cz).astype(np.int64))
