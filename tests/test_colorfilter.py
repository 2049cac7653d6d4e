"""Color filter tests: TPU bottom-up averaging vs an independent recursive oracle."""
import numpy as np
import jax.numpy as jnp

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig
from simlod_tpu.octree import build, colorfilter
from simlod_tpu.octree.structures import init_state

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 12,
    node_capacity=1 << 12, point_capacity=1 << 16, voxel_capacity=1 << 18,
    segment_capacity=1 << 14, step_points=1 << 12, spill_capacity=1 << 12,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=64,
)


def build_state(xyz, rgba):
    state = init_state(CFG, [0, 0, 0], [1, 1, 1])
    B = CFG.step_points
    for s in range(0, len(xyz), B):
        c, k = xyz[s:s + B], rgba[s:s + B]
        cx = np.zeros((B, 3), np.float32); cx[:len(c)] = c
        cc = np.zeros((B,), np.uint32); cc[:len(c)] = k
        state = build.build_step(
            CFG, state,
            jnp.asarray(np.ascontiguousarray(cx[:, 0])),
            jnp.asarray(np.ascontiguousarray(cx[:, 1])),
            jnp.asarray(np.ascontiguousarray(cx[:, 2])),
            jnp.asarray(cc), jnp.int32(len(c)))
    return build.compact_voxels(CFG, state)


def oracle_filter(state):
    """Independent numpy bottom-up filter over the dense state arrays."""
    n = int(state.num_nodes)
    child_base = np.asarray(state.child_base)[:n]
    parent = np.asarray(state.parent)[:n]
    level = np.asarray(state.level)[:n]
    nx, ny, nz = (np.asarray(a)[:n] for a in (state.nx, state.ny, state.nz))
    from simlod_tpu.octree.inspect import voxel_cells
    vox_voff = np.asarray(state.vox_voff)
    vox_vcnt = np.asarray(state.vox_vcnt)
    vu = int(state.vox_used)
    vox_node = np.asarray(state.vox_node)[:vu]
    vox_cell = voxel_cells(state).copy()
    vox_rgba = np.asarray(state.vox_rgba)[:vu].copy()
    # per-node stored points
    ns = int(state.num_segments)
    seg_node = np.asarray(state.seg_node)[:ns]
    seg_off = np.asarray(state.seg_off)[:ns]
    seg_cnt = np.asarray(state.seg_cnt)[:ns]
    from simlod_tpu.ops import morton as mort
    pt_q = np.stack([np.asarray(a) for a in mort.decode(
        state.pt_w0, state.pt_w1, state.pt_w2)], -1).astype(np.int64)
    pt_rgba = np.asarray(state.pt_rgba)

    def samples_of(i):
        """(qcoords [m,3], colors [m]) of node i's own samples (points or voxels)."""
        if child_base[i] < 0:  # leaf: points
            qs, cs = [], []
            for s in range(ns):
                if seg_node[s] == i and seg_cnt[s] > 0:
                    sl = slice(seg_off[s], seg_off[s] + seg_cnt[s])
                    qs.append(pt_q[sl])
                    cs.append(pt_rgba[sl])
            if not qs:
                return np.zeros((0, 3), np.int64), np.zeros(0, np.uint32)
            return np.concatenate(qs), np.concatenate(cs)
        # inner: its (already filtered) voxels; center coords at level+7 resolution
        o0, o1 = vox_voff[i], vox_voff[i] + vox_vcnt[i]
        cells = vox_cell[o0:o1]
        cx = (cells >> 14) & 127
        cy = (cells >> 7) & 127
        cz = cells & 127
        gx = (np.int64(nx[i]) << 7) + cx
        gy = (np.int64(ny[i]) << 7) + cy
        gz = (np.int64(nz[i]) << 7) + cz
        # lift to full 28-bit resolution at the CENTER of the cell
        shift = C.FULL_GRID_BITS - (level[i] + 7)
        q = np.stack([(gx << shift) + (1 << shift) // 2,
                      (gy << shift) + (1 << shift) // 2,
                      (gz << shift) + (1 << shift) // 2], -1)
        return q, vox_rgba[o0:o1].copy()

    for lvl in range(level.max() - 1, -1, -1):
        for i in np.where((level == lvl) & (child_base >= 0))[0]:
            acc = {}
            for o in range(8):
                c = child_base[i] + o
                q, cols = samples_of(c)
                if len(q) == 0:
                    continue
                shift = (C.MAX_DEPTH + 1) - lvl
                cell = (((q[:, 0] >> shift) & 127) << 14) \
                    | (((q[:, 1] >> shift) & 127) << 7) | ((q[:, 2] >> shift) & 127)
                for k, col in zip(cell, cols):
                    r, g, b = col & 0xFF, (col >> 8) & 0xFF, (col >> 16) & 0xFF
                    e = acc.setdefault(int(k), [0, 0, 0, 0])
                    e[0] += int(r); e[1] += int(g); e[2] += int(b); e[3] += 1
            o0, o1 = vox_voff[i], vox_voff[i] + vox_vcnt[i]
            assert set(vox_cell[o0:o1].tolist()) == set(acc.keys()), \
                f"cell sets differ at node {i}"
            for j in range(o0, o1):
                r, g, b, cnt = acc[int(vox_cell[j])]
                vox_rgba[j] = np.uint32((r // cnt) | ((g // cnt) << 8)
                                        | ((b // cnt) << 16))
    return vox_rgba


def test_filter_matches_oracle(rng):
    xy = rng.random((4000, 2), dtype=np.float32)
    z = 0.4 + 0.1 * np.sin(7 * xy[:, 0]) * np.cos(5 * xy[:, 1])
    xyz = np.stack([xy[:, 0], xy[:, 1], z.astype(np.float32)], -1)
    rgba = rng.integers(0, 2**32, 4000, dtype=np.uint64).astype(np.uint32)
    state = build_state(xyz, rgba)
    assert int(state.num_nodes) > 1
    expect = oracle_filter(state)
    got_state = colorfilter.filter_colors(CFG, state)
    vu = int(got_state.vox_used)
    got = np.asarray(got_state.vox_rgba)[:vu]
    mismatch = (got != expect).sum()
    assert mismatch == 0, f"{mismatch}/{vu} voxel colors differ"


def test_filter_preserves_structure(rng):
    xyz = rng.random((3000, 3)).astype(np.float32)
    rgba = np.full(3000, 0x00405060, np.uint32)
    state = build_state(xyz, rgba)
    from simlod_tpu.octree.inspect import voxel_cells
    before = (int(state.num_nodes), int(state.vox_used),
              voxel_cells(state).copy())
    state = colorfilter.filter_colors(CFG, state)
    after = (int(state.num_nodes), int(state.vox_used),
             voxel_cells(state))
    assert before[0] == after[0] and before[1] == after[1]
    np.testing.assert_array_equal(before[2], after[2])
    # uniform input colors -> averages stay that color
    vu = int(state.vox_used)
    assert (np.asarray(state.vox_rgba)[:vu] & 0xFFFFFF == 0x405060).all()
