"""Bottom-up voxel color filtering — the reference's post-hoc colorfilter pass (C11,
colorfilter.cu, disabled upstream at main_progressive_octree.cpp:628-634).

Each inner node's voxel colors are replaced by the AVERAGE color of its children's
samples (child points for leaves, child voxels — already filtered — for inner nodes)
falling into the voxel's 128^3 cell. This removes the "first-come color" popping between
LOD levels. The reference bins into per-node 64^3 grids with packed u64 atomicAdds
(colorfilter.cu:146-160); a node's 128-cell is exactly (child octant bit, child 64-cell),
so the sample's target cell is just cell_at_level(q, node.level).

TPU-native formulation: process levels bottom-up; per level, gather all child samples
into a dense window, sort by (parent node, cell), segment-average, and scatter into the
voxel store. Because (a) the store is (node, cell)-sorted and (b) every parent voxel
cell is guaranteed to receive at least one child sample (the point that created the
cell is itself represented below — the reference asserts the same equality at
colorfilter.cu:393-398), the aggregated runs align 1:1 with the store's entries for
that level's nodes, and the update is a plain scatter at the expanded store indices.

Requires a freshly compacted voxel store (exact CSR). Host-driven over levels with
power-of-two-padded windows (one jit per window size, reused across levels/calls).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import EngineConfig
from ..ops import morton
from ..ops.segments import expand_segments, run_reduce_sum, run_starts
from .structures import OctreeState

I32_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnums=0)
def _level_counts(cfg: EngineConfig, state: OctreeState, lvl: jax.Array):
    """(#voxel samples, #point samples, #store entries) for children at level lvl+1 /
    parents at level lvl."""
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    active = ids < state.num_nodes
    child_sel = active & (state.level == lvl + 1)
    parent_sel = active & (state.level == lvl) & (state.child_base >= 0)
    csr = state.vox_vcnt
    n_vox = jnp.sum(jnp.where(child_sel, csr, 0))
    seg_ok = (state.seg_cnt > 0) & (state.seg_node >= 0)
    seg_lvl = state.level[jnp.clip(state.seg_node, 0, n_cap - 1)]
    n_pts = jnp.sum(jnp.where(seg_ok & (seg_lvl == lvl + 1), state.seg_cnt, 0))
    n_store = jnp.sum(jnp.where(parent_sel, csr, 0))
    return n_vox, n_pts, n_store


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4), donate_argnums=1)
def _filter_level(cfg: EngineConfig, state: OctreeState, vw: int, pw: int, sw: int,
                  lvl: jax.Array) -> OctreeState:
    """Filter all inner nodes at level `lvl` from their level lvl+1 children."""
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    active = ids < state.num_nodes
    child_sel = active & (state.level == lvl + 1)
    parent_sel = active & (state.level == lvl) & (state.child_base >= 0)
    csr_cnt = state.vox_vcnt

    # --- child voxel samples ---
    vcnt = jnp.where(child_sel, csr_cnt, 0)
    vnode, velem, vvalid, _ = expand_segments(vcnt, vw)
    v_cap = state.vox_k0.shape[0]
    vidx = jnp.where(vvalid, state.vox_voff[vnode] + velem, v_cap - 1)
    # child voxel coords at resolution 2^(clvl+7) straight from the global key
    # (the decoded prefix has its low bits zero: shift down to the prefix value)
    vqx28, vqy28, vqz28 = morton.decode(
        state.vox_k0[vidx], state.vox_k1[vidx], state.vox_k2l[vidx] & ~31)
    down = C.FULL_GRID_BITS - ((lvl + 1) + C.GRID_BITS)
    vrgba = state.vox_rgba[vidx]
    # parent (lvl) cell coords = child-resolution coords >> 1
    pvx = (vqx28 >> down) >> 1
    pvy = (vqy28 >> down) >> 1
    pvz = (vqz28 >> down) >> 1
    # re-align to 28-bit coords for the parent-level global key
    up = C.FULL_GRID_BITS - (lvl + C.GRID_BITS)
    pk0, pk1, pk2l = morton.key_words_at_level(
        *morton.encode(pvx << up, pvy << up, pvz << up), lvl)
    vparent = jnp.where(vvalid, state.parent[vnode], n_cap)

    # --- child point samples ---
    seg_ok = (state.seg_cnt > 0) & (state.seg_node >= 0)
    seg_node_safe = jnp.clip(state.seg_node, 0, n_cap - 1)
    seg_sel = seg_ok & (state.level[seg_node_safe] == lvl + 1) \
        & (state.child_base[seg_node_safe] < 0)
    pcnt = jnp.where(seg_sel, state.seg_cnt, 0)
    pseg, pelem, pvalid, _ = expand_segments(pcnt, pw)
    p_cap = state.pt_w0.shape[0]
    pidx = jnp.where(pvalid, state.seg_off[pseg] + pelem, p_cap - 1)
    prgba = state.pt_rgba[pidx]
    # the pool stores Morton words: the level key masks them directly (exact —
    # no float round trip)
    qk0, qk1, qk2l = morton.key_words_at_level(
        state.pt_w0[pidx], state.pt_w1[pidx], state.pt_w2[pidx], lvl)
    ppnode = state.parent[seg_node_safe[pseg]]
    pparent = jnp.where(pvalid, ppnode, n_cap)

    # --- aggregate: sort by (parent, global cell key), segment-average ---
    # (the store's within-node row order IS ascending key order, so rank pairing
    # against the target expansion below stays valid)
    node_k = jnp.concatenate([vparent, pparent])
    ck0 = jnp.concatenate([pk0, qk0])
    ck1 = jnp.concatenate([pk1, qk1])
    ck2 = jnp.concatenate([pk2l, qk2l])
    col = jnp.concatenate([vrgba, prgba])
    valid = jnp.concatenate([vvalid, pvalid])
    node_k = jnp.where(valid, node_k, I32_MAX)
    r = (col & 0xFF).astype(jnp.int32)
    g = ((col >> 8) & 0xFF).astype(jnp.int32)
    b = ((col >> 16) & 0xFF).astype(jnp.int32)
    snode, sk0, sk1, sk2, sr, sg, sb = jax.lax.sort(
        (node_k, ck0, ck1, ck2, r, g, b), num_keys=4, is_stable=False)
    svalid = snode < I32_MAX
    key_change = (snode != jnp.roll(snode, 1)) | (sk0 != jnp.roll(sk0, 1)) \
        | (sk1 != jnp.roll(sk1, 1)) | (sk2 != jnp.roll(sk2, 1))
    starts = run_starts(snode, svalid) | (key_change & svalid)
    starts = starts & svalid
    ones = jnp.ones_like(sr)
    rs = run_reduce_sum(sr, starts, svalid)
    gs = run_reduce_sum(sg, starts, svalid)
    bs = run_reduce_sum(sb, starts, svalid)
    cs = jnp.maximum(run_reduce_sum(ones, starts, svalid), 1)
    avg = (((rs // cs) & 0xFF).astype(jnp.uint32)
           | (((gs // cs) & 0xFF).astype(jnp.uint32) << 8)
           | (((bs // cs) & 0xFF).astype(jnp.uint32) << 16))

    # compact the run-start rows (aggregated uniques, (node,cell)-sorted)
    arank = jnp.cumsum(starts.astype(jnp.int32)) - 1
    agg_col = jnp.zeros((sw,), jnp.uint32).at[
        jnp.where(starts, jnp.minimum(arank, sw), sw)].set(avg, mode="drop")
    n_agg = jnp.sum(starts.astype(jnp.int32))

    # --- scatter into the store: level-lvl store entries, in (node,cell) order ---
    scnt = jnp.where(parent_sel, csr_cnt, 0)
    tnode, telem, tvalid, _ = expand_segments(scnt, sw)
    # row j of the target expansion pairs with aggregated unique j (both are the
    # level's (node, cell) keys in ascending order; the sets are equal — see module
    # docstring / reference assert at colorfilter.cu:393-398)
    trank = jnp.arange(sw, dtype=jnp.int32)
    ok = tvalid & (trank < n_agg)
    tidx = jnp.where(ok, state.vox_voff[tnode] + telem, v_cap)
    state.vox_rgba = state.vox_rgba.at[tidx].set(agg_col, mode="drop")
    return state


def filter_colors(cfg: EngineConfig, state: OctreeState) -> OctreeState:
    """Run the full bottom-up color filter (host-driven over levels).

    The voxel store must be compacted first (exact CSR); callers typically run
    build.compact_voxels then this.
    """
    max_level = int(np.asarray(
        jnp.max(jnp.where(jnp.arange(state.level.shape[0]) < state.num_nodes,
                          state.level, 0))))

    def round_pow2(n, lo=1 << 10):
        n = max(int(n), lo)
        return 1 << (n - 1).bit_length()

    for lvl in range(max_level - 1, -1, -1):
        n_vox, n_pts, n_store = _level_counts(cfg, state, jnp.int32(lvl))
        n_vox, n_pts, n_store = int(n_vox), int(n_pts), int(n_store)
        if n_store == 0:
            continue
        vw = round_pow2(n_vox)
        pw = round_pow2(n_pts)
        sw = round_pow2(max(n_store, n_vox + n_pts))
        state = _filter_level(cfg, state, vw, pw, sw, jnp.int32(lvl))
    return state
