"""Bisect _split_round's 125 ms/iter (differential, RTT-proof)."""
import functools
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("ABL_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("ABL_STEP", 2 << 20))
R = 6


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state
    from simlod_tpu.ops.fastops import gather1d
    from simlod_tpu.ops.segments import (compact_mask_via_sort, exclusive_cumsum,
                                         run_reduce_sum, run_starts)
    from simlod_tpu.ops import ragged, morton

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=STEP_POINTS,
        spill_capacity=STEP_POINTS,
    )
    xyz, rgba = synthetic.terrain(N_POINTS, seed=11)
    box_max = xyz.max(axis=0)
    B = cfg.step_points
    n_steps = (N_POINTS + B - 1) // B

    def batch(s):
        lo, hi = s * B, min((s + 1) * B, N_POINTS)
        cols = [np.zeros((B,), np.float32) for _ in range(3)]
        cc = np.zeros((B,), np.uint32)
        for a in range(3):
            cols[a][: hi - lo] = xyz[lo:hi, a]
        cc[: hi - lo] = rgba[lo:hi]
        return (jax.device_put(cols[0]), jax.device_put(cols[1]),
                jax.device_put(cols[2]), jax.device_put(cc),
                jnp.asarray(hi - lo, jnp.int32))

    state = init_state(cfg, np.zeros(3, np.float32), box_max)
    for s in range(n_steps // 2):
        x, y, z, c, n = batch(s)
        state = build.build_step(cfg, state, x, y, z, c, n)
    state = build.compact_voxels_auto(cfg, state)
    print(f"mid-build: nodes={int(state.num_nodes)}", file=sys.stderr, flush=True)
    x, y, z, c, n = batch(n_steps // 2)

    def wrap(piece):
        @functools.partial(jax.jit, static_argnums=(0, 1))
        def run(cfg, reps, st0, x, y, z, c, n):
            st0, w0 = build.route(cfg, st0, x, y, z, c, n)
            r0 = build.compute_runs(cfg, w0)

            def it(i, acc):
                w = w0._replace(count=w0.count - (i & 1))
                return acc + piece(cfg, st0, w, r0)

            return jax.lax.fori_loop(0, reps, it, jnp.int32(0)) + w0.leaf.sum()
        return run

    def sel_only(cfg, st, w, r):
        """selection + gathers, no writes"""
        n_cap = st.child_base.shape[0]
        RW = r.r_leaf.shape[0]
        rvalid = jnp.arange(RW, dtype=jnp.int32) < jnp.minimum(r.n_runs, RW)
        lsafe = jnp.where(rvalid, r.r_leaf, 0)
        counter_r = gather1d(st.counter, lsafe)
        level_r = gather1d(st.level, lsafe)
        cb_r = gather1d(st.child_base, lsafe)
        over = (rvalid & (cb_r < 0)
                & (counter_r + r.r_cnt > cfg.max_points_per_node)
                & (level_r < cfg.max_depth))
        rank = jnp.cumsum(over.astype(jnp.int32))
        pts = jnp.where(over, counter_r, 0)
        segs = jnp.where(over, gather1d(st.node_seg_count, lsafe), 0)
        take = over & (rank <= cfg.max_splits_per_round)
        (tids_c, trow_c, tcnt_c), _ = compact_mask_via_sort(
            take, (r.r_leaf, r.r_row, r.r_cnt))
        return (rank[-1] + pts.sum() + segs.sum() + tids_c[:64].sum()
                + trow_c[:64].sum() + tcnt_c[:64].sum())

    def spill_only(cfg, st, w, r):
        """the spill pipeline body on a fixed 'just' set (no cond)"""
        n_cap = st.child_base.shape[0]
        s_cap = st.seg_node.shape[0]
        SS = cfg.seg_select_cap
        SPW = ragged.window_for(cfg.spill_capacity, SS)
        just = st.counter > (cfg.max_points_per_node - (w.count & 1) * 100)
        s_sel = (st.seg_cnt > 0) & (st.seg_node >= 0) & \
            just[jnp.clip(st.seg_node, 0, n_cap - 1)]
        (sel_full,), n_sel = compact_mask_via_sort(
            s_sel, (jnp.arange(s_cap, dtype=jnp.int32),))
        sv = jnp.arange(SS, dtype=jnp.int32) < n_sel
        ssafe = jnp.where(sv, sel_full[:SS], 0)
        scnt = jnp.where(sv, st.seg_cnt[ssafe], 0)
        soff = st.seg_off[ssafe]
        snode = jnp.where(sv, st.seg_node[ssafe], 0)
        rplan = ragged.plan(soff, scnt, SPW)
        gx = ragged.gather_column(rplan, st.pt_w0)
        gy = ragged.gather_column(rplan, st.pt_w1)
        gz = ragged.gather_column(rplan, st.pt_w2)
        gqx, gqy, gqz = morton.quantize_cols(gx, gy, gz, st.box_min, st.cube_size)
        glvl = st.level[snode][rplan.seg_of]
        pfx, pfy, pfz = morton.prefix_at_level(gqx, gqy, gqz, glvl)
        first = rplan.valid & ((pfx != jnp.roll(pfx, 1)) | (rplan.elem == 0))
        (cn, cc2), n_emit = compact_mask_via_sort(first, (gqx, gqy))
        srun = rplan.valid & ((rplan.elem == 0))
        runlen = run_reduce_sum(jnp.ones((SPW,), jnp.int32), srun, rplan.valid)
        return (cn[:64].sum() + cc2[:64].sum() + n_emit + runlen[:64].sum()
                + gz[:64].sum().astype(jnp.int32))

    def writes_only(cfg, st, w, r):
        """the directory/child-creation writes, reading results back"""
        st2, w2, nt = build._split_round(cfg, st, w, r)
        probe = jax.lax.dynamic_slice(
            st2.vox_node, (jnp.maximum(st2.vox_used - 512, 0),), (512,)).sum()
        return (st2.num_nodes + st2.num_segments + nt + probe
                + st2.anc[:512].sum() + st2.b_key0[:512].sum()
                + st2.counter[:512].sum() + w2.leaf[:512].sum())

    pieces = [("selection only", sel_only), ("spill body only", spill_only),
              ("full round (strong chk)", writes_only)]
    for name, piece in pieces:
        f = wrap(piece)
        for reps in (1, R):
            _ = int(f(cfg, reps, state, x, y, z, c, n))
        best1 = bestR = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(f(cfg, 1, state, x, y, z, c, n))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            _ = int(f(cfg, R, state, x, y, z, c, n))
            bestR = min(bestR, time.perf_counter() - t0)
        per = (bestR - best1) / (R - 1)
        print(f"{name:26s} {per*1e3:8.1f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
