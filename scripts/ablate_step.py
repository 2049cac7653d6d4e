"""Ablation profiling of one build step's phases on real hardware.

Builds half the synthetic dataset, then times each phase (route / split_loop /
voxel candidates / insert / compaction) on the next batch against a frozen state.
Each timed program returns checksums of everything it writes so XLA can't DCE
ablated work (see docs/PERFORMANCE.md cost model).
"""
import functools
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("ABL_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("ABL_STEP", 2 << 20))


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state

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

    # build to the midpoint so the tree is representative
    state = init_state(cfg, np.zeros(3, np.float32), box_max)
    for s in range(n_steps // 2):
        x, y, z, c, n = batch(s)
        state = build.build_step(cfg, state, x, y, z, c, n)
    state = build.compact_voxels_auto(cfg, state)
    print(f"mid-build: nodes={int(state.num_nodes)} vox={int(state.vox_used)} "
          f"pool={int(state.pool_used)}", file=sys.stderr, flush=True)

    x, y, z, c, n = batch(n_steps // 2)

    def chk(st):
        return (st.num_nodes + st.vox_used + st.pool_used + st.num_segments
                + jnp.sum(st.counter) + jnp.sum(st.vox_node[:1024])
                + jnp.sum(st.seg_cnt[:1024])
                + st.pt_w0[:1024].sum())

    @functools.partial(jax.jit, static_argnums=0)
    def p_route(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        return (w.leaf.sum() + w.qx.sum() + w.lvl.sum()
                + w.w0.sum() + st.b_key0[:64].sum())

    @functools.partial(jax.jit, static_argnums=0)
    def p_runs(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        runs = build.compute_runs(cfg, w)
        return (w.leaf.sum() + w.qx.sum() + runs.r_cnt.sum()
                + runs.r_leaf.sum() + st.b_key0[:64].sum())

    @functools.partial(jax.jit, static_argnums=0)
    def p_split(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        st, w, runs, spill_extra = build.split_loop(cfg, st, w)
        return chk(st) + w.leaf.sum() + runs.r_cnt.sum() + spill_extra[0][:64].sum()

    @functools.partial(jax.jit, static_argnums=0)
    def p_vox(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        st, w, runs, spill_extra = build.split_loop(cfg, st, w)
        st = build.batch_voxel_candidates(cfg, st, w, spill_extra)
        return chk(st) + w.leaf.sum() + runs.r_cnt.sum()

    @functools.partial(jax.jit, static_argnums=0)
    def p_full(cfg, st, x, y, z, c, n):
        st = build.build_step_impl(cfg, st, x, y, z, c, n)
        return chk(st)

    progs = [("route", p_route), ("route+runs", p_runs),
             ("route+split", p_split),
             ("route+split+vox", p_vox), ("full step", p_full)]
    times = {}
    for name, fn in progs:
        out = fn(cfg, state, x, y, z, c, n)
        _ = int(out)  # forced scalar readback (axon: block_until_ready unreliable)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(cfg, state, x, y, z, c, n)
            _ = int(out)
            best = min(best, time.perf_counter() - t0)
        times[name] = best
        print(f"{name:20s} {best*1e3:8.1f} ms", file=sys.stderr, flush=True)

    prev = 0.0
    for name, _ in progs:
        print(f"{name:20s} total={times[name]*1e3:8.1f} ms  "
              f"delta={(times[name]-prev)*1e3:8.1f} ms", flush=True)
        prev = times[name]
    return 0


if __name__ == "__main__":
    sys.exit(main())
