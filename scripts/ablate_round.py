"""Differential (RTT-cancelling) cost breakdown of one split round.

Repeats pieces of _split_round R times inside one jit against a frozen
mid-build state; per-piece cost = (t(R) - t(1)) / (R - 1).
"""
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

    def chk(st):
        return (st.num_nodes + st.vox_used + st.num_segments
                + jnp.sum(st.counter[:4096]))

    def wrap(piece):
        @functools.partial(jax.jit, static_argnums=(0, 1))
        def run(cfg, reps, st0, x, y, z, c, n):
            st0, w0 = build.route(cfg, st0, x, y, z, c, n)
            r0 = build.compute_runs(cfg, w0)

            def it(i, acc):
                # perturb one scalar so iterations can't be CSE'd; state/work
                # shapes stay identical
                w = w0._replace(count=w0.count - (i & 1))
                out = piece(cfg, st0, w, r0)
                return acc + out

            return jax.lax.fori_loop(0, reps, it, jnp.int32(0)) + w0.leaf.sum()
        return run

    def full_round(cfg, st, w, r):
        st, w, nt = build._split_round(cfg, st, w, r)
        return chk(st) + w.leaf.sum() + nt

    def runs_only(cfg, st, w, r):
        rr = build.compute_runs(cfg, w)
        return rr.r_cnt.sum() + rr.n_runs + rr.r_row[:64].sum()

    def vox_only(cfg, st, w, r):
        st = build.batch_voxel_candidates(cfg, st, w)
        return chk(st)

    def insert_only(cfg, st, w, r):
        st = build.insert_points(cfg, st, w, r)
        return chk(st)

    pieces = [("split_round", full_round), ("compute_runs", runs_only),
              ("voxel_candidates", vox_only), ("insert_points", insert_only)]
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
        print(f"{name:20s} {per*1e3:8.1f} ms/iter", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
