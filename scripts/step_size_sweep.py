"""Sweep step_points for the device-resident build (VERDICT r4 item 3).

Per-2M-step fixed costs (cascade/round-major while_loops, small-window
compacts, binary searches) amortize over bigger steps while the full-width
sorts scale linearly — this measures where the knee is on the real chip.

SS_POINTS total points, SS_STEPS comma-separated step sizes (in MiB of points).
"""
import os
import sys
import time

import numpy as np

N = int(os.environ.get("SS_POINTS", 16_000_000))
STEPS = [int(s) << 20 for s in
         os.environ.get("SS_STEPS", "2,4,8").split(",")]


def log(msg):
    print(f"[sweep] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.io.transfer import device_put_plane
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state

    cache_npz = os.path.join("/tmp", f"bench_terrain_{N}.npz")
    if os.path.exists(cache_npz):
        with np.load(cache_npz) as z:
            xyz, rgba = z["xyz"], z["rgba"]
    else:
        big = "/tmp/bench_terrain_64000000.npz"
        if os.path.exists(big) and N <= 64_000_000:
            with np.load(big) as z:
                xyz, rgba = z["xyz"][:N], z["rgba"][:N]
        else:
            xyz, rgba = synthetic.terrain(N, seed=11)
    box_max = xyz.max(axis=0)

    for B in STEPS:
        scale = max(B // (2 << 20), 1)
        cfg = EngineConfig(
            node_capacity=1 << 19,
            point_capacity=max(N + (1 << 20), 1 << 24),
            voxel_capacity=1 << 26, segment_capacity=1 << 21,
            step_points=B,
            spill_capacity=(1 << 19) * scale,
            seg_select_cap=2048 * scale,
            cand_multi_rows=(1 << 18) * scale,
            max_render_points=4 << 20, max_render_voxels=4 << 20)
        n_steps = (N + B - 1) // B
        planes = []
        for s in range(n_steps):
            lo, hi = s * B, min((s + 1) * B, N)
            cols = [np.zeros((B,), np.float32) for _ in range(3)]
            cc = np.zeros((B,), np.uint32)
            for a in range(3):
                cols[a][: hi - lo] = xyz[lo:hi, a]
            cc[: hi - lo] = rgba[lo:hi]
            planes.append((cols[0], cols[1], cols[2], cc, hi - lo))
        bx = device_put_plane(np.stack([p[0] for p in planes]))
        by = device_put_plane(np.stack([p[1] for p in planes]))
        bz = device_put_plane(np.stack([p[2] for p in planes]))
        bc = device_put_plane(np.stack([p[3] for p in planes]))
        counts = device_put_plane(
            np.asarray([p[4] for p in planes], np.int32))
        jax.block_until_ready((bx, by, bz, bc))
        del planes

        t0 = time.perf_counter()
        state = init_state(cfg, np.zeros(3, np.float32), box_max)
        state = build.build_many(cfg, state, bx, by, bz, bc, counts)
        nodes = int(state.num_nodes)
        log(f"step={B>>20}M warm: {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for rep in range(2):
            fresh = init_state(cfg, np.zeros(3, np.float32), box_max)
            jax.block_until_ready(fresh.num_nodes)
            t0 = time.perf_counter()
            fresh = build.build_many(cfg, fresh, bx, by, bz, bc, counts)
            nodes = int(fresh.num_nodes)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            dropped = int(fresh.num_points_dropped)
            cdrop = int(fresh.num_candidates_dropped)
            del fresh
        log(f"step={B>>20}M: {best:.2f}s = {N/best/1e6:.1f} MP/s "
            f"nodes={nodes} dropped={dropped} cand_dropped={cdrop}")
        del bx, by, bz, bc, state


if __name__ == "__main__":
    main()
