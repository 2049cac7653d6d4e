"""Decompose the r3->r4 build-throughput delta (VERDICT r4 item 8).

r3 timed an UNCONVERGED build (5953 nodes, no end-of-load split convergence,
no final compaction in the timed region): 25.0 MP/s.
r4 timed the converged build (9033 nodes): 18.1 MP/s.

This ablation times the same r5 code both ways at 64M so the delta decomposes
into (a) the convergence tail + final compaction and (b) everything else.
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 64_000_000))
B = 2 << 20

from simlod_tpu.utils import cache as _cache
_cache.enable()
from simlod_tpu.config import EngineConfig
from simlod_tpu.formats import synthetic
from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state
from simlod_tpu.io.transfer import device_put_plane

cfg = EngineConfig(
    node_capacity=1 << 19, point_capacity=max(N + (1 << 20), 1 << 24),
    voxel_capacity=1 << 26, segment_capacity=1 << 21, step_points=B,
    spill_capacity=1 << 20, seg_select_cap=2048,
    max_render_points=8 << 20, max_render_voxels=8 << 20)

cache_npz = f"/tmp/bench_terrain_{N}.npz"
with np.load(cache_npz) as zz:
    xyz, rgba = zz["xyz"], zz["rgba"]
box_max = xyz.max(axis=0)

n_steps = (N + B - 1) // B
cols = [np.zeros((n_steps, B), np.float32) for _ in range(3)]
cc = np.zeros((n_steps, B), np.uint32)
cnt = np.zeros((n_steps,), np.int32)
for s in range(n_steps):
    lo, hi = s * B, min((s + 1) * B, N)
    for a in range(3):
        cols[a][s, : hi - lo] = xyz[lo:hi, a]
    cc[s, : hi - lo] = rgba[lo:hi]
    cnt[s] = hi - lo
staged = (device_put_plane(cols[0]), device_put_plane(cols[1]),
          device_put_plane(cols[2]), device_put_plane(cc),
          jax.device_put(cnt))
jax.block_until_ready(staged[:4])
print("staged", flush=True)


def run(converge: bool, compact: bool):
    st = init_state(cfg, np.zeros(3, np.float32), box_max)
    jax.block_until_ready(st.num_nodes)
    t0 = time.perf_counter()
    st = build.build_many(cfg, st, *staged)
    _ = int(st.num_nodes)
    t_many = time.perf_counter() - t0
    t_conv = t_comp = 0.0
    if converge:
        t1 = time.perf_counter()
        for _i in range(32):
            ids, n_over = build.overfull_leaf_ids(cfg, st)
            if int(n_over) == 0:
                break
            st = build.split_finish(cfg, st, ids)
        _ = int(st.num_nodes)
        t_conv = time.perf_counter() - t1
    if compact:
        t2 = time.perf_counter()
        st = build.compact_voxels_auto(cfg, st)
        _ = int(st.vox_compacted)
        t_comp = time.perf_counter() - t2
    total = time.perf_counter() - t0
    print(f"converge={converge} compact={compact}: total {total:.2f}s = "
          f"{N/total/1e6:.1f} MP/s (build_many {t_many:.2f}s, converge "
          f"{t_conv:.2f}s, compact {t_comp:.2f}s), nodes={int(st.num_nodes)}",
          flush=True)
    del st


for rep in range(2):   # rep0 warms compiles
    print(f"--- rep {rep}", flush=True)
    run(converge=False, compact=False)   # r3 semantics
    run(converge=True, compact=True)     # r4/r5 semantics
