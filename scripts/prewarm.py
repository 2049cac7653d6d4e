"""Parallel pre-warm of the bench/engine program set.

TPU compiles arrive through a remote-compile tunnel here, and the big programs
take minutes each. Two facts make pre-warming effective (measured):
  - the persistent compilation cache (utils/cache.py) is shared across
    processes, and a cache hit loads in tens of milliseconds;
  - the compile service parallelizes across CLIENT PROCESSES — N distinct
    programs compiled from N processes take ~max(t_i), not sum(t_i).

So this script spawns one subprocess per program-set member; each traces and
compiles its programs (writing the shared cache) against throwaway data. Run it
once after any code or shape change; every later process starts warm.

Usage: python scripts/prewarm.py [--points N] [--step B] [--file-points N]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

WORKER = r"""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from simlod_tpu.utils import cache as _cache
_cache.enable()
from simlod_tpu.config import EngineConfig, Settings, Uniforms
from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state

what = sys.argv[1]
N = int(sys.argv[2]); STEP = int(sys.argv[3]); FP = int(sys.argv[4])

def cfg_for(points):
    return EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(points + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26, segment_capacity=1 << 21,
        step_points=STEP, spill_capacity=1 << 19, seg_select_cap=2048,
        max_render_points=4 << 20, max_render_voxels=4 << 20)

def tiny_batches(cfg, k):
    B = cfg.step_points
    rng = np.random.default_rng(0)
    bx = jax.device_put(rng.random((k, B), np.float32) * 10)
    bc = jax.device_put(np.zeros((k, B), np.uint32))
    bn = jax.device_put(np.full((k,), B, np.int32))
    return bx, bx, bx, bc, bn

t0 = time.perf_counter()
if what == "build":
    cfg = cfg_for(N)
    k = (N + cfg.step_points - 1) // cfg.step_points
    st = init_state(cfg, np.zeros(3, np.float32), np.full(3, 10.0, np.float32))
    st = build.build_many(cfg, st, *tiny_batches(cfg, k))
    jax.block_until_ready(st.num_nodes)
elif what == "compact":
    cfg = cfg_for(N)
    st = init_state(cfg, np.zeros(3, np.float32), np.full(3, 10.0, np.float32))
    # the near-capacity bucket and the final full bucket
    for w in {1 << max(10, (cfg.voxel_capacity - 1).bit_length()),
              cfg.voxel_capacity}:
        st = build._compact_voxels_window(cfg, st, min(w, st.vox_k0.shape[0]))
    jax.block_until_ready(st.num_nodes)
elif what == "filebuild":
    cfg = cfg_for(FP)
    k = cfg.steps_per_dispatch
    st = init_state(cfg, np.zeros(3, np.float32), np.full(3, 10.0, np.float32))
    st = build.build_many(cfg, st, *tiny_batches(cfg, k))
    jax.block_until_ready(st.num_nodes)
elif what == "step":
    cfg = cfg_for(N)
    B = cfg.step_points
    st = init_state(cfg, np.zeros(3, np.float32), np.full(3, 10.0, np.float32))
    x = jnp.zeros((B,), jnp.float32)
    st = build.build_step(cfg, st, x, x, x, jnp.zeros((B,), jnp.uint32),
                          jnp.int32(0))
    jax.block_until_ready(st.num_nodes)
print(f"[prewarm:{what}] done in {time.perf_counter()-t0:.0f}s", flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=64_000_000)
    ap.add_argument("--step", type=int, default=2 << 20)
    ap.add_argument("--file-points", type=int, default=None)
    ap.add_argument("--what", nargs="*", default=["build", "compact",
                                                  "filebuild", "step"])
    args = ap.parse_args()
    fp = args.file_points or args.points
    t0 = time.perf_counter()
    procs = {}
    for what in args.what:
        procs[what] = subprocess.Popen(
            [sys.executable, "-c", WORKER, what, str(args.points),
             str(args.step), str(fp)],
            stdout=sys.stderr, stderr=subprocess.DEVNULL)
    rc = 0
    for what, p in procs.items():
        rc |= p.wait()
    print(f"[prewarm] all done in {time.perf_counter()-t0:.0f}s rc={rc}",
          file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
