"""Phase-level profile of the file load path (VERDICT r3 item 1).

Breaks the streamed load into phases with wall-clock timestamps so the
donated-state/dispatch stall is attributable:

  stage    drain the PointStream iterator (decode + device_put issue)
  fence    block_until_ready on every staged plane (H2D completion tail)
  concat   device-side concatenation into one [K, B] stack
  build    ONE build_many dispatch over the whole stack
  finish   finish_splits convergence readback loop

Variants (PL_VARIANT):
  current  engine.load_all() as-is (group loop + vox_used readbacks)
  one      stage -> fence -> concat -> single dispatch -> finish

Run twice in-process (rep0 warms compiles; rep1 is the measurement).
"""
import os
import sys
import time

import numpy as np

N = int(os.environ.get("PL_POINTS", 16_000_000))
VARIANT = os.environ.get("PL_VARIANT", "one")
REPS = int(os.environ.get("PL_REPS", 2))


def log(msg):
    print(f"[profile_load] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.engine import Engine
    from simlod_tpu.formats import simlod as simlod_fmt, synthetic
    from simlod_tpu.octree import build

    path = os.path.join("/tmp", f"bench_{N}.simlod")
    if not os.path.exists(path):
        cache_npz = os.path.join("/tmp", f"bench_terrain_{N}.npz")
        if os.path.exists(cache_npz):
            with np.load(cache_npz) as z:
                xyz, rgba = z["xyz"], z["rgba"]
        else:
            big = os.path.join("/tmp", "bench_terrain_64000000.npz")
            if os.path.exists(big) and N <= 64_000_000:
                with np.load(big) as z:
                    xyz, rgba = z["xyz"][:N], z["rgba"][:N]
            else:
                xyz, rgba = synthetic.terrain(N, seed=11)
        simlod_fmt.write(path, xyz[:N], rgba[:N])
        log(f"wrote {path}")

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26, segment_capacity=1 << 21,
        step_points=2 << 20, spill_capacity=1 << 19,
        seg_select_cap=2048,
        max_render_points=4 << 20, max_render_voxels=4 << 20)
    eng = Engine(cfg)

    for rep in range(REPS):
        t00 = time.perf_counter()
        if VARIANT == "current":
            eng.open([path])
            eng.load_all()
            dt = time.perf_counter() - t00
            log(f"rep{rep} current: total {dt:.2f}s = {N/dt/1e6:.2f} MP/s "
                f"nodes={int(eng.state.num_nodes)} stream={eng.stream.stats()}")
            eng.stream.stop()
            continue

        eng.open([path])
        t0 = time.perf_counter()
        items = list(eng._stream_iter)
        t_stage = time.perf_counter() - t0

        t0 = time.perf_counter()
        for it in items:
            jax.block_until_ready(it[:4])
        t_fence = time.perf_counter() - t0

        t0 = time.perf_counter()
        if len(items) == 1:
            bx, by, bz, bc = items[0][:4]
            counts = jnp.asarray(items[0][4], jnp.int32)
        else:
            planes = [it[:4] + (np.asarray(it[4], np.int32),) for it in items]
            bx, by, bz, bc, counts = (
                jnp.concatenate([p[i] for p in planes]) for i in range(5))
            counts = jnp.asarray(counts, jnp.int32)
        jax.block_until_ready(bc)
        t_concat = time.perf_counter() - t0

        t0 = time.perf_counter()
        eng.state = build.build_many(cfg, eng.state, bx, by, bz, bc, counts)
        jax.block_until_ready(eng.state.num_nodes)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        eng.last_batch_finished = True
        eng.finish_splits()
        jax.block_until_ready(eng.state.num_nodes)
        t_finish = time.perf_counter() - t0

        dt = time.perf_counter() - t00
        log(f"rep{rep} one: total {dt:.2f}s = {N/dt/1e6:.2f} MP/s | "
            f"stage {t_stage:.2f} fence {t_fence:.2f} concat {t_concat:.2f} "
            f"build {t_build:.2f} finish {t_finish:.2f} | "
            f"nodes={int(eng.state.num_nodes)} vox={int(eng.state.vox_used)} "
            f"stream={eng.stream.stats()}")
        eng.stream.stop()


if __name__ == "__main__":
    main()
