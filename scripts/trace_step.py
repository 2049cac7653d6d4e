"""Capture an XLA profiler trace of one build step + one frame, print top ops.

Parses the trace-viewer JSON emitted by jax.profiler and aggregates device-op
durations by name, so hotspots are attributable without TensorBoard.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

N_POINTS = int(os.environ.get("TR_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("TR_STEP", 2 << 20))
WIDTH, HEIGHT = 1920, 1080
WHAT = os.environ.get("TR_WHAT", "step")  # step | render


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig, Settings, Uniforms
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state
    from simlod_tpu.render import camera as cam
    from simlod_tpu.render.render import render_frame

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=STEP_POINTS,
        spill_capacity=1 << 19,
        seg_select_cap=2048,
        max_render_points=4 << 20,
        max_render_voxels=4 << 20,
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
    upto = n_steps // 2 if WHAT == "step" else n_steps
    for s in range(upto):
        x, y, z, c, n = batch(s)
        state = build.build_step(cfg, state, x, y, z, c, n)
    state = build.compact_voxels_auto(cfg, state)
    print(f"built: nodes={int(state.num_nodes)}", file=sys.stderr, flush=True)

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")

    if WHAT == "step":
        x, y, z, c, n = batch(upto)
        s2 = build.build_step(cfg, state, x, y, z, c, n)  # compile (donates state!)
        del s2
        state = init_state(cfg, np.zeros(3, np.float32), box_max)
        for s in range(upto):
            xx, yy, zz, cc2, nn = batch(s)
            state = build.build_step(cfg, state, xx, yy, zz, cc2, nn)
        jax.block_until_ready(state.num_nodes)
        with jax.profiler.trace(tdir):
            st2 = build.build_step(cfg, state, x, y, z, c, n)
            _ = int(st2.num_nodes)
    else:
        c = cam.Camera(width=WIDTH, height=HEIGHT)
        orbit = cam.OrbitControls()
        orbit.focus_box(np.zeros(3), box_max)
        c.world = orbit.world()
        u = Uniforms.make(WIDTH, HEIGHT, c.transform(), settings=Settings())
        from simlod_tpu.render.render import probe_visible_counts
        nvp, nvv = probe_visible_counts(state, u)

        def bucket(nv, cap):
            nv = max(int(nv * 1.25) + 1024, 1 << 18)
            return min(1 << (nv - 1).bit_length(), cap)
        pw = bucket(int(nvp), cfg.max_render_points)
        vw = bucket(int(nvv), cfg.max_render_voxels)
        def dbucket(n, cap):
            n = max(2 * n + 64, 4096)
            return min(1 << (n - 1).bit_length(), cap)
        nw = dbucket(int(state.num_nodes), cfg.node_capacity)
        sw = dbucket(int(state.num_segments), cfg.segment_capacity)
        img, _ = render_frame(cfg, state, WIDTH, HEIGHT, u, pw, vw, nw, sw)
        jax.block_until_ready(img)
        with jax.profiler.trace(tdir):
            img, _ = render_frame(cfg, state, WIDTH, HEIGHT, u, pw, vw, nw, sw)
            jax.block_until_ready(img)

    # aggregate device ops from the trace-viewer json
    time.sleep(1)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found", glob.glob(f"{tdir}/**", recursive=True))
        return 1
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device PIDs (process names containing 'TPU' / 'Device')
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    src = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
            a = e.get("args", {})
            if name not in src and "source" in a:
                src[name] = a["source"].replace("/root/repo/", "")
    print(f"total device op time: {total:.1f} ms across {sum(cnt.values())} events")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:40]:<42s} {src.get(name, '')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
