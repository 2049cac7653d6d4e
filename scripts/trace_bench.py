"""Trace the BENCH-shaped 64M build and pooled render; print per-source-line
device-op aggregates. This is the profile that explains bench.py's headline
numbers (trace_step.py profiles one small-tree step instead).

Phases traced separately (TRB_WHAT=build|render|pool|all):
  build   one build_many over the whole staged 64M stack + convergence + compaction
  pool    the draw-pool build
  render  one pooled 1080p frame
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

N_POINTS = int(os.environ.get("TRB_POINTS", 64_000_000))
STEP_POINTS = int(os.environ.get("TRB_STEP", 2 << 20))
WHAT = os.environ.get("TRB_WHAT", "all")
WIDTH, HEIGHT = 1920, 1080


def agg_trace(tdir, label, scale=1.0):
    time.sleep(1)
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print(f"[{label}] no trace file found")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    # SELF time per event: while/cond/fusion events nest their children on the
    # same (pid, tid) lane — subtract child durations with an interval stack
    # so aggregates are not double-counted.
    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            lanes[(e["pid"], e.get("tid", 0))].append(e)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []   # (end_ts, key_index) — children subtract from parents
        selfs = []
        for e in lane:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            a = e.get("args", {})
            kind = e.get("name", "?").split(".")[0]
            key = f"{kind:<16s} {a.get('source', '')}".replace(
                "/root/repo/", "").rstrip()
            if stack:
                selfs[stack[-1][1]][1] -= dur   # child: subtract from parent
            selfs.append([key, dur])
            stack.append((ts + dur, len(selfs) - 1))
        for key, dur in selfs:
            ms = max(dur, 0) / 1e3
            agg[key] += ms
            cnt[key] += 1
            total += ms
    print(f"[{label}] total device SELF time: {total*scale:.1f} ms "
          f"(x{scale:g}) across {sum(cnt.values())} events")
    for key, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms*scale:9.2f} ms  x{cnt[key]:<6d} {key}")
    # largest single events: attributes aggregate lines that mix one giant
    # call with many small ones (e.g. full-capacity compaction sorts vs
    # frontier compactions, both compact_mask_via_sort)
    singles = []
    for lane in lanes.values():
        for e in lane:
            a = e.get("args", {})
            singles.append((e.get("dur", 0) / 1e3, e.get("name", "?"),
                            a.get("source", "").replace("/root/repo/", "")))
    singles.sort(reverse=True)
    print(f"[{label}] top single events:")
    for dur, name, src in singles[:25]:
        print(f"  {dur:9.2f} ms  {name[:60]:<60s} {src}")
    sys.stdout.flush()


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

    cfg = EngineConfig(
        raster_exact_tiebreak=False,
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=STEP_POINTS,
        spill_capacity=1 << 20,
        seg_select_cap=2048,
        max_render_points=8 << 20,
        max_render_voxels=8 << 20,
    )
    cache_npz = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"bench_terrain_{N_POINTS}.npz")
    if os.path.exists(cache_npz):
        with np.load(cache_npz) as z:
            xyz, rgba = z["xyz"], z["rgba"]
    else:
        xyz, rgba = synthetic.terrain(N_POINTS, seed=11)
    box_max = xyz.max(axis=0)
    B = cfg.step_points
    n_steps = (N_POINTS + B - 1) // B
    from simlod_tpu.io.transfer import device_put_plane

    t0 = time.perf_counter()
    planes = []
    for i, col in enumerate((xyz[:, 0], xyz[:, 1], xyz[:, 2], rgba)):
        buf = np.zeros((n_steps, B), np.float32 if i < 3 else np.uint32)
        buf.reshape(-1)[:N_POINTS] = col
        planes.append(device_put_plane(buf))
    counts = jax.device_put(np.asarray(
        [min(B, N_POINTS - s * B) for s in range(n_steps)], np.int32))
    jax.block_until_ready(planes)
    print(f"staged in {time.perf_counter()-t0:.1f}s", flush=True)

    def run_build(state=None):
        if state is None:
            state = init_state(cfg, np.zeros(3, np.float32), box_max)
        state = build.build_many(cfg, state, *planes, counts)
        for _ in range(32):
            ids, n_over = build.overfull_leaf_ids(cfg, state)
            if int(n_over) == 0:
                break
            state = build.split_finish(cfg, state, ids)
        state = build.compact_voxels_auto(cfg, state)
        return state

    t0 = time.perf_counter()
    state = run_build()
    _ = int(state.num_nodes)
    print(f"warm build in {time.perf_counter()-t0:.1f}s "
          f"nodes={int(state.num_nodes)}", flush=True)

    tdir = "/tmp/jaxtrace_bench"
    if WHAT in ("build", "all"):
        os.system(f"rm -rf {tdir}")
        fresh = init_state(cfg, np.zeros(3, np.float32), box_max)
        jax.block_until_ready(fresh.num_nodes)
        t0 = time.perf_counter()
        with jax.profiler.trace(tdir):
            state = run_build(fresh)
            _ = int(state.num_nodes)
        print(f"traced build: {time.perf_counter()-t0:.2f}s wall "
              f"= {N_POINTS/(time.perf_counter()-t0)/1e6:.1f} MP/s", flush=True)
        agg_trace(tdir, "build 64M")

    if WHAT in ("pool", "render", "all"):
        import dataclasses as _dc
        from simlod_tpu.engine import (_pool_need, _size_bucket,
                                       directory_window, sample_window)
        from simlod_tpu.ops import ragged as ragged_mod
        from simlod_tpu.render import drawpool as drawpool_mod
        from simlod_tpu.render.render import (probe_pooled_counts,
                                              render_frame_pooled)

        def build_pool(st):
            capd = cfg.draw_cap
            pool_w = _size_bucket(ragged_mod.window_for(
                int(st.pool_used), max(int(st.num_segments), 1)))
            vox_w = min(_size_bucket(max(int(st.vox_compacted), 128)),
                        (st.vox_k0.shape[0] // 128) * 128)
            node_w = directory_window(int(st.num_nodes), cfg.node_capacity)
            need = _pool_need(st, capd)
            live = int(st.num_nodes)
            pc = _size_bucket(int(need[0]) + 256 * live + 128)
            vc = _size_bucket(int(need[1]) + 256 * live + 128)
            return drawpool_mod.build_draw_pool(cfg, st, pool_w, vox_w,
                                                node_w, capd, pc, vc)

        pool = build_pool(state)
        jax.block_until_ready(pool.pt_off)
        if WHAT in ("pool", "all"):
            os.system(f"rm -rf {tdir}")
            t0 = time.perf_counter()
            with jax.profiler.trace(tdir):
                pool = build_pool(state)
                jax.block_until_ready(pool.pt_off)
            print(f"traced pool build: {time.perf_counter()-t0:.2f}s wall",
                  flush=True)
            agg_trace(tdir, "pool build")

        cm = cam.Camera(width=WIDTH, height=HEIGHT)
        ob = cam.OrbitControls()
        ob.focus_box(np.zeros(3), box_max)
        cm.world = ob.world()
        uu = Uniforms.make(WIDTH, HEIGHT, cm.transform(),
                           settings=_dc.replace(Settings(), point_budget=1.0))
        pp, pv, ep, ev = (int(v) for v in probe_pooled_counts(
            cfg, state, pool, uu))
        ws = tuple(sample_window(n, 0, cfg.max_render_points)
                   for n in (pp, pv, ep, ev))
        nw = directory_window(int(state.num_nodes), cfg.node_capacity)
        sw = directory_window(int(state.num_segments), cfg.segment_capacity)
        print(f"pooled windows: {ws} nw={nw} sw={sw}", flush=True)
        img, fst = render_frame_pooled(cfg, state, pool, WIDTH, HEIGHT, uu,
                                       *ws, nw, sw)
        jax.block_until_ready(img)
        if WHAT in ("render", "all"):
            os.system(f"rm -rf {tdir}")
            t0 = time.perf_counter()
            with jax.profiler.trace(tdir):
                for _ in range(4):
                    img, fst = render_frame_pooled(
                        cfg, state, pool, WIDTH, HEIGHT, uu, *ws, nw, sw)
                jax.block_until_ready(img)
            ms = (time.perf_counter() - t0) / 4 * 1e3
            print(f"traced pooled render: {ms:.2f} ms/frame wall "
                  f"truncated={bool(fst.truncated)}", flush=True)
            agg_trace(tdir, "pooled render x4", scale=0.25)
    return 0


if __name__ == "__main__":
    sys.exit(main())
