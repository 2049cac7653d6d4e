"""Per-frame phase breakdown of the simultaneous streaming loop (bench phase 4).

r5 measured 1305 ms/frame at 16M where the expected cost is ~130 ms
(one 2M-point build step ~90 ms + pooled render ~30 ms). This instruments
Engine.frame's components: stream-pool rebuild, window probe, fused dispatch,
compaction, budget adaptation.
"""
import os
import sys
import tempfile
import time

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[sf {time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


N = int(os.environ.get("SF_POINTS", 16_000_000))
STEP = int(os.environ.get("SF_STEP", 2 << 20))

import jax  # noqa: E402

from simlod_tpu.utils import cache as _cache  # noqa: E402
_cache.enable()
from simlod_tpu.config import EngineConfig  # noqa: E402
from simlod_tpu.engine import Engine  # noqa: E402
from simlod_tpu.formats import simlod as simlod_fmt  # noqa: E402
from simlod_tpu.formats import synthetic  # noqa: E402

log(f"platform={jax.devices()[0].platform} N={N}")

cache_npz = os.path.join("/tmp", f"bench_terrain_{64_000_000}.npz")
if os.path.exists(cache_npz):
    with np.load(cache_npz) as z:
        xyz, rgba = z["xyz"][:N], z["rgba"][:N]
else:
    xyz, rgba = synthetic.terrain(N, seed=11)

cfg = EngineConfig(
    raster_exact_tiebreak=False,
    node_capacity=1 << 19,
    point_capacity=max(N + (1 << 20), 1 << 24),
    voxel_capacity=1 << 26, segment_capacity=1 << 21,
    step_points=STEP, spill_capacity=1 << 20, seg_select_cap=2048,
    max_render_points=8 << 20, max_render_voxels=8 << 20)

path = os.path.join(tempfile.gettempdir(), f"bench_{N}.simlod")
if not os.path.exists(path):
    simlod_fmt.write(path, xyz, rgba)
n_warm = min(N, max(N // 8, 2 * STEP))
warm_path = os.path.join(tempfile.gettempdir(), f"bench_{n_warm}.simlod")
if not os.path.exists(warm_path):
    simlod_fmt.write(warm_path, xyz[:n_warm], rgba[:n_warm])

eng = Engine(cfg)
eng.settings.frame_budget_ms = 50.0
eng.settings.point_budget = 1.0

# --- instrument the frame components ---
PROF = {}


def wrap(obj, name):
    fn = getattr(obj, name)

    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        PROF[name] = PROF.get(name, 0.0) + (time.perf_counter() - t0)
        PROF[name + "#"] = PROF.get(name + "#", 0) + 1
        return r
    setattr(obj, name, inner)


for meth in ("_ensure_stream_pool", "_pooled_windows_cached", "_maybe_compact",
             "_note_visible", "uniforms", "_marks"):
    wrap(eng, meth)

W, H = 1920, 1080
for rep, pth, npts in (("warm", warm_path, n_warm), ("timed", path, N)):
    eng.open([pth], chunk_steps=1, pin_total=N)
    PROF.clear()
    t0 = time.perf_counter()
    frames = 0
    while not eng.last_batch_finished:
        ft0 = time.perf_counter()
        eng.orbit.yaw += 0.03
        eng.camera.world = eng.orbit.world()
        img, _st = eng.frame(W, H)
        fdt = time.perf_counter() - ft0
        if rep == "timed":
            log(f"  frame {frames}: {fdt*1e3:7.1f} ms  "
                f"bpf={getattr(eng, '_batches_per_frame', 1)}")
        frames += 1
    dt = time.perf_counter() - t0
    eng.stream.stop()
    comp = {k: round(v, 3) for k, v in PROF.items() if not k.endswith("#")}
    cnt = {k: v for k, v in PROF.items() if k.endswith("#")}
    log(f"{rep}: {frames} frames ({npts} pts) in {dt:.2f}s "
        f"({dt/max(frames,1)*1e3:.1f} ms/frame, {npts/dt/1e6:.2f} MP/s)")
    log(f"  components: {comp}")
    log(f"  counts: {cnt}")
    log(f"  t_fused rows: {eng.t_fused.row()}")
