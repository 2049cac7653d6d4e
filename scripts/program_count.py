"""Compile-budget audit: count every distinct XLA program a bench-shaped run
compiles, grouped by function name (VERDICT r2 item 8).

The window-bucketing scheme (pow2 compaction windows, 1/8-pow2 render windows,
chunked build programs) trades steady-state speed for extra program
specializations; this script makes the trade visible. Run on CPU (fast, exact
same trace/lowering structure as TPU) or on the TPU to also see compile
seconds.

Usage: python scripts/program_count.py [n_points]
"""
from __future__ import annotations

import collections
import logging
import os
import re
import sys
import time

if "--cpu" in sys.argv or os.environ.get("PC_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


class CompileCounter(logging.Handler):
    """Counts jax 'Finished XLA compilation of <name> in <secs> sec' records."""

    RE = re.compile(r"Finished XLA compilation of (\S+) in ([0-9.eE+-]+) sec")

    def __init__(self):
        super().__init__()
        self.counts = collections.Counter()
        self.seconds = collections.Counter()

    def emit(self, record):
        m = self.RE.search(record.getMessage())
        if m:
            self.counts[m.group(1)] += 1
            self.seconds[m.group(1)] += float(m.group(2))


def main() -> int:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 4_000_000

    counter = CompileCounter()
    logging.getLogger("jax._src.dispatch").addHandler(counter)
    logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
    jax.config.update("jax_log_compiles", True)

    from simlod_tpu.config import EngineConfig, Settings
    from simlod_tpu.engine import Engine
    from simlod_tpu.formats import synthetic, simlod as sfmt

    cfg = EngineConfig(
        node_capacity=1 << 16,
        point_capacity=max(n_points + (1 << 18), 1 << 22),
        voxel_capacity=1 << 23, segment_capacity=1 << 18,
        step_points=1 << 19, spill_capacity=1 << 17, seg_select_cap=2048,
        max_render_points=1 << 21, max_render_voxels=1 << 22)

    xyz, rgba = synthetic.terrain(n_points, seed=11)
    path = f"/tmp/pc_{n_points}.simlod"
    if not os.path.exists(path):
        sfmt.write(path, xyz, rgba)

    t0 = time.perf_counter()
    eng = Engine(cfg, Settings())
    eng.open([path])
    eng.load_all()
    eng.stream.stop()
    t_load = time.perf_counter() - t0

    # a frame at two zoom levels exercises the bucketed render windows
    from simlod_tpu.render import camera as cam
    t0 = time.perf_counter()
    for radius_scale in (1.0, 0.3):
        eng.orbit.radius *= radius_scale
        eng.camera.world = eng.orbit.world()
        eng.render(640, 360)
    t_render = time.perf_counter() - t0

    total = sum(counter.counts.values())
    print(f"\n=== {total} XLA programs compiled "
          f"(load {t_load:.0f}s, render {t_render:.0f}s, platform "
          f"{jax.devices()[0].platform}) ===")
    for name, cnt in counter.counts.most_common():
        print(f"{cnt:4d}  {counter.seconds[name]:7.2f}s  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
