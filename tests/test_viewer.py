"""Live viewer (viewer.py): PNG encoder + HTTP frame/stats endpoints against a
real engine (the headless counterpart of the reference's GLFW window, C14)."""
import json
import threading
import urllib.request
import zlib

import numpy as np

from simlod_tpu.config import EngineConfig, Settings
from simlod_tpu.engine import Engine
from simlod_tpu.viewer import ViewerServer, encode_png


def test_encode_png_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    png = encode_png(np.ascontiguousarray(rgb))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # decode by hand: IHDR then IDAT contains filter-0 scanlines
    assert png[12:16] == b"IHDR"
    w, h = int.from_bytes(png[16:20], "big"), int.from_bytes(png[20:24], "big")
    assert (w, h) == (7, 13)
    i = png.index(b"IDAT")
    n = int.from_bytes(png[i - 4:i], "big")
    raw = zlib.decompress(png[i + 4:i + 4 + n])
    got = np.frombuffer(raw, np.uint8).reshape(13, 7 * 3 + 1)[:, 1:].reshape(13, 7, 3)
    np.testing.assert_array_equal(got, rgb)


def test_viewer_serves_frames():
    rng = np.random.default_rng(2)
    cfg = EngineConfig(
        candidate_factor=21, node_capacity=1 << 12, point_capacity=1 << 16,
        voxel_capacity=1 << 18, segment_capacity=1 << 14, step_points=1 << 12,
        spill_capacity=1 << 12, max_splits_per_round=64, seg_select_cap=1 << 10,
        max_render_points=1 << 17, max_render_voxels=1 << 18)
    # min_node_size 8: at a 256x128 test frame the root leaf projects smaller
    # than the default 2*64 px isLarge threshold and would never be emitted
    # (reference selection, render.cu:918-932)
    eng = Engine(cfg, Settings(enable_edl=False, min_node_size=8.0))
    eng.reset(np.zeros(3, np.float32), np.ones(3, np.float32))
    B = cfg.step_points
    import jax.numpy as jnp
    xyz = rng.random((B, 3), dtype=np.float32)
    rgba = rng.integers(0, 2**32, B, dtype=np.uint64).astype(np.uint32)
    eng.ingest(jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]),
               jnp.asarray(xyz[:, 2]), jnp.asarray(rgba), B)
    eng.orbit.focus_box(np.zeros(3), np.ones(3))
    eng.camera.world = eng.orbit.world()

    v = ViewerServer(eng, width=256, height=128, port=0)
    # bind to an ephemeral port by standing the server up manually
    import http.server
    from simlod_tpu import viewer as viewer_mod
    srv_thread = threading.Thread(target=v.serve_forever, daemon=True)
    v.port = 18765
    srv_thread.start()
    import time
    base = f"http://127.0.0.1:{v.port}"
    for _ in range(50):
        try:
            page = urllib.request.urlopen(base + "/", timeout=5).read()
            break
        except OSError:
            time.sleep(0.2)
    assert b"canvas" in page and b"yaw" in page

    png = urllib.request.urlopen(
        base + "/frame?yaw=0.5&pitch=-0.4&radius=2.5", timeout=120).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w = int.from_bytes(png[16:20], "big")
    h = int.from_bytes(png[20:24], "big")
    assert (w, h) == (256, 128)

    stats = json.loads(urllib.request.urlopen(base + "/stats", timeout=30).read())
    assert stats["num_nodes"] >= 1
    assert stats["num_visible_points"] + stats["num_visible_voxels"] > 0
    assert stats["streaming"] is False
    assert stats["render_ms"] > 0

    # /bench: timed frames + the reference-style copyable stats table
    # (main_progressive_octree.cpp:1505-1556)
    bench = json.loads(urllib.request.urlopen(
        base + "/bench?frames=3", timeout=120).read())
    assert bench["frames"] == 3
    assert bench["timings"]["frame"]["count"] == 3
    assert bench["timings"]["frame"]["min_ms"] > 0
    assert "kernel" in bench["table"] and "nodes" in bench["table"]
