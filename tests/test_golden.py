"""Golden-image regression tests: frame-level safety net for rasterizer rewrites
(SURVEY section 4 test plan; VERDICT round 1 item 8).

Fixtures: deterministic synthetic clouds + fixed cameras -> small PPM goldens in
tests/golden/. Plain shading must match pixel-exactly; HQS allows a +-1/channel
tolerance (integer-vs-float averaging). Regenerate intentionally with
REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from simlod_tpu.config import EngineConfig, Settings, Uniforms
from simlod_tpu.formats import synthetic
from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state
from simlod_tpu.render import camera as cam
from simlod_tpu.render.render import image_to_rgba8, render_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
W, H = 160, 120

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 13,
    node_capacity=1 << 12, point_capacity=1 << 17, voxel_capacity=1 << 19,
    segment_capacity=1 << 14, step_points=1 << 13, spill_capacity=1 << 13,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=256,
    max_render_points=1 << 17, max_render_voxels=1 << 17,
)


def build_cloud():
    xyz, rgba = synthetic.terrain(60_000, seed=23, extent=1.0, z_scale=0.4)
    box_max = np.maximum(xyz.max(0), 1e-3)
    state = init_state(CFG, np.zeros(3, np.float32), box_max)
    B = CFG.step_points
    for s in range(0, len(xyz), B):
        chunk, cols = xyz[s:s + B], rgba[s:s + B]
        cx = np.zeros((B, 3), np.float32); cx[:len(chunk)] = chunk
        cc = np.zeros((B,), np.uint32); cc[:len(chunk)] = cols
        state = build.build_step(
            CFG, state,
            jnp.asarray(np.ascontiguousarray(cx[:, 0])),
            jnp.asarray(np.ascontiguousarray(cx[:, 1])),
            jnp.asarray(np.ascontiguousarray(cx[:, 2])),
            jnp.asarray(cc), jnp.int32(len(chunk)))
    state = build.compact_voxels(CFG, state)
    return state, box_max


def fixture_uniforms(box_max, yaw, pitch, hqs, min_node_size=8.0):
    c = cam.Camera(width=W, height=H)
    orbit = cam.OrbitControls()
    orbit.focus_box([0, 0, 0], box_max)
    orbit.yaw, orbit.pitch = yaw, pitch
    c.world = orbit.world()
    s = Settings(use_high_quality_shading=hqs, min_node_size=min_node_size,
                 enable_edl=True)
    return Uniforms.make(W, H, c.transform(), settings=s)


def read_ppm(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        f.readline()
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def write_ppm_rgb(path, rgb):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
        f.write(rgb.tobytes())


FIXTURES = [
    ("front_hqs", 0.0, -0.6, True),
    ("front_plain", 0.0, -0.6, False),
    ("side_hqs", 1.2, -0.3, True),
]


@pytest.fixture(scope="module")
def cloud():
    return build_cloud()


@pytest.mark.parametrize("name,yaw,pitch,hqs", FIXTURES)
def test_golden(cloud, name, yaw, pitch, hqs):
    state, box_max = cloud
    u = fixture_uniforms(box_max, yaw, pitch, hqs)
    img, _ = render_frame(CFG, state, W, H, u)
    rgb = image_to_rgba8(np.asarray(img))[..., :3]
    path = os.path.join(GOLDEN_DIR, f"{name}.ppm")
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_ppm_rgb(path, rgb)
        if not os.environ.get("REGEN_GOLDEN"):
            pytest.skip(f"golden {name} created; re-run to compare")
        return
    want = read_ppm(path)
    diff = np.abs(rgb.astype(np.int32) - want.astype(np.int32))
    if hqs:
        # integer-vs-float averaging paths may differ by 1 in a channel;
        # EDL multiplies that into at most a few counts
        assert diff.max() <= 4, f"{name}: max channel diff {diff.max()}"
        assert (diff > 1).mean() < 0.01
    else:
        assert diff.max() == 0, f"{name}: {int((diff > 0).sum())} bytes differ"
