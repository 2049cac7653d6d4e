"""Renderer tests: projection math vs independent numpy, LOD selection behavior,
depth resolution (closest wins), HQS averaging, EDL toggle, frustum culling."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig, Settings, Uniforms
from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state
from simlod_tpu.render import camera as cam
from simlod_tpu.render.render import render_frame

W, H = 128, 96

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 12,
    node_capacity=1 << 12, point_capacity=1 << 16, voxel_capacity=1 << 18,
    segment_capacity=1 << 14, step_points=1 << 12, spill_capacity=1 << 12,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=64,
    max_render_points=1 << 16, max_render_voxels=1 << 16,
)

BG = C.BACKGROUND_COLOR


def build_state(xyz, rgba, compact=True):
    state = init_state(CFG, [0, 0, 0], [1, 1, 1])
    B = CFG.step_points
    for s in range(0, len(xyz), B):
        c, k = xyz[s:s+B], rgba[s:s+B]
        cx = np.zeros((B, 3), np.float32); cx[:len(c)] = c
        cc = np.zeros((B,), np.uint32); cc[:len(c)] = k
        state = build.build_step(
            CFG, state,
            jnp.asarray(np.ascontiguousarray(cx[:, 0])),
            jnp.asarray(np.ascontiguousarray(cx[:, 1])),
            jnp.asarray(np.ascontiguousarray(cx[:, 2])),
            jnp.asarray(cc), jnp.int32(len(c)))
    if compact:
        state = build.compact_voxels(CFG, state)
    return state


def look_at_cloud(width=W, height=H):
    c = cam.Camera(width=width, height=height)
    orbit = cam.OrbitControls()
    orbit.focus_box([0, 0, 0], [1, 1, 1])
    c.world = orbit.world()
    return c


def uniforms_for(c, settings=None):
    # the reference's default minNodeSize=64 is tuned for 1920px screens; at the test
    # viewport nothing would project "large", so tests lower the threshold
    s = settings or Settings()
    if s.min_node_size == Settings().min_node_size:
        s = dataclasses.replace(s, min_node_size=8.0)
    t = c.transform()
    return Uniforms.make(c.width, c.height, t, settings=s)


def expected_pixel(c, p):
    """Independent projection math (reference drawPoint, render.cu:61-75)."""
    t = c.transform().astype(np.float64)
    ndc = t @ np.array([p[0], p[1], p[2], 1.0])
    w = ndc[3]
    x = int((ndc[0] / w * 0.5 + 0.5) * c.width)
    y = int((ndc[1] / w * 0.5 + 0.5) * c.height)
    return x, y, w


def test_single_point_lands_on_expected_pixel(rng):
    p = np.array([[0.3, 0.6, 0.4]], np.float32)
    color = np.array([0x00112233], np.uint32)
    state = build_state(p, color)
    c = look_at_cloud()
    # plain shading to get the exact winner semantics
    s = Settings(use_high_quality_shading=False, enable_edl=False)
    img, stats = render_frame(CFG, state, W, H, uniforms_for(c, s))
    img = np.asarray(img)
    x, y, w = expected_pixel(c, p[0])
    assert 1 < x < W - 2 and 1 < y < H - 2
    assert img[y, x] == 0x00112233
    # everything else is background
    mask = img != BG
    assert mask.sum() == 1
    assert int(stats.num_visible_points) == 1


def test_closest_point_wins(rng):
    # two points projecting to the same pixel; nearer one must win (plain mode)
    c = look_at_cloud()
    # camera ray through pixel: take one point, then another slightly along the
    # view direction behind it
    p1 = np.array([0.41, 0.57, 0.46])
    eye = c.world[:3, 3]
    d = (p1 - eye) / np.linalg.norm(p1 - eye)
    p2 = p1 + d * 0.05  # farther from the camera, same ray
    pts = np.stack([p2, p1]).astype(np.float32)  # farther first in stream
    cols = np.array([0x00AAAAAA, 0x00111111], np.uint32)
    state = build_state(pts, cols)
    s = Settings(use_high_quality_shading=False, enable_edl=False)
    img, _ = render_frame(CFG, state, W, H, uniforms_for(c, s))
    img = np.asarray(img)
    x, y, _ = expected_pixel(c, p1)
    assert img[y, x] == 0x00111111


def test_hqs_averages(rng):
    # two coincident points with different colors -> average under HQS
    pts = np.array([[0.41, 0.57, 0.46], [0.41, 0.57, 0.46]], np.float32)
    cols = np.array([0x00000010, 0x00000020], np.uint32)  # R=16 and R=32
    state = build_state(pts, cols)
    c = look_at_cloud()
    s = Settings(use_high_quality_shading=True, enable_edl=False)
    img, _ = render_frame(CFG, state, W, H, uniforms_for(c, s))
    img = np.asarray(img)
    ys, xs = np.where(img != BG)
    # two lit pixels: the point splat AND the root's voxel (the root is a leaf but owns
    # a sampling grid, so it has both points and voxels — reference draws both)
    vals = img[ys, xs] & 0xFF
    assert 24 in vals  # the two coincident points averaged: (16+32)//2
    assert ((img[ys, xs] >> 24) == 0xFF).all()  # resolve sets alpha 255


def test_frustum_culling(rng):
    xyz = rng.random((500, 3)).astype(np.float32)
    state = build_state(xyz, np.full(500, 0x00FFFFFF, np.uint32))
    c = look_at_cloud()
    # camera looking away: rotate orbit 180 deg in pitch so cloud is behind
    orbit = cam.OrbitControls()
    orbit.focus_box([0, 0, 0], [1, 1, 1])
    orbit.target = orbit.target + np.array([0, 0, 1000.0])
    c.world = orbit.world()
    img, stats = render_frame(CFG, state, W, H,
                              uniforms_for(c, Settings(enable_edl=False)))
    assert int(stats.num_visible_nodes) == 0
    assert (np.asarray(img) == BG).all()


def test_lod_switches_points_to_voxels(rng):
    # enough points to split the root; a far camera must draw voxels, a near
    # camera (huge projected size) must draw leaf points
    xyz = rng.random((400, 3)).astype(np.float32)
    cfg = CFG
    state = build_state(xyz, np.full(400, 0x00808080, np.uint32))
    assert int(state.num_nodes) > 1  # split happened (64-point leaves)

    near = look_at_cloud()
    img_n, st_n = render_frame(cfg, state, W, H, uniforms_for(near))
    assert int(st_n.num_visible_points) > 0

    far = look_at_cloud()
    orbit = cam.OrbitControls()
    orbit.focus_box([0, 0, 0], [1, 1, 1])
    orbit.radius = 600.0  # tiny on screen -> nothing is "large"
    far.world = orbit.world()
    img_f, st_f = render_frame(cfg, state, W, H, uniforms_for(far))
    # with no node "large", nothing is emitted (reference semantics: selection
    # starts from large inner nodes / large leaves)
    assert int(st_f.num_visible_points) == 0

    mid = look_at_cloud()
    orbit.radius = 3.0
    mid.world = orbit.world()
    s_small = Settings(min_node_size=20.0)  # lower threshold -> voxels appear
    img_m, st_m = render_frame(cfg, state, W, H, uniforms_for(mid, s_small))
    assert int(st_m.num_visible_nodes) > 0


def test_edl_darkens_silhouettes(rng):
    xyz = (0.25 + 0.5 * rng.random((2000, 3))).astype(np.float32)
    state = build_state(xyz, np.full(2000, 0x00C0C0C0, np.uint32))
    c = look_at_cloud()
    img_off, _ = render_frame(CFG, state, W, H,
                              uniforms_for(c, Settings(enable_edl=False)))
    img_on, _ = render_frame(CFG, state, W, H,
                             uniforms_for(c, Settings(enable_edl=True)))
    a, b = np.asarray(img_off), np.asarray(img_on)
    assert (a != b).any()
    # EDL only darkens (or keeps) the red channel
    assert ((b & 0xFF) <= (a & 0xFF)).all()


def test_color_modes(rng):
    xyz = rng.random((300, 3)).astype(np.float32)
    state = build_state(xyz, np.full(300, 0x00336699, np.uint32))
    c = look_at_cloud()
    img_lod, _ = render_frame(CFG, state, W, H, uniforms_for(
        c, Settings(color_by_lod=True, enable_edl=False,
                    use_high_quality_shading=False)))
    img = np.asarray(img_lod)
    fg = img[img != BG]
    assert len(fg) > 0
    assert set(np.unique(fg)).issubset(set(C.SPECTRAL))


def test_bounding_boxes_draw(rng):
    xyz = rng.random((300, 3)).astype(np.float32)
    state = build_state(xyz, np.full(300, 0x00336699, np.uint32))
    c = look_at_cloud()
    img_box, _ = render_frame(CFG, state, W, H, uniforms_for(
        c, Settings(show_bounding_box=True, enable_edl=False)))
    img_nobox, _ = render_frame(CFG, state, W, H, uniforms_for(
        c, Settings(show_bounding_box=False, enable_edl=False)))
    a, b = np.asarray(img_box), np.asarray(img_nobox)
    assert (a == 0x000000FF).sum() > (b == 0x000000FF).sum()
