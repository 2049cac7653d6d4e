"""Draw-pool (screen-budgeted decimation) tests.

The pooled render path must be EXACT whenever every node's budget clears its
sample count (the pool prefix then covers the node fully and large/truncated
nodes ride the exact path), must decimate deterministically otherwise, and the
engine integration must rebuild the pool when the octree changes.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from simlod_tpu.config import EngineConfig, Settings, Uniforms
from simlod_tpu.render import drawpool
from simlod_tpu.render.render import (probe_pooled_counts, render_frame,
                                      render_frame_pooled)
from simlod_tpu.ops import ragged

from test_render import CFG, W, H, build_state, look_at_cloud, uniforms_for


def _cloud(rng, n=6000):
    xyz = rng.random((n, 3), dtype=np.float32) * 0.9 + 0.05
    rgba = (rng.integers(0, 1 << 24, n, dtype=np.uint32)
            | np.uint32(0xFF000000))
    return xyz, rgba


def _pool_for(cfg, state, cap=None):
    cap = cap if cap is not None else cfg.draw_cap
    pool_w = 1 << max(ragged.window_for(
        int(state.pool_used), max(int(state.num_segments), 1)) - 1, 1).bit_length()
    vox_w = 1 << max(int(state.vox_compacted), 128).bit_length()
    node_w = 1 << max(int(state.num_nodes), 64).bit_length()
    return drawpool.build_draw_pool(cfg, state, pool_w, vox_w, node_w, cap)


def _render_both(cfg, state, s, budget):
    c = look_at_cloud()
    u = uniforms_for(c, dataclasses.replace(s, point_budget=budget))
    # window large enough for the ragged plan's per-segment phase padding
    # (hundreds of tiny segments in these scenes): the EXACT path would
    # otherwise silently truncate and the comparison would be vacuous
    win = 1 << 18
    img_exact, _ = render_frame(cfg, state, W, H, u, win, win)
    pool = _pool_for(cfg, state)
    img_pool, fstats = render_frame_pooled(cfg, state, pool, W, H, u,
                                           win, win, win, win)
    return np.asarray(img_exact), np.asarray(img_pool), fstats


def test_pooled_equals_exact_when_budget_clears(rng):
    xyz, rgba = _cloud(rng)
    state = build_state(xyz, rgba)
    s = Settings(enable_edl=False)
    # budget so large every node's screen budget clears its sample count
    exact, pooled, _ = _render_both(CFG, state, s, budget=1e6)
    np.testing.assert_array_equal(exact, pooled)


def test_pooled_budget_zero_is_exact(rng):
    xyz, rgba = _cloud(rng)
    state = build_state(xyz, rgba)
    s = Settings(use_high_quality_shading=False, enable_edl=False)
    exact, pooled, _ = _render_both(CFG, state, s, budget=0.0)
    np.testing.assert_array_equal(exact, pooled)


def test_small_draw_cap_stays_exact_via_exact_path(rng):
    """Nodes whose sample count exceeds draw_cap must take the exact path, so
    a tiny cap with a clearing budget still reproduces the exact image."""
    cfg = dataclasses.replace(CFG, draw_cap=128)
    xyz, rgba = _cloud(rng)
    state = build_state(xyz, rgba)
    s = Settings(enable_edl=False)
    c = look_at_cloud()
    u = uniforms_for(c, dataclasses.replace(s, point_budget=1e6))
    win = 1 << 18
    img_exact, _ = render_frame(cfg, state, W, H, u, win, win)
    pool = _pool_for(cfg, state)
    img_pool, _ = render_frame_pooled(cfg, state, pool, W, H, u,
                                      win, win, win, win)
    np.testing.assert_array_equal(np.asarray(img_exact), np.asarray(img_pool))


def test_pool_prefix_is_deterministic(rng):
    xyz, rgba = _cloud(rng, n=3000)
    state = build_state(xyz, rgba)
    p1 = _pool_for(CFG, state)
    p2 = _pool_for(CFG, state)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_budget_decimates_sample_counts(rng):
    xyz, rgba = _cloud(rng)
    state = build_state(xyz, rgba)
    c = look_at_cloud()
    pool = _pool_for(CFG, state)
    u_full = uniforms_for(c, Settings(point_budget=1e6))
    u_thin = uniforms_for(c, Settings(point_budget=0.05))
    full = [int(v) for v in probe_pooled_counts(CFG, state, pool, u_full)]
    thin = [int(v) for v in probe_pooled_counts(CFG, state, pool, u_thin)]
    # exact-path counts unchanged; pooled counts strictly cut
    assert thin[2] == full[2] and thin[3] == full[3]
    assert thin[0] < full[0] or full[0] == 0
    # decimated frame still covers pixels (the prefix is a spatial subsample)
    u = uniforms_for(c, Settings(point_budget=0.05, enable_edl=False))
    win = 1 << 16
    img, _ = render_frame_pooled(CFG, state, pool, W, H, u, win, win, win, win)
    from simlod_tpu import constants as C
    covered = int(np.sum(np.asarray(img) != np.uint32(C.BACKGROUND_COLOR)))
    assert covered > 50


def test_engine_pooled_render_matches_exact(rng):
    from simlod_tpu.engine import Engine
    xyz, rgba = _cloud(rng, n=4000)
    # render windows must clear the plan's per-segment padding in BOTH paths
    # (see _render_both) or the exact baseline itself truncates
    cfg = dataclasses.replace(CFG, max_render_points=1 << 18,
                              max_render_voxels=1 << 18)
    eng = Engine(cfg, Settings(enable_edl=False, min_node_size=8.0))
    eng.reset([0, 0, 0], [1, 1, 1])
    B = cfg.step_points
    for s0 in range(0, len(xyz), B):
        ch, ck = xyz[s0:s0+B], rgba[s0:s0+B]
        cx = np.zeros((B, 3), np.float32); cx[:len(ch)] = ch
        cc = np.zeros((B,), np.uint32); cc[:len(ch)] = ck
        eng.ingest(jnp.asarray(np.ascontiguousarray(cx[:, 0])),
                   jnp.asarray(np.ascontiguousarray(cx[:, 1])),
                   jnp.asarray(np.ascontiguousarray(cx[:, 2])),
                   jnp.asarray(cc), len(ch))
    img0, _ = eng.render(W, H)                      # budget 0: exact path
    eng.settings.point_budget = 1e6                 # clearing budget: pooled
    img1, _ = eng.render(W, H)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    # decimating budget renders (correctness of the full engine plumbing)
    eng.settings.point_budget = 0.05
    img2, stats2 = eng.render(W, H)
    assert img2.shape == img0.shape
