"""Engine end-to-end tests: streaming build, fused step, reset, stats, capacity."""
import numpy as np
import pytest

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig, Settings
from simlod_tpu.engine import Engine
from simlod_tpu.formats import simlod, synthetic

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 13,
    node_capacity=1 << 13, point_capacity=1 << 18, voxel_capacity=1 << 20,
    segment_capacity=1 << 14, step_points=1 << 13, spill_capacity=1 << 13,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=256,
    max_render_points=1 << 17, max_render_voxels=1 << 17,
)


@pytest.fixture
def cloud_file(tmp_path, rng):
    xyz, rgba = synthetic.terrain(60_000, seed=5, extent=100.0, z_scale=12.0)
    p = str(tmp_path / "t.simlod")
    simlod.write(p, xyz, rgba)
    return p


def _no_overfull_leaves(eng):
    s = eng.state
    n_cap = np.asarray(s.child_base).shape[0]
    ids = np.arange(n_cap)
    over = ((np.asarray(s.child_base) < 0) & (ids < int(s.num_nodes))
            & (np.asarray(s.level) < eng.cfg.max_depth)
            & (np.asarray(s.counter) > eng.cfg.max_points_per_node))
    return not over.any()


def test_build_only(cloud_file):
    eng = Engine(CFG, Settings())
    eng.open([cloud_file])
    while eng.ingest_next():
        pass
    rep = eng.report()
    assert rep["num_points_processed"] == 60_000
    assert rep["num_points"] == 60_000
    assert rep["num_nodes"] > 8  # splits happened at 256/leaf
    assert not rep["mem_capacity_reached"]
    assert rep["stream"]["points_loaded"] == 60_000
    # the ingest_next path (CLI frame loop / viewer) must run the end-of-load
    # split convergence exactly like load_all, not just drain the stream
    assert eng._splits_finished
    assert _no_overfull_leaves(eng)


def test_simultaneous_frames(cloud_file):
    eng = Engine(CFG, Settings(min_node_size=8.0))
    eng.open([cloud_file])
    frames = []
    while not eng.last_batch_finished:
        img, stats = eng.frame(96, 64)
        frames.append(np.asarray(img))
    assert len(frames) >= 2  # several steps streamed
    rep = eng.report()
    assert rep["num_points_processed"] == 60_000
    # the last frame sees the full cloud; must have drawn something
    assert (frames[-1] != C.BACKGROUND_COLOR).any()
    # progressive: early frame has fewer stored points than late frame
    assert rep["num_visible_nodes"] >= 0


def test_reset_and_reload(cloud_file):
    eng = Engine(CFG, Settings())
    eng.open([cloud_file])
    while eng.ingest_next():
        pass
    n1 = eng.report()["num_nodes"]
    eng.open([cloud_file])  # drag-drop analogue: reset + reload
    assert int(eng.state.num_nodes) == 1
    while eng.ingest_next():
        pass
    assert eng.report()["num_nodes"] == n1  # deterministic rebuild


def test_capacity_watermark(tmp_path, rng):
    # tiny point pool -> capacity reached, ingest stops, flag set, no crash
    cfg = EngineConfig(**{**CFG.__dict__, "point_capacity": 1 << 12})
    xyz, rgba = synthetic.terrain(30_000, seed=2, extent=50.0)
    p = str(tmp_path / "small.simlod")
    simlod.write(p, xyz, rgba)
    eng = Engine(cfg, Settings())
    eng.open([p])
    while eng.ingest_next():
        pass
    rep = eng.report()
    assert rep["mem_capacity_reached"]
    assert rep["num_points"] <= 1 << 12
    assert rep["num_points_dropped"] > 0


def test_render_after_build(cloud_file):
    eng = Engine(CFG, Settings(min_node_size=8.0))
    eng.open([cloud_file])
    while eng.ingest_next():
        pass
    img, stats = eng.render(128, 96)
    img = np.asarray(img)
    assert img.shape == (96, 128)
    assert (img != C.BACKGROUND_COLOR).any()
    assert int(stats.num_visible_nodes) > 0
    assert int(stats.num_points) == 60_000


def test_load_all_async_matches_sync(cloud_file):
    # load_all dispatches chunks asynchronously (donation-chained); the tree
    # must be identical to the one built with per-chunk syncs
    eng_a = Engine(CFG, Settings())
    eng_a.open([cloud_file])
    eng_a.load_all()
    eng_s = Engine(CFG, Settings())
    eng_s.open([cloud_file])
    while eng_s.ingest_next():
        pass
    ra, rs = eng_a.report(), eng_s.report()
    for k in ("num_nodes", "num_points", "num_points_processed"):
        assert ra[k] == rs[k], k


def test_load_all_bulk_matches_chunked(cloud_file):
    # the bulk path (stage-all -> one build_many dispatch) must build the
    # exact same tree as per-chunk dispatching
    eng_b = Engine(CFG, Settings())
    eng_b.open([cloud_file])
    eng_b.load_all(bulk=True)
    assert eng_b.last_batch_finished
    eng_c = Engine(CFG, Settings())
    eng_c.open([cloud_file])
    eng_c.load_all(bulk=False)
    rb, rc = eng_b.report(), eng_c.report()
    for k in ("num_nodes", "num_points", "num_points_processed",
              "num_voxels"):
        assert rb[k] == rc[k], k


def test_load_all_halts_on_capacity(tmp_path, rng):
    # ADVICE r2: the cached capacity flag must actually stop load_all (the
    # reference treats memCapacityReached as end of load, :1216-1219)
    cfg = EngineConfig(**{**CFG.__dict__, "point_capacity": 1 << 12})
    xyz, rgba = synthetic.terrain(120_000, seed=3, extent=50.0)
    p = str(tmp_path / "over.simlod")
    simlod.write(p, xyz, rgba)
    eng = Engine(cfg, Settings())
    eng.open([p])
    eng.load_all(poll_every=1)
    assert eng._capacity_flag
    assert eng.last_batch_finished
    rep = eng.report()
    assert rep["mem_capacity_reached"]
    assert rep["num_points"] <= 1 << 12
