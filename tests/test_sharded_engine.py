"""ShardedEngine end-to-end on the virtual 8-device CPU mesh."""
import numpy as np

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig, Settings
from simlod_tpu.formats import simlod as simlod_fmt
from simlod_tpu.formats import synthetic
from simlod_tpu.parallel import shard
from simlod_tpu.parallel.engine import ShardedEngine

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 13,
    node_capacity=1 << 12, point_capacity=1 << 16, voxel_capacity=1 << 18,
    segment_capacity=1 << 14, step_points=1 << 13, spill_capacity=1 << 13,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=128,
    max_render_points=1 << 16, max_render_voxels=1 << 16,
)


def test_sharded_engine_file_to_frame(tmp_path):
    """Stream a file through the sharded engine: all points routed + stored,
    compaction cadence runs, and the composited frame draws content."""
    n = 30_000
    xyz, rgba = synthetic.terrain(n, seed=9, extent=1.0, z_scale=0.5)
    path = str(tmp_path / "cloud.simlod")
    simlod_fmt.write(path, xyz, rgba)

    eng = ShardedEngine(CFG, mesh=shard.make_mesh(), width=96, height=64,
                        settings=Settings(min_node_size=8.0, enable_edl=False),
                        slot_factor=8)
    eng.open([path])
    eng.load_all()
    eng.stream.stop()

    rep = eng.report()
    assert rep["num_points_processed"] == n
    assert rep["num_points_dropped"] == 0
    assert rep["num_points"] == n          # stored on the owning chips
    assert not rep["mem_capacity_reached"]

    img = np.asarray(eng.render())
    assert img.shape == (64, 96)
    assert (img != C.BACKGROUND_COLOR).any()

    # end-of-load split convergence ran on every chip (Engine.load_all
    # contract): no leaf below max_depth is left over the split threshold
    s = eng.state
    n_chips, n_cap = np.asarray(s.child_base).shape
    ids = np.arange(n_cap)[None, :]
    is_leaf = np.asarray(s.child_base) < 0
    live = ids < np.asarray(s.num_nodes)[:, None]
    below = np.asarray(s.level) < CFG.max_depth
    over = is_leaf & live & below & (
        np.asarray(s.counter) > CFG.max_points_per_node)
    assert not over.any(), int(over.sum())
