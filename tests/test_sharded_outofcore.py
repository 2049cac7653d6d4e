"""Sharded out-of-core composition (BASELINE config-5 mechanics) on the
virtual 8-device CPU mesh: bricks larger than the mesh's COMBINED point pools
build sequentially, evict to host, and composite across bricks and chips."""
import numpy as np

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig, Settings
from simlod_tpu.formats import simlod as simlod_fmt
from simlod_tpu.parallel.outofcore import ShardedOutOfCoreEngine

CFG = EngineConfig(
    candidate_factor=21, cand_multi_rows=1 << 13,
    node_capacity=1 << 12, point_capacity=1 << 13, voxel_capacity=1 << 18,
    segment_capacity=1 << 13, step_points=1 << 12, spill_capacity=1 << 12,
    max_splits_per_round=64, seg_select_cap=1 << 10, max_points_per_node=128,
    max_render_points=1 << 15, max_render_voxels=1 << 16,
)


def _brick(rng, n, x0, rgba_word):
    """A dense slab of points in x in [x0, x0+1), y/z in [0,1)."""
    xyz = rng.random((n, 3)).astype(np.float32)
    xyz[:, 0] += x0
    rgba = np.full(n, rgba_word, np.uint32)
    return xyz, rgba


def test_bricks_exceed_mesh_capacity_and_composite(tmp_path):
    rng = np.random.default_rng(21)
    n_per_brick = 40_000
    paths = []
    # two separated slabs, uniquely colored (pure red / pure green) so each
    # brick's presence in the composite is checkable regardless of framing
    colors = (0xFF0000FF, 0xFF00FF00)
    for i, (x0, col) in enumerate(zip((0.0, 4.0), colors)):
        xyz, rgba = _brick(rng, n_per_brick, x0, col)
        p = str(tmp_path / f"brick{i}.simlod")
        simlod_fmt.write(p, xyz, rgba)
        paths.append(p)

    eng = ShardedOutOfCoreEngine(
        CFG, width=160, height=64,
        settings=Settings(min_node_size=8.0, enable_edl=False), slot_factor=8)
    eng.open(paths)

    # the dataset does NOT fit the mesh: 80k points vs 8 chips x 8k pool
    n_chips = int(eng.mesh.devices.size)
    assert 2 * n_per_brick > n_chips * CFG.point_capacity

    eng.build_all()
    rep = eng.report()
    assert rep["bricks"] == 2
    assert rep["total_points"] == 2 * n_per_brick   # nothing dropped
    assert rep["total_voxels"] > 0
    assert rep["host_bytes"] > 0

    img, depth = eng.render()
    img = np.asarray(img)
    assert img.shape == (64, 160)
    drawn = img != C.BACKGROUND_COLOR
    assert drawn.any()
    # both bricks must appear in the composite (each has a unique pure color;
    # plain shading keeps the winner's exact RGBA word, EDL is off)
    reds = (img & 0xFF) > 0
    greens = ((img >> 8) & 0xFF) > 0
    assert (drawn & reds & ~greens).any(), "red brick missing from composite"
    assert (drawn & greens & ~reds).any(), "green brick missing from composite"
    # depth is finite where drawn
    d = np.asarray(depth)
    assert (d[drawn] != C.DEPTH_INF_BITS).all()
