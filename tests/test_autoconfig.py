"""EngineConfig.auto: pool sizing from device memory + dataset size.

The reference sizes its persistent buffer to 80% of free VRAM at init
(main_progressive_octree.cpp:580-586); here the equivalent derives static pool
capacities per load. These tests pin the sizing invariants and the
Engine(cfg=None) auto path end-to-end on CPU.
"""
import numpy as np

from simlod_tpu.config import EngineConfig
from simlod_tpu.engine import Engine
from simlod_tpu.formats import simlod, synthetic


def test_auto_fits_budget():
    cfg = EngineConfig.auto(total_points=4_000_000, memory_bytes=8 << 30)
    assert cfg.point_capacity >= 4_000_000
    assert cfg.voxel_capacity >= 4_000_000
    assert cfg.estimated_state_bytes() <= int((8 << 30) * 0.45)


def test_auto_clamps_oversized_dataset():
    # a dataset far beyond memory: pools shrink to fit, the engine's
    # watermarks then stop ingestion (reference: red capacity warning)
    cfg = EngineConfig.auto(total_points=2_000_000_000, memory_bytes=4 << 30)
    assert cfg.estimated_state_bytes() <= int((4 << 30) * 0.45)
    assert cfg.point_capacity < 2_000_000_000
    assert cfg.point_capacity >= 1 << 22


def test_auto_no_total_defaults():
    cfg = EngineConfig.auto(memory_bytes=16 << 30)
    assert cfg.estimated_state_bytes() <= int((16 << 30) * 0.45)


def test_auto_overrides_respected():
    cfg = EngineConfig.auto(total_points=1_000_000, memory_bytes=8 << 30,
                            step_points=1 << 16, node_capacity=1 << 14)
    assert cfg.step_points == 1 << 16
    assert cfg.node_capacity == 1 << 14


def test_engine_auto_loads_file(tmp_path):
    xyz, rgba = synthetic.terrain(50_000, seed=3, extent=80.0, z_scale=10.0)
    p = str(tmp_path / "auto.simlod")
    simlod.write(p, xyz, rgba)
    eng = Engine()          # cfg=None -> auto capacities at open()
    eng.open([p])
    assert eng.cfg.point_capacity >= 50_000
    eng.load_all()
    eng.stream.stop()
    assert int(eng.state.num_points_processed) == 50_000
    assert not bool(eng.state.mem_capacity_reached)
