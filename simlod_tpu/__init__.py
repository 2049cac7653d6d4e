"""simlod_tpu — TPU-native simultaneous LOD point-cloud engine.

A brand-new JAX/XLA/Pallas implementation of the capabilities of SimLOD
(github.com/m-schuetz/SimLOD): stream massive point clouds from disk, incrementally
build an LOD octree on-device while data is still loading (128^3-sampled voxels in
inner nodes, full-precision points in leaves), and render the octree with a software
rasterizer (frustum culling, pixel-projected-size LOD selection, depth-min splatting,
high-quality shading, eye-dome lighting).

See SURVEY.md for the structural analysis of the reference this engine is built to.
"""

__version__ = "0.1.0"

from .config import EngineConfig, Settings, Stats, Uniforms  # noqa: F401
from .octree.structures import OctreeState, init_state  # noqa: F401
