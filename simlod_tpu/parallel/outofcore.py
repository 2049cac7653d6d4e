"""Sharded out-of-core ingestion — the BASELINE config-5 composition
(San Simeon 18 B direction): datasets larger than the per-chip point pools,
built brick-by-brick through the ShardedEngine and rendered from evicted
voxel LODs with a depth-min composite across bricks AND chips.

Composition of the two round-3 capabilities:
  - `simlod_tpu.outofcore.OutOfCoreEngine` (single chip): brick-granular
    residency — build a brick, evict its state to host, keep the voxel LOD
    renderable.
  - `simlod_tpu.parallel.engine.ShardedEngine` (multi chip): every brick is
    itself Morton-sharded over the mesh; each chip builds its local octree
    from all-to-all-routed points.

Rendering: each brick's evicted per-chip voxel LODs are re-materialized into
ONE sharded render state at a time (device residency stays O(one brick)), the
sharded step renders it with the cross-CHIP pmin/psum composite and EDL off,
and the per-brick (color, depth) planes then composite across BRICKS with the
same associative depth-min (render.composite_frames) + one final EDL pass —
exactly the u64-atomicMin algebra of the reference (render.cu:95-99), applied
twice. Leaf point pools stay evicted (LOD-only overview, like the single-chip
engine's un-paged bricks); `OutOfCoreEngine.page_in` is the single-chip
closeup mechanism and composes the same way if needed.

The reference is capped at single-GPU-resident datasets (README.md:12); this
removes both the single-device and the device-resident limits at once.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import EngineConfig, Settings, Uniforms
from ..io.streaming import PointStream, scan_paths
from ..outofcore import _NODE_COLS, _VOX_COLS
from ..render.render import composite_frames
from . import shard
from .engine import ShardedEngine


@dataclasses.dataclass
class ShardedBrick:
    """One evicted brick: per-chip host arrays (padded to the brick's per-chip
    max) + per-chip watermarks."""
    path: str
    nodes: dict            # col -> np [n_chips, max_nodes]
    voxels: dict           # col -> np [n_chips, max_vox] (compacted)
    num_nodes: np.ndarray  # [n_chips] i32
    vox_used: np.ndarray   # [n_chips] i32
    num_points: int

    @property
    def host_bytes(self) -> int:
        return sum(a.nbytes for d in (self.nodes, self.voxels)
                   for a in d.values())


class ShardedOutOfCoreEngine:
    """Builds bricks sequentially through ONE ShardedEngine, evicts each to
    host, and renders the union by brick-then-chip depth-min compositing."""

    def __init__(self, cfg: EngineConfig | None = None, mesh=None,
                 width: int = 1920, height: int = 1080,
                 settings: Settings | None = None, slot_factor: int = 4):
        self.cfg = cfg or EngineConfig()
        self.settings = settings or Settings()
        self.engine = ShardedEngine(self.cfg, mesh=mesh, width=width,
                                    height=height, settings=self.settings,
                                    slot_factor=slot_factor)
        self.mesh = self.engine.mesh
        self.width, self.height = width, height
        self.bricks: list[ShardedBrick] = []

    # --- lifecycle ---
    def open(self, paths) -> list[str]:
        entries = scan_paths(paths)
        if not entries:
            raise FileNotFoundError(f"no point cloud files under {paths!r}")
        self.global_min = np.min([e.box_min for e in entries], axis=0)
        self.global_max = np.max([e.box_max for e in entries], axis=0)
        self.brick_paths = [e.path for e in entries]
        self.bricks = []
        ext = (self.global_max - self.global_min).astype(np.float32)
        if self.settings.auto_focus_on_load:
            self.engine.orbit.focus_box(np.zeros(3), ext)
            self.engine.camera.world = self.engine.orbit.world()
        return self.brick_paths

    def build_all(self) -> None:
        for path in self.brick_paths:
            self.build_brick(path)

    def build_brick(self, path: str) -> ShardedBrick:
        """Stream one brick through the sharded engine (points all-to-all
        routed to their owning chips), converge splits, compact, evict."""
        eng = self.engine
        stream = PointStream([path], self.cfg.step_points,
                             device=eng.batch_sharding, chunk_steps=1,
                             box_override=(self.global_min, self.global_max))
        ext = (self.global_max - self.global_min).astype(np.float32)
        eng.reset(np.zeros(3, np.float32), ext)
        eng.stream = stream
        eng._stream_iter = iter(stream)
        eng.load_all()
        stream.stop()
        eng._maybe_compact(force=True)   # exact CSR for the evicted LOD
        brick = self._evict(path, eng.state)
        self.bricks.append(brick)
        return brick

    def _evict(self, path: str, s) -> ShardedBrick:
        nn = np.asarray(s.num_nodes, np.int32)           # [n_chips]
        vu = np.asarray(s.vox_used, np.int32)
        max_n, max_v = int(nn.max()), max(int(vu.max()), 1)
        pull = lambda col, w: np.asarray(getattr(s, col)[:, :w])
        return ShardedBrick(
            path=path,
            nodes={c: pull(c, max_n) for c in _NODE_COLS},
            voxels={c: pull(c, max_v) for c in _VOX_COLS},
            num_nodes=nn, vox_used=vu,
            num_points=int(jnp.sum(s.num_points_processed)
                           - jnp.sum(s.num_points_dropped)),
        )

    # --- rendering ---
    def _materialize(self, brick: ShardedBrick):
        """Re-create one brick's voxel-LOD as a sharded state at the ENGINE's
        own shapes (reuses the already-compiled sharded step program)."""
        ext = (self.global_max - self.global_min).astype(np.float32)
        st = shard.init_sharded_state(self.cfg, self.mesh, np.zeros(3, np.float32),
                                      ext)
        shd = NamedSharding(self.mesh, P(shard.AXIS))
        rep = {}

        def put(col, host):
            tgt = np.asarray(getattr(st, col))           # [n, cap]
            full = np.zeros(tgt.shape, tgt.dtype)
            full[:, : host.shape[1]] = host.astype(tgt.dtype)
            return jax.device_put(full, shd)

        for c in _NODE_COLS:
            rep[c] = put(c, brick.nodes[c])
        for c in _VOX_COLS:
            rep[c] = put(c, brick.voxels[c])
        rep["num_nodes"] = jax.device_put(brick.num_nodes, shd)
        rep["vox_used"] = jax.device_put(brick.vox_used, shd)
        rep["vox_compacted"] = jax.device_put(brick.vox_used, shd)
        return dataclasses.replace(st, **rep)

    def render(self, width: int | None = None, height: int | None = None):
        """Composited frame over all bricks -> (u32 [H, W], i32 depth [H, W]).

        Device residency is O(one brick): each brick materializes, renders
        through the sharded step (chips composite over ICI), and is freed;
        bricks then composite host-side-stacked with one EDL pass."""
        w = width or self.width
        h = height or self.height
        assert (w, h) == (self.width, self.height), \
            "sharded step is compiled at construction size"
        eng = self.engine
        eng.camera.fovy = self.settings.fovy
        t = eng.camera.transform()
        u_brick = Uniforms.make(
            w, h, t, settings=dataclasses.replace(self.settings,
                                                  enable_edl=False))
        u_final = Uniforms.make(w, h, t, settings=self.settings)
        B = self.cfg.step_points
        zero = jax.device_put(np.zeros((B,), np.float32), eng.batch_sharding)
        zc = jax.device_put(np.zeros((B,), np.uint32), eng.batch_sharding)
        colors, depths = [], []
        for brick in self.bricks:
            st = self._materialize(brick)
            st, img, depth, _ = eng.step(st, zero, zero, zero, zc,
                                         jnp.int32(0), u_brick, True)
            colors.append(img.reshape(-1))
            depths.append(depth.reshape(-1))
            del st                         # brick leaves the device here
        img, depth = composite_frames(jnp.stack(colors), jnp.stack(depths),
                                      u_final, w, h)
        return img, depth.reshape(h, w)

    def report(self) -> dict:
        return dict(
            bricks=len(self.bricks),
            n_chips=int(self.mesh.devices.size),
            total_points=sum(b.num_points for b in self.bricks),
            total_voxels=sum(int(b.vox_used.sum()) for b in self.bricks),
            total_nodes=sum(int(b.num_nodes.sum()) for b in self.bricks),
            host_bytes=sum(b.host_bytes for b in self.bricks),
            per_chip_point_capacity=self.cfg.point_capacity,
        )
