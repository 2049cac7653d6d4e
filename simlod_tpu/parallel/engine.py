"""Sharded engine — the multi-chip counterpart of engine.Engine (VERDICT r2 §4).

Drives streaming, construction, compaction cadence, and rendering against a
`jax.sharding.Mesh`: batches stream from files exactly as in the single-chip
engine (io.streaming.PointStream), but each step's columns are device_put with a
sharded layout (each chip receives B/n rows), routed to their owning Morton
brick with one all-to-all, and built into per-chip local octrees
(parallel/shard.py). Rendering composites per-chip framebuffers over ICI.

The reference has no distributed mode at all (single GPU,
main_progressive_octree.cpp:274); this is the octree-sharded scale-out design
from SURVEY.md §2's parallelism inventory.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig, Settings, Uniforms
from ..io.streaming import PointStream
from ..render import camera as camera_mod
from . import shard


class ShardedEngine:
    """Holds sharded device state and drives streaming, build, and render."""

    def __init__(self, cfg: EngineConfig | None = None, mesh: Mesh | None = None,
                 width: int = 1920, height: int = 1080,
                 settings: Settings | None = None, slot_factor: int = 4):
        from ..utils import cache as _cache
        _cache.enable()
        self.cfg = cfg or EngineConfig()
        self.mesh = mesh or shard.make_mesh()
        self.width, self.height = width, height
        self.settings = settings or Settings()
        self.step = shard.build_sharded_step(self.cfg, self.mesh, width, height,
                                             slot_factor=slot_factor)
        # production dispatch shape for loads: K exchange+build steps per
        # dispatch (the single-chip engine measured per-step dispatch as
        # fatal on the tunneled runtime — VERDICT r3 weak #6)
        self.chunk = shard.build_sharded_chunk(self.cfg, self.mesh,
                                               slot_factor=slot_factor)
        self.batch_sharding = NamedSharding(self.mesh, P(shard.AXIS))
        self.plane_sharding = NamedSharding(self.mesh, P(None, shard.AXIS))
        self.camera = camera_mod.Camera(width=width, height=height)
        self.orbit = camera_mod.OrbitControls()
        self.state = None
        self.stream: PointStream | None = None
        self._steps_since_compact = 0
        self.last_batch_finished = False

    # --- lifecycle ---
    def reset(self, box_min, box_max):
        self.state = shard.init_sharded_state(self.cfg, self.mesh, box_min,
                                              box_max)
        self._steps_since_compact = 0
        self.last_batch_finished = False
        if self.settings.auto_focus_on_load:
            self.orbit.focus_box(np.zeros(3),
                                 np.asarray(box_max) - np.asarray(box_min))
            self.camera.world = self.orbit.world()

    def open(self, paths):
        """Scan files, reset the sharded octree, start streaming.

        The stream's device_put target is the SHARDED layout: each chip
        receives its B/n slice of every step batch straight from the host
        (no single-chip staging hop)."""
        K = max(1, self.cfg.steps_per_dispatch)
        self.stream = PointStream(
            paths, self.cfg.step_points,
            device=self.plane_sharding if K > 1 else self.batch_sharding,
            chunk_steps=K)
        box = self.stream.box_max - self.stream.box_min
        self.reset(np.zeros(3, np.float32), box.astype(np.float32))
        self._stream_iter = iter(self.stream)
        return self.stream

    def uniforms(self) -> Uniforms:
        self.camera.fovy = self.settings.fovy
        return Uniforms.make(self.width, self.height, self.camera.transform(),
                             settings=self.settings)

    # --- construction ---
    def ingest(self, x, y, z, rgba, count, render: bool = False):
        self.state, img, depth, counts = self.step(
            self.state, x, y, z, rgba, jnp.asarray(count, jnp.int32),
            self.uniforms(), render)
        self._steps_since_compact += 1
        self.last_depth = depth
        return img

    def _maybe_compact(self, force: bool = False):
        """sharded_compact on the single-chip cadence (watermark-gated)."""
        if not force and self._steps_since_compact < 4:
            return
        self._steps_since_compact = 0
        used = int(jnp.max(self.state.vox_used))
        threshold = int(self.cfg.voxel_capacity
                        * self.cfg.voxel_compact_watermark)
        if force or used > threshold:
            self.state = shard.sharded_compact(self.cfg, self.mesh, self.state)

    def ingest_chunk(self, item):
        """One K-step build dispatch (no render, no uniforms): the sharded
        analogue of Engine.ingest_chunk. Compaction is in-program
        (device-side watermark cond inside the scan)."""
        bx, by, bz, brgba, counts = item
        self.state = self.chunk(self.state, bx, by, bz, brgba,
                                jnp.asarray(counts, jnp.int32))
        self._steps_since_compact += int(bx.shape[0])

    def ingest_next(self) -> bool:
        if self.stream is None:
            return False
        item = next(self._stream_iter, None)
        if item is None:
            self.last_batch_finished = True
            return False
        if isinstance(item[4], (int, np.integer)):   # chunk_steps == 1 stream
            x, y, z, rgba, count = item
            self.ingest(x, y, z, rgba, count)
            self._maybe_compact()
        else:
            self.ingest_chunk(item)
        return True

    def stage(self):
        """Drain the stream onto the device in its sharded layout (fencing
        each item bounds in-flight H2D bytes) and return the padded [KB, B]
        chunk planes, ready for one build dispatch."""
        from ..engine import _scan_bucket
        items = []
        for it in self._stream_iter:
            jax.block_until_ready(it[:4])
            items.append(it)
        self.last_batch_finished = True
        if not items:
            return None
        planes = []
        for it in items:
            if isinstance(it[4], (int, np.integer)):  # chunk_steps==1
                planes.append(tuple(a[None] for a in it[:4])
                              + (np.asarray([it[4]], np.int32),))
            else:
                planes.append(it[:4] + (np.asarray(it[4], np.int32),))
        bx, by, bz, bc = (jnp.concatenate([p[i] for p in planes])
                          for i in range(4))
        counts = jnp.asarray(
            np.concatenate([p[4] for p in planes]), jnp.int32)
        K = int(bx.shape[0])
        KB = _scan_bucket(K)
        if KB != K:
            zplane = jax.device_put(
                np.zeros((KB - K,) + bx.shape[1:], np.float32),
                self.plane_sharding)
            zc = jax.device_put(
                np.zeros((KB - K,) + bx.shape[1:], np.uint32),
                self.plane_sharding)
            bx = jnp.concatenate([bx, zplane])
            by = jnp.concatenate([by, zplane])
            bz = jnp.concatenate([bz, zplane])
            bc = jnp.concatenate([bc, zc])
            counts = jnp.concatenate(
                [counts, jnp.zeros((KB - K,), jnp.int32)])
        jax.block_until_ready((bx, by, bz, bc))
        return bx, by, bz, bc, counts

    def build_staged(self, staged) -> None:
        """One chunked build dispatch over pre-staged planes + end-of-load
        split convergence (the sharded mirror of Engine.load_all's timed
        region: construction only, transfers already on device)."""
        if staged is not None:
            bx, by, bz, bc, counts = staged
            self.state = self.chunk(self.state, bx, by, bz, bc, counts)
            self._steps_since_compact += int(bx.shape[0])
        self.state = shard.sharded_finish_splits(self.cfg, self.mesh,
                                                 self.state)
        jax.block_until_ready(self.state.num_nodes)

    def load_all(self, bulk: bool = True):
        """Consume the stream; bulk (default) stages the WHOLE decoded stream
        on device first (fencing each item bounds in-flight H2D bytes), then
        ingests with ONE chunked dispatch — the sharded mirror of
        Engine.load_all's bulk path (VERDICT r3 item 1: per-chunk dispatches
        with transfers in flight measured ~20x slower on the tunneled
        runtime; the mesh=1 bench read 0.46 MP/s where the single-chip bulk
        path reads >10x that)."""
        if not bulk:
            while self.ingest_next():
                pass
            self.state = shard.sharded_finish_splits(self.cfg, self.mesh,
                                                     self.state)
            jax.block_until_ready(self.state.num_nodes)
            return
        self.build_staged(self.stage())

    # --- rendering ---
    def render(self):
        """Composited frame -> u32 [H, W] (exact CSR via forced compaction)."""
        self._maybe_compact(force=True)
        B = self.cfg.step_points
        zero = jax.device_put(np.zeros((B,), np.float32), self.batch_sharding)
        zc = jax.device_put(np.zeros((B,), np.uint32), self.batch_sharding)
        img = self.ingest(zero, zero, zero, zc, 0, render=True)
        return img

    def report(self) -> dict:
        s = self.state
        return dict(
            num_nodes=np.asarray(s.num_nodes).tolist(),
            num_points=int(jnp.sum(jnp.where(s.child_base < 0, s.num_points,
                                             0))),
            num_points_processed=int(jnp.sum(s.num_points_processed)),
            num_points_dropped=int(jnp.sum(s.num_points_dropped)),
            num_voxels_stored=int(jnp.sum(s.vox_used)),
            mem_capacity_reached=bool(jnp.any(s.mem_capacity_reached)),
        )
