"""Engine orchestrator — the TPU-native main_progressive_octree frame loop (C1).

The reference alternates two cooperative kernels per frame on one device:
renderCUDA() then updateOctree() (main_progressive_octree.cpp:1176-1180). Here the
equivalent is a fused jitted step that ingests a point batch, updates the octree, and
renders the frame in one XLA program, plus unfused build/render entry points.

Engine policies replicated from the reference:
  - ingest budget per frame (<=20 x 1M points, voxels.cu:883 + 10 ms budget :939):
    here the step batch size is the static budget; the host adapts batches-per-step
    against a wall-clock target (`frame_budget_ms`).
  - capacity watermark: when pools run out, the engine stops ingesting and reports
    mem_capacity_reached (reference: voxels.cu:896-912 + red GUI warning).
  - reset(): re-initializes device state and restarts streaming (reference :775-809).
  - benchmark mode: min/max/avg per-step and per-frame timings (reference
    :410-422, 523-535 via CUDA events; here host wall clock around block_until_ready).
"""
from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig, Settings, Stats, Uniforms
from .io.streaming import PointStream
from .octree import build
from .octree.structures import OctreeState, init_state
from .ops import ragged
from .render import camera as camera_mod
from .render import drawpool as drawpool_mod
from .render.render import (FrameStats, probe_pooled_counts, render_frame,
                            render_frame_impl, render_frame_pooled,
                            render_frame_pooled_impl)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 9, 10, 11, 12),
                   donate_argnums=1)
def _fused_step(cfg: EngineConfig, state: OctreeState, width: int, height: int,
                x, y, z, rgba, count, pw: int, vw: int, nw: int, sw: int,
                uniforms: Uniforms):
    """One simultaneous build+render step (the two reference kernels fused)."""
    state = build.build_step_impl(cfg, state, x, y, z, rgba, count)
    img, fstats = render_frame_impl(cfg, state, width, height, uniforms, pw, vw,
                                    nw, sw)
    return state, img, fstats


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 9, 10, 11, 12),
                   donate_argnums=1)
def _fused_chunk(cfg: EngineConfig, state: OctreeState, width: int, height: int,
                 bx, by, bz, brgba, counts, pw: int, vw: int, nw: int, sw: int,
                 uniforms: Uniforms):
    """Scan a K-step chunk then render once (reference consumes <=20 ring
    batches per frame before renderCUDA, progressive_octree_voxels.cu:883)."""
    state = build.build_many_impl(cfg, state, bx, by, bz, brgba, counts)
    img, fstats = render_frame_impl(cfg, state, width, height, uniforms, pw, vw,
                                    nw, sw)
    return state, img, fstats


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 9, 10, 11, 12, 13, 14),
                   donate_argnums=1)
def _fused_chunk_pooled(cfg: EngineConfig, state: OctreeState, width: int,
                        height: int, bx, by, bz, brgba, counts, ppw: int,
                        pvw: int, epw: int, evw: int, nw: int, sw: int,
                        pool, uniforms: Uniforms):
    """Fused ingest + POOLED render: the simultaneous loop drawing through the
    screen-budgeted draw pool (VERDICT r4 item 6 — the pooled frame previously
    existed only on the post-load render() path). The pool is a snapshot with
    bounded staleness: nodes it misses (created/regrown since its build) render
    through the exact path inside render_frame_pooled (drawpool.split_masks),
    so a stale pool degrades to exact cost, never to dropped nodes."""
    state = build.build_many_impl(cfg, state, bx, by, bz, brgba, counts)
    img, fstats = render_frame_pooled_impl(
        cfg, state, pool, width, height, uniforms, ppw, pvw, epw, evw, nw, sw)
    return state, img, fstats


@functools.partial(jax.jit, static_argnums=0)
def _collect_stats(cfg: EngineConfig, state: OctreeState, fstats: FrameStats | None):
    n_cap = state.child_base.shape[0]
    ids = jnp.arange(n_cap, dtype=jnp.int32)
    active = ids < state.num_nodes
    leaf = active & (state.child_base < 0)
    z = jnp.zeros((), jnp.int32)
    return Stats(
        num_nodes=state.num_nodes,
        num_inner=jnp.sum((active & ~leaf).astype(jnp.int32)),
        num_leaves=jnp.sum(leaf.astype(jnp.int32)),
        num_nonempty_leaves=jnp.sum((leaf & (state.num_points > 0)).astype(jnp.int32)),
        num_points=jnp.sum(jnp.where(leaf, state.num_points, 0)),
        num_voxels=jnp.sum(jnp.where(active, state.num_voxels, 0)),
        num_voxels_stored=state.vox_used,
        num_visible_nodes=fstats.num_visible_nodes if fstats else z,
        num_visible_inner=fstats.num_visible_inner if fstats else z,
        num_visible_leaves=fstats.num_visible_leaves if fstats else z,
        num_visible_points=fstats.num_visible_points if fstats else z,
        num_visible_voxels=fstats.num_visible_voxels if fstats else z,
        num_points_processed=state.num_points_processed,
        num_points_dropped=state.num_points_dropped,
        num_candidates_dropped=state.num_candidates_dropped,
        pool_used=state.pool_used,
        num_segments=state.num_segments,
        mem_capacity_reached=state.mem_capacity_reached,
        render_truncated=fstats.truncated if fstats else jnp.zeros((), jnp.bool_),
    )


@functools.partial(jax.jit, static_argnums=1)
def _bulk_assemble(parts, KB: int):
    """Concatenate staged [K,B] chunk planes into one [KB,B] scan input
    (zero-count pad steps <= 12.5% overwork; one program so preload_compile
    can AOT-lower it — otherwise the concat would compile inside the timed
    drag-drop region that the reference keeps compile-free)."""
    cols = [jnp.concatenate([p[i] for p in parts]) if len(parts) > 1
            else parts[0][i] for i in range(4)]
    counts = (jnp.concatenate([p[4] for p in parts]) if len(parts) > 1
              else parts[0][4]).astype(jnp.int32)
    K = cols[0].shape[0]
    if KB != K:
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((KB - K,) + a.shape[1:], a.dtype)])
        cols = [pad(a) for a in cols]
        counts = jnp.concatenate([counts, jnp.zeros((KB - K,), jnp.int32)])
    return (*cols, counts)


@functools.partial(jax.jit, static_argnums=1)
def _pool_need(state: OctreeState, cap: int):
    """Drawn-sample upper bounds for the draw-pool copy (module-level so the
    reduction compiles once, not per pool rebuild — ADVICE r4)."""
    return (jnp.sum(jnp.minimum(state.num_points, cap)),
            jnp.sum(jnp.minimum(state.num_voxels, cap)))


@dataclasses.dataclass
class Timings:
    """min/max/avg accumulator (reference benchmark mode, :234-246)."""

    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total += dt
        self.min = min(self.min, dt)
        self.max = max(self.max, dt)

    @property
    def avg(self) -> float:
        return self.total / self.count if self.count else 0.0

    def row(self) -> dict:
        return dict(count=self.count, avg_ms=self.avg * 1e3,
                    min_ms=self.min * 1e3 if self.count else 0.0,
                    max_ms=self.max * 1e3)


def _pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def _size_bucket(n: int) -> int:
    """1-8-pow2 size bucket rounded to 128 lanes (<= 12.5% pad — plain pow2
    doubles a 65M draw pool to 128M rows)."""
    n = max(n, 256)
    b = max((n - 1).bit_length() - 3, 0)
    n = ((n + (1 << b) - 1) >> b) << b
    return ((n + 127) // 128) * 128


def _scan_bucket(k: int) -> int:
    """1-8-pow2 bucket (3-bit mantissa x pow2) for build_many scan lengths:
    bounded program variants across file sizes, <= 12.5% pad steps."""
    if k <= 8:
        return k
    b = (k - 1).bit_length() - 3
    return ((k + (1 << b) - 1) >> b) << b


def sample_window(n: int, prev: int, cap: int) -> int:
    """1/8-pow2 render sample window: 1.25x headroom absorbs camera swings;
    shrink at most one octave vs `prev` so a single low-visibility frame
    doesn't cause next-frame truncation when the camera swings back.
    (Module-level so bench.py measures the SAME policy the engine runs.)"""
    n = max(int(n * 1.25) + 1024, 1 << 18, prev >> 1)
    b = max((n - 1).bit_length() - 3, 0)
    return min(((n + (1 << b) - 1) >> b) << b, cap)


def directory_window(n: int, cap: int) -> int:
    """Pow2 directory window from a live watermark (2x headroom; render flags
    `truncated` and the next frame upsizes if outgrown)."""
    n = max(2 * n + 64, 4096)
    return min(1 << (n - 1).bit_length(), cap)


class Engine:
    """Holds device state and drives streaming, construction, and rendering."""

    def __init__(self, cfg: EngineConfig | None = None,
                 settings: Settings | None = None, device=None):
        from .utils import cache as _cache
        _cache.enable()
        # cfg=None enables auto-capacity: pools are derived from device memory
        # and the stream's point count at open() (the reference sizes its
        # persistent buffer to 80% of free VRAM, main_progressive_octree.cpp:
        # 580-586; here shapes are static per load instead)
        self._auto_cfg = cfg is None
        self.cfg = cfg or EngineConfig()
        self.settings = settings or Settings()
        self.device = device
        self.state: OctreeState | None = None
        self.stream: PointStream | None = None
        self.camera = camera_mod.Camera()
        self.orbit = camera_mod.OrbitControls()
        self._transform_update_bound = None
        self._last_compacted = 0
        self.last_batch_finished = False
        self._capacity_flag = False
        self._splits_finished = False
        self.t_build = Timings()
        self.t_render = Timings()
        self.t_fused = Timings()

    # --- lifecycle (reference reset()/reload(), :644-809) ---
    def reset(self, box_min, box_max):
        self.state = init_state(self.cfg, box_min, box_max)
        if self.device is not None:
            self.state = jax.device_put(self.state, self.device)
        self._draw_pool = None
        self._pool_key = None
        self._pool_built_pts = -1
        self._cached_pool_ws = None
        self._pool_ws_age = 0
        self._last_truncated = False
        self._stream_pins = None
        self._last_compacted = 0
        self.last_batch_finished = False
        self._capacity_flag = False
        self._splits_finished = False
        self.t_build = Timings()
        self.t_render = Timings()
        self.t_fused = Timings()
        if self.settings.auto_focus_on_load:
            self.orbit.focus_box(np.zeros(3), np.asarray(box_max) - np.asarray(box_min))
            self.camera.world = self.orbit.world()

    def open(self, paths, chunk_steps: int | None = None,
             pin_total: int | None = None):
        """Scan files, reset the octree to their union box, start streaming.

        chunk_steps overrides cfg.steps_per_dispatch for THIS stream only
        (frame-loop pacing) without touching cfg — cfg is a static jit key,
        so two engines that differ only in pacing still share every compiled
        program. pin_total sizes the stream shape pins as if the stream held
        that many points: a small warm-up file opened with the production
        pin_total compiles the exact program set the production stream uses.
        """
        self._last_paths = list(paths)   # viewer "Reset + Benchmark" re-open
        if self._auto_cfg:
            from .io.streaming import scan_paths
            total = sum(e.num_points for e in scan_paths(paths))
            self.cfg = EngineConfig.auto(total_points=total,
                                         device=self.device)
        self.stream = PointStream(
            paths, self.cfg.step_points, device=self.device,
            chunk_steps=chunk_steps if chunk_steps is not None
            else self.cfg.steps_per_dispatch)
        box = self.stream.box_max - self.stream.box_min
        self.reset(np.zeros(3, np.float32), box.astype(np.float32))
        self._stream_pins = self._make_stream_pins(
            pin_total if pin_total is not None else self.stream.total_points)
        self._stream_iter = iter(self.stream)
        self._consumed_chunks = 0
        return self.stream

    # --- streaming shape pins (compile-storm control) ---
    def _make_stream_pins(self, total: int) -> dict | None:
        """Grow-only shape seeds for the SIMULTANEOUS loop.

        Every render/pool program specializes on static window buckets. Left to
        the live watermarks those buckets walk their whole ladder during a load
        (pool copies, sample windows, directories all grow with the octree), so
        each draw-pool rebuild recompiled build_draw_pool + probe + the fused
        step — r5 measured 9 frames in 997 s on the tunneled device, all
        compile. Seeding every bucket at its END-OF-LOAD estimate (known: the
        stream header gives total points) makes each program compile ONCE per
        stream; estimates that turn out low simply grow past the seed (max()
        below — one extra compile, never incorrectness, since undersized pool
        windows degrade to the exact render path, drawpool.py:119-124)."""
        if total <= 0 or self.state is None:
            return None
        cfg = self.cfg
        vox_len = self.state.vox_k0.shape[0]
        # ~1 node / 3000 pts overestimates the measured terrain density
        # (9033 nodes / 64M pts) ~3x; dense scans grow past the seed once
        node_est = min(_pow2(max(total // 3000, 4096)), cfg.node_capacity)
        seg_est = min(_pow2(max(total // 8000, 4096)), cfg.segment_capacity)
        vox_est = min(int(total * 0.85) + 1024, vox_len)
        return dict(
            pool_w=_size_bucket(ragged.window_for(total, seg_est)),
            vox_w=min(_size_bucket(vox_est), (vox_len // 128) * 128),
            node_w=directory_window(node_est, cfg.node_capacity),
            seg_w=directory_window(seg_est, cfg.segment_capacity),
            pc=_size_bucket(total + 256 * node_est + 128),
            vc=_size_bucket(vox_est + 256 * node_est + 128),
            # pooled sample windows: seeded at the screen-budget steady state
            # measured at 1080p/point_budget=1 (pp 262k, pv 1.31M)
            ws=(sample_window(400_000, 0, cfg.max_render_points),
                sample_window(1_600_000, 0, cfg.max_render_voxels),
                sample_window(1, 0, cfg.max_render_points),
                sample_window(1, 0, cfg.max_render_voxels)),
            vox_compact_w=min(_size_bucket(vox_est), vox_len),
        )

    def _pins_active(self) -> dict | None:
        """Pins apply only WHILE streaming: the post-load render path keeps its
        exact live-watermark buckets (tighter windows, measured steady-state)."""
        p = getattr(self, "_stream_pins", None)
        return p if (p is not None and not self.last_batch_finished) else None

    # --- construction ---
    def ingest(self, x, y, z, rgba, count, sync: bool = True) -> None:
        """One build step; host-side compaction policy runs after.

        With sync=False the dispatch is asynchronous (the device queue pipelines
        successive steps; donation chains the state in place) and the watermark
        poll is deferred to the next synchronous call."""
        t0 = time.perf_counter()
        self.state = build.build_step(self.cfg, self.state, x, y, z, rgba,
                                      jnp.asarray(count, jnp.int32))
        self._steps_since_poll = getattr(self, "_steps_since_poll", 0) + 1
        if sync:
            self._maybe_compact()
            jax.block_until_ready(self.state.num_nodes)
            self.t_build.add(time.perf_counter() - t0)

    def ingest_chunk(self, item, sync: bool = True) -> None:
        """Ingest one pre-stacked K-step chunk with ONE build_many dispatch.

        The reference keeps its device saturated by launching kernel_construct
        against a pre-uploaded ring every frame (main_progressive_octree.cpp:364-399);
        here K steps ride one XLA program (lax.scan over host-stacked [K, B]
        planes, see PointStream chunk_steps), so there are no host round-trips,
        uploads, or on-device restacking between them."""
        t0 = time.perf_counter()
        bx, by, bz, bc, counts = item
        k = bx.shape[0]
        self.state = build.build_many(self.cfg, self.state, bx, by, bz, bc,
                                      jnp.asarray(counts, jnp.int32))
        self._steps_since_poll = getattr(self, "_steps_since_poll", 0) + k
        if sync:
            self._maybe_compact()
            jax.block_until_ready(self.state.num_nodes)
            self.t_build.add(time.perf_counter() - t0)

    def ingest_next(self, max_steps: int | None = None) -> bool:
        """Ingest the next streamed chunk; returns False when the stream is done.

        The capacity flag is polled on the compaction cadence, not per dispatch
        (a per-dispatch bool() readback would sync the pipeline every chunk)."""
        if self.stream is None:
            return False
        if self._capacity_flag:
            # reference treats capacity-reached as end of load (:1216-1219);
            # the flag is cached by _maybe_compact on its polling cadence
            # (ADVICE r2: checking the live counter here never fired because
            # _maybe_compact resets it)
            self._end_of_stream()
            return False
        item = next(self._stream_iter, None)
        if item is None:
            self._end_of_stream()
            return False
        self._consumed_chunks = getattr(self, "_consumed_chunks", 0) + 1
        if isinstance(item[4], (int, np.integer)):   # chunk_steps == 1 stream
            x, y, z, rgba, count = item
            self.ingest(x, y, z, rgba, count)
            return True
        self.ingest_chunk(item)
        return True

    def load_all(self, poll_every: int | None = None,
                 bulk: bool | None = None) -> None:
        """Consume the entire stream (the reference's drag-drop load).

        BULK path (default whenever the whole file fits the point pool): stage
        the decoded stream on the device FIRST — the loader/uploader threads
        decode and `device_put` [K, B] chunk planes with NO build dispatch in
        flight (the drain loop fences each item, which bounds in-flight
        transfer bytes: the tunneled runtime collapses ~10x when >~0.5 GB of
        H2D rides at once; decode of the next item overlaps the fence) — then
        concatenate on device and ingest everything with ONE build_many
        dispatch. build_many carries the voxel watermark device-side and
        compacts in-program (lax.cond), so there is no mid-load readback of
        any kind: the round-3 group loop's `int(vox_used)` polls between
        donated dispatches measured ~5 s each on this runtime (VERDICT r3
        item 1). The reference gets its overlap from an uploader thread +
        per-frame kernel relaunch (main_progressive_octree.cpp:963-1063);
        here the H2D transfers overlap host decode instead, and the device
        runs once. The scan length is bucketed to 1-8-pow2 (zero-count pad
        steps) so program variants stay bounded across file sizes.

        CHUNKED fallback (bulk=False, or stream already partially consumed, or
        the file exceeds the point pool): per-chunk dispatches, synchronizing
        every `poll_every` chunks for the capacity poll."""
        if self.stream is None:
            return
        t0 = time.perf_counter()
        if bulk is None:
            bulk = (getattr(self, "_consumed_chunks", 0) == 0
                    and self.stream.total_points <= self.cfg.point_capacity)
        if bulk:
            items = []
            for it in self._stream_iter:
                jax.block_until_ready(it[:4])
                items.append(it)
            self.last_batch_finished = True
            if items:
                planes = []
                for it in items:
                    if isinstance(it[4], (int, np.integer)):  # chunk_steps == 1
                        planes.append(tuple(a[None] for a in it[:4])
                                      + (np.asarray([it[4]], np.int32),))
                    else:
                        planes.append(it[:4] + (np.asarray(it[4], np.int32),))
                del items
                ks = tuple(int(p[0].shape[0]) for p in planes)
                KB = _scan_bucket(sum(ks))
                asm = self._aot_for_cfg().get(("assemble", ks))
                bx, by, bz, bc, counts = (
                    asm(tuple(planes)) if asm is not None
                    else _bulk_assemble(tuple(planes), KB))
                del planes
                ex = self._aot_for_cfg().get(("build_many", KB))
                if ex is not None:   # AOT-precompiled (preload_compile)
                    self.state = ex(self.state, bx, by, bz, bc, counts)
                else:
                    self.state = build.build_many(self.cfg, self.state, bx, by,
                                                  bz, bc, counts)
                del bx, by, bz, bc
            self.finish_splits()
            self._splits_finished = True
            jax.block_until_ready(self.state.num_nodes)
            self._capacity_flag = bool(self.state.mem_capacity_reached)
            self._steps_since_poll = 0
            self.t_build.add(time.perf_counter() - t0)
            return
        if poll_every is None:
            state_bytes = sum(a.nbytes for a in jax.tree.leaves(self.state))
            poll_every = 1 if state_bytes > (1 << 30) else 4
        chunks = 0
        for item in self._stream_iter:
            if isinstance(item[4], (int, np.integer)):
                x, y, z, rgba, count = item
                self.ingest(x, y, z, rgba, count, sync=False)
            else:
                self.ingest_chunk(item, sync=False)
            chunks += 1
            if chunks % poll_every == 0:
                self._maybe_compact(poll=True)
                if self._capacity_flag:
                    break
        self.last_batch_finished = True
        self.finish_splits()
        self._splits_finished = True
        jax.block_until_ready(self.state.num_nodes)
        self._steps_since_poll = 0
        self._capacity_flag = bool(self.state.mem_capacity_reached)
        self.t_build.add(time.perf_counter() - t0)

    def preload_compile(self, extra_totals=()) -> float:
        """AOT-compile the bulk-load programs WITHOUT executing anything;
        returns the compile seconds. Call after open(), before load_all().
        extra_totals: other dataset point counts this engine will later load
        (their scan-bucket program variants are compiled now too).

        Two reasons this is its own step instead of a warm-up load:
        (a) it matches the reference's contract — NVRTC compiles all kernels
            at startup (CudaModularProgram.h:62-135), so its headline
            drag-drop time contains zero compilation; and
        (b) on the tunneled TPU runtime the H2D fast path survives program
            COMPILATION but not EXECUTION (measured r5: device_put runs
            ~1.1 GB/s in a fresh process and after lower().compile() of the
            build programs, but collapses ~25x persistently once any build
            executes). Compiling AOT and staging before the first dispatch
            keeps the whole load at wire speed.
        """
        if self.stream is None or self.state is None:
            return 0.0
        t0 = time.perf_counter()
        cfg, B = self.cfg, self.cfg.step_points
        st_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.state)
        aot = getattr(self, "_aot", None) or {}
        for total in (self.stream.total_points, *extra_totals):
            n_steps = max((int(total) + B - 1) // B, 1)
            KB = _scan_bucket(n_steps)
            if ("build_many", KB) not in aot:
                col = lambda dt: jax.ShapeDtypeStruct((KB, B), dt)
                aot[("build_many", KB)] = build.build_many.lower(
                    cfg, st_sds, col(jnp.float32), col(jnp.float32),
                    col(jnp.float32), col(jnp.uint32),
                    jax.ShapeDtypeStruct((KB,), jnp.int32)).compile()
            # the staged-plane concat the timed bulk path dispatches first
            kc = max(cfg.steps_per_dispatch, 1)
            ks = [kc] * (n_steps // kc) + ([n_steps % kc] if n_steps % kc else [])
            item = lambda k: tuple(
                jax.ShapeDtypeStruct((k, B), dt)
                for dt in (jnp.float32,) * 3 + (jnp.uint32,)) + (
                jax.ShapeDtypeStruct((k,), jnp.int32),)
            parts_sds = tuple(item(k) for k in ks)
            akey = ("assemble", tuple(ks))
            if akey not in aot:
                aot[akey] = _bulk_assemble.lower(parts_sds, KB).compile()
        if "overfull" not in aot:
            aot["overfull"] = build.overfull_leaf_ids.lower(
                cfg, st_sds).compile()
            ids_sds, _ = jax.eval_shape(
                functools.partial(build.overfull_leaf_ids, cfg), st_sds)
            aot["split_finish"] = build.split_finish.lower(
                cfg, st_sds, ids_sds).compile()
        self._aot = aot
        self._aot_cfg = self.cfg   # identity guard: cfg replace invalidates
        return time.perf_counter() - t0

    def _aot_for_cfg(self) -> dict:
        """AOT executables, valid only while cfg is the exact object they were
        lowered against (auto-cfg re-open and candidate-window bumps replace
        cfg, changing program semantics)."""
        if getattr(self, "_aot_cfg", None) is self.cfg:
            return getattr(self, "_aot", {})
        return {}

    def _end_of_stream(self) -> None:
        """Stream drained (or capacity reached): run the one-time end-of-load
        split convergence on EVERY consumption path — ingest_next drives the
        CLI frame loop and the interactive viewer, not just load_all."""
        self.last_batch_finished = True
        if not getattr(self, "_splits_finished", False):
            self._splits_finished = True
            self.finish_splits()

    def finish_splits(self, max_rounds: int = 32) -> int:
        """End-of-load split convergence: leaves can end the stream over the
        50k threshold when a step's round-1 budgets deferred their split and no
        later batch revisited them (the reference's expand() instead converges
        within each batch, voxels.cu:385-414). Loops the forced-selection pass
        until no leaf is overfull; returns rounds run (0 in the common case)."""
        aot = self._aot_for_cfg()
        of, sf = aot.get("overfull"), aot.get("split_finish")
        rounds = 0
        while rounds < max_rounds:
            ids, n = (of(self.state) if of is not None
                      else build.overfull_leaf_ids(self.cfg, self.state))
            if int(n) == 0:
                break
            self.state = (sf(self.state, ids) if sf is not None
                          else build.split_finish(self.cfg, self.state, ids))
            rounds += 1
        return rounds

    _capacity_flag: bool = False

    def _marks(self) -> dict:
        """ALL host-side watermarks in ONE device round trip.

        Every `int(state.x)` readback costs a full tunnel RTT (~23 ms); the
        simultaneous loop consults a dozen watermarks per frame, which alone
        cost more than the render. device_get issues the D2H copies for the
        whole tuple before blocking, so the batch pays ~one RTT. Cached per
        state identity: any dispatch replaces self.state and invalidates."""
        if getattr(self, "_marks_for", None) is not self.state:
            s = self.state
            v = jax.device_get((
                s.num_points_processed, s.vox_used, s.vox_compacted,
                s.pool_used, s.num_nodes, s.num_segments,
                s.num_candidates_dropped, s.mem_capacity_reached))
            self._marks_cache = dict(
                processed=int(v[0]), vox_used=int(v[1]), vox_compacted=int(v[2]),
                pool_used=int(v[3]), num_nodes=int(v[4]), num_segments=int(v[5]),
                dropped=int(v[6]), mem_cap=bool(v[7]))
            self._marks_for = self.state
        return self._marks_cache

    def _maybe_compact(self, force: bool = False, poll: bool = False):
        """Capacity poll + NEAR-CAPACITY voxel compaction.

        Compaction exists to dedup the lazy voxel store (first-arrival wins);
        deferring it until the store approaches capacity (a) removes the
        per-few-chunks drain from the load pipeline and (b) pins the windowed
        compaction program to essentially ONE bucket (the near-capacity one),
        where the old grow-by-slack policy compiled a fresh multi-minute
        program per pow2 watermark on the tunneled device. Renders that need
        an exact CSR force-compact explicitly (see render())."""
        if not (force or poll) and getattr(self, "_steps_since_poll", 0) < 4:
            return
        self._steps_since_poll = 0
        # capacity poll piggybacks on the sync this readback causes (ADVICE r2):
        # ingest_next/load_all consult the cached flag so the load actually stops
        m = self._marks()
        self._capacity_flag = m["mem_cap"]
        self._adapt_candidate_windows()
        threshold = int(self.cfg.voxel_capacity * self.cfg.voxel_compact_watermark)
        if force or m["vox_used"] > threshold:
            pins = self._pins_active()
            self.state = build.compact_voxels_auto(
                self.cfg, self.state,
                min_window=pins["vox_compact_w"] if pins else 0,
                used=m["vox_used"])
            m = self._marks()
            self._last_compacted = m["vox_used"]
            # directory hygiene: keep the live segment count inside the spill
            # selection scan window (build.spill_calc) with headroom
            seg_limit = min(self.cfg.seg_scan_window,
                            self.cfg.segment_capacity) // 2
            if m["num_segments"] > seg_limit:
                self.state = build.compact_segments(self.cfg, self.state)

    _cand_bumps: int = 0

    def _adapt_candidate_windows(self):
        """Auto-upsize the multi-level candidate windows under SUSTAINED drops.

        Candidate-window overflow is transient only when later batches revisit
        the dropped cells (voxels.cu:93-119 first-come semantics); scan-ordered
        lidar mostly doesn't revisit, so a sustained drop rate means permanently
        missing voxels (VERDICT r2 weak #4). When drops since the last poll
        exceed 1% of the points ingested in the interval, double the expansion
        windows (bounded: two bumps max — each bump re-specializes the build
        programs, which is minutes of compile on a tunneled device)."""
        m = self._marks()
        dropped, processed = m["dropped"], m["processed"]
        d_drop = dropped - getattr(self, "_last_dropped", 0)
        d_proc = processed - getattr(self, "_last_processed", 0)
        self._last_dropped, self._last_processed = dropped, processed
        if self._cand_bumps >= 2 or d_proc <= 0 or d_drop * 100 < d_proc:
            return
        self._cand_bumps += 1
        # right-size from the measured overflow instead of blind doubling:
        # drops/step is exactly the window shortfall, so ONE re-specialization
        # usually lands at a lossless window (doubling from a starved base
        # needed several recompiles and kept losing batches in between)
        cur = self.cfg.cand_multi_rows or self.cfg.step_points // 4
        steps = max(d_proc // max(self.cfg.step_points, 1), 1)
        need = cur + (d_drop + steps - 1) // steps
        need = max(2 * cur, int(need * 1.25))
        need = 1 << (need - 1).bit_length()   # pow2: bounded program variants
        # emitters come from the batch AND split-spilled re-emissions
        # (build.batch_voxel_candidates spill_extra), so the ceiling is the
        # combined width, not the step size
        cap = self.cfg.step_points + self.cfg.spill_capacity
        self.cfg = dataclasses.replace(
            self.cfg, cand_multi_rows=min(need, cap))

    def filter_colors(self) -> None:
        """Bottom-up voxel color filtering (reference colorfilter.cu; see
        octree/colorfilter.py). Compacts first for an exact CSR."""
        from .octree import colorfilter
        self._maybe_compact(force=True)
        self.state = colorfilter.filter_colors(self.cfg, self.state)

    # --- rendering ---
    def uniforms(self, width: int, height: int) -> Uniforms:
        self.camera.width, self.camera.height = width, height
        self.camera.fovy = self.settings.fovy
        t = self.camera.transform()
        if self.settings.do_update_visibility or self._transform_update_bound is None:
            self._transform_update_bound = t
        return Uniforms.make(width, height, t, self._transform_update_bound,
                             self.settings)

    def _windows(self):
        """Sample windows sized to the previous frame's visible counts (1/8-pow2
        buckets: 3-bit mantissa x pow2, <= 8 variants per octave, <= 12.5%
        over-sort vs up to 2x for plain pow2 — the sort/prepass/kernel all
        scale with window rows). A frame whose visibility outgrows the bucket
        truncates once; the next frame upsizes."""
        pv, vv = getattr(self, "_last_visible", (1 << 20, 1 << 20))
        ppw, pvw = getattr(self, "_last_windows", (1 << 20, 1 << 20))
        pw = sample_window(pv, ppw, self.cfg.max_render_points)
        vw = sample_window(vv, pvw, self.cfg.max_render_voxels)
        self._last_windows = (pw, vw)
        nn, ns = getattr(self, "_last_counts", (0, 0))
        nw = directory_window(nn, self.cfg.node_capacity)
        sw = directory_window(ns, self.cfg.segment_capacity)
        return pw, vw, nw, sw

    def _note_visible(self, fstats):
        vp, vv, tr = jax.device_get((fstats.num_visible_points,
                                     fstats.num_visible_voxels,
                                     fstats.truncated))
        self._last_visible = (int(vp), int(vv))
        m = self._marks()
        self._last_counts = (m["num_nodes"], m["num_segments"])
        self._last_truncated = bool(tr)

    # --- draw pool (screen-budgeted decimation, render/drawpool.py) ---
    _draw_pool = None
    _pool_key = None

    def _ensure_draw_pool(self) -> None:
        """(Re)build the draw pool when the octree changed since the last
        build. Callers have already force-compacted (the pool reads the exact
        voxel CSR). The build is one sort+gather pass over the live pools —
        a one-time cost amortized over every pooled frame until the next
        ingest (bounded staleness: the rebuild cadence is the render call
        itself on the post-load path)."""
        m = self._marks()
        key = (m["processed"], m["num_nodes"], m["vox_compacted"])
        if self._draw_pool is not None and self._pool_key == key:
            return
        cap = self.cfg.draw_cap
        pool_w = _size_bucket(ragged.window_for(m["pool_used"],
                                                max(m["num_segments"], 1)))
        vox_w = min(_size_bucket(max(m["vox_compacted"], 128)),
                    (self.state.vox_k0.shape[0] // 128) * 128)
        node_w = directory_window(m["num_nodes"], self.cfg.node_capacity)
        pc_need, vc_need = jax.device_get(_pool_need(self.state, cap))
        live_nodes = m["num_nodes"]
        pc = _size_bucket(int(pc_need) + 256 * live_nodes + 128)
        vc = _size_bucket(int(vc_need) + 256 * live_nodes + 128)
        pins = self._pins_active()
        if pins:
            # grow-only seeds: every mid-stream rebuild reuses ONE program
            pool_w = max(pool_w, pins["pool_w"])
            vox_w = max(vox_w, pins["vox_w"])
            node_w = max(node_w, pins["node_w"])
            pc, vc = max(pc, pins["pc"]), max(vc, pins["vc"])
        self._draw_pool = drawpool_mod.build_draw_pool(
            self.cfg, self.state, pool_w, vox_w, node_w, cap, pc, vc)
        self._pool_key = key

    def _pooled_windows(self, u):
        pp, pv, ep, ev = (int(v) for v in jax.device_get(probe_pooled_counts(
            self.cfg, self.state, self._draw_pool, u)))
        prev = getattr(self, "_last_pool_windows", (1 << 18,) * 4)
        ws = tuple(sample_window(n, p, cap) for n, p, cap in zip(
            (pp, pv, ep, ev), prev,
            (self.cfg.max_render_points, self.cfg.max_render_voxels,
             self.cfg.max_render_points, self.cfg.max_render_voxels)))
        pins = self._pins_active()
        if pins:
            ws = tuple(max(w, q) for w, q in zip(ws, pins["ws"]))
        self._last_pool_windows = ws
        return ws

    def _pooled_windows_cached(self, u, force: bool = False):
        """probe_pooled_counts is an extra dispatch + readback (a full sync,
        ~23 ms on the tunneled runtime) — re-probe only when the windows are
        missing/stale (every 8 frames), the pool was rebuilt (force), or the
        last frame truncated (the probe undercounted); otherwise reuse. A
        camera swing past the cached windows costs one truncated frame and the
        next frame re-probes (the sample_window damping absorbs the rest)."""
        ws = getattr(self, "_cached_pool_ws", None)
        self._pool_ws_age = getattr(self, "_pool_ws_age", 0) + 1
        if (ws is None or force or self._pool_ws_age >= 8
                or getattr(self, "_last_truncated", False)):
            ws = self._pooled_windows(u)
            self._cached_pool_ws = ws
            self._pool_ws_age = 0
        return ws

    def _ensure_stream_pool(self) -> bool:
        """Draw-pool rebuild policy for the SIMULTANEOUS loop: rebuild when
        missing, or when >25% of the processed points postdate the pool (nodes
        the pool misses render exactly — staleness costs throughput, never
        correctness) AND the rebuild cost amortizes — at most 25% of
        wall-clock goes to rebuilds (a rebuild is a forced compaction + a
        full-pool sort, ~0.5-1 s at 16M points on a v5e; unbounded cadence
        made the rebuild THE streaming frame time, r5: 1305 ms/frame).
        Returns True when a rebuild happened. The reference has no analogue
        (it re-walks every chunk list per frame)."""
        m = self._marks()
        pts = m["processed"]
        built = getattr(self, "_pool_built_pts", -1)
        if self._draw_pool is not None and built >= 0:
            if pts - built <= max(built // 4, self.cfg.step_points):
                return False
            cost = getattr(self, "_pool_rebuild_cost", 0.0)
            if time.perf_counter() - getattr(self, "_pool_rebuild_t", 0.0) \
                    < 4.0 * cost:
                return False
        t0 = time.perf_counter()
        # the pool reads the exact voxel CSR: fold in tail appends first
        self._maybe_compact(force=m["vox_used"] > m["vox_compacted"])
        self._ensure_draw_pool()
        jax.block_until_ready(self._draw_pool.pt_off)
        self._pool_rebuild_cost = time.perf_counter() - t0
        self._pool_rebuild_t = time.perf_counter()
        self._pool_built_pts = pts
        return True

    def render(self, width: int, height: int):
        """Render-only frame -> (image u32 [H,W], Stats)."""
        # an exact CSR needs every tail append folded in (vox_voff/vcnt are only
        # correct for rows [0, vox_compacted))
        m = self._marks()
        self._maybe_compact(force=m["vox_used"] > m["vox_compacted"])
        m = self._marks()
        u = self.uniforms(width, height)
        t0 = time.perf_counter()
        if self.settings.point_budget > 0:
            key_before = self._pool_key
            self._ensure_draw_pool()
            ppw, pvw, epw, evw = self._pooled_windows_cached(
                u, force=self._pool_key != key_before)
            nw = directory_window(m["num_nodes"], self.cfg.node_capacity)
            sw = directory_window(m["num_segments"], self.cfg.segment_capacity)
            pins = self._pins_active()
            if pins:
                nw = max(nw, pins["node_w"])
                sw = max(sw, pins["seg_w"])
            img, fstats = render_frame_pooled(
                self.cfg, self.state, self._draw_pool, width, height, u,
                ppw, pvw, epw, evw, nw, sw)
        else:
            pw, vw, nw, sw = self._windows()
            img, fstats = render_frame(self.cfg, self.state, width, height, u,
                                       pw, vw, nw, sw)
        img.block_until_ready()
        self.t_render.add(time.perf_counter() - t0)
        self._note_visible(fstats)
        return img, _collect_stats(self.cfg, self.state, fstats)

    def frame(self, width: int, height: int):
        """One simultaneous frame: ingest + render (the reference's per-frame
        renderCUDA + updateOctree, main_progressive_octree.cpp:1176-1180).

        Batches consumed per frame adapt to settings.frame_budget_ms, the host
        analogue of the construct kernel's 10 ms / <=20-batch self-limit
        (progressive_octree_voxels.cu:22,883,939-949): extra batches ride one
        async build dispatch, the last one is fused with the render.
        """
        items = []
        if self.stream is not None and not self.last_batch_finished \
                and not self._marks()["mem_cap"]:
            want = max(1, int(getattr(self, "_batches_per_frame", 1)))
            for _ in range(want):
                item = next(self._stream_iter, None)
                if item is None:
                    self.last_batch_finished = True
                    break
                self._consumed_chunks = getattr(self, "_consumed_chunks", 0) + 1
                items.append(item)
        if not items:
            return self.render(width, height)
        t0 = time.perf_counter()
        for it in items[:-1]:
            if isinstance(it[4], (int, np.integer)):   # chunk_steps == 1 stream
                self.ingest(*it, sync=False)
            else:
                self.ingest_chunk(it, sync=False)
        u = self.uniforms(width, height)
        last = items[-1]
        pooled = self.settings.point_budget > 0
        if pooled:
            rebuilt = self._ensure_stream_pool()
            m = self._marks()
            ppw, pvw, epw, evw = self._pooled_windows_cached(u, force=rebuilt)
            nw = directory_window(m["num_nodes"], self.cfg.node_capacity)
            sw = directory_window(m["num_segments"], self.cfg.segment_capacity)
            pins = self._pins_active()
            if pins:
                nw = max(nw, pins["node_w"])
                sw = max(sw, pins["seg_w"])
            if isinstance(last[4], (int, np.integer)):  # wrap as a K=1 chunk
                x, y, z, rgba, count = last
                last = (x[None], y[None], z[None], rgba[None],
                        np.asarray([count], np.int32))
            bx, by, bz, bc, counts = last
            self.state, img, fstats = _fused_chunk_pooled(
                self.cfg, self.state, width, height, bx, by, bz, bc,
                jnp.asarray(counts, jnp.int32), ppw, pvw, epw, evw, nw, sw,
                self._draw_pool, u)
            self._steps_since_poll = getattr(self, "_steps_since_poll", 0) \
                + bx.shape[0]
        elif isinstance(last[4], (int, np.integer)):  # chunk_steps == 1 stream
            pw, vw, nw, sw = self._windows()
            x, y, z, rgba, count = last
            self.state, img, fstats = _fused_step(
                self.cfg, self.state, width, height, x, y, z, rgba,
                jnp.asarray(count, jnp.int32), pw, vw, nw, sw, u)
            self._steps_since_poll = getattr(self, "_steps_since_poll", 0) + 1
        else:
            pw, vw, nw, sw = self._windows()
            bx, by, bz, bc, counts = last
            self.state, img, fstats = _fused_chunk(
                self.cfg, self.state, width, height, bx, by, bz, bc,
                jnp.asarray(counts, jnp.int32), pw, vw, nw, sw, u)
            self._steps_since_poll = getattr(self, "_steps_since_poll", 0) \
                + bx.shape[0]
        img.block_until_ready()
        dt = time.perf_counter() - t0
        self.t_fused.add(dt)
        self._adapt_budget(dt * 1e3, len(items))
        self._note_visible(fstats)
        self._maybe_compact()
        return img, _collect_stats(self.cfg, self.state, fstats)

    def _adapt_budget(self, frame_ms: float, consumed: int):
        """Grow/shrink batches-per-frame toward settings.frame_budget_ms."""
        budget = self.settings.frame_budget_ms
        bpf = max(1, int(getattr(self, "_batches_per_frame", 1)))
        if budget <= 0:
            self._batches_per_frame = 1
            return
        per_batch = frame_ms / max(consumed, 1)
        target = max(1, int(budget / max(per_batch, 1e-3)))
        # move one step at a time (the reference's cap is 20 batches/frame)
        if target > bpf:
            bpf += 1
        elif target < bpf:
            bpf -= 1
        self._batches_per_frame = min(max(bpf, 1), self.cfg.max_batches_per_frame)

    # --- reporting (reference stats table, :1484-1583) ---
    def report(self) -> dict:
        stats = jax.tree.map(lambda x: np.asarray(x).item(),
                             _collect_stats(self.cfg, self.state, None))
        out = dataclasses.asdict(stats)
        out["timings"] = dict(build=self.t_build.row(), render=self.t_render.row(),
                              fused=self.t_fused.row())
        if self.stream is not None:
            out["stream"] = self.stream.stats()
        return out
