"""Host streaming pipeline: files -> loader threads -> staging buffers -> device ring.

The reference streams with 2xnCPU detached loader threads parsing into a pinned-memory
pool, a high-priority uploader thread issuing cuMemcpyHtoDAsync into a 50-slot device
ring, and counter-based backpressure (main_progressive_octree.cpp:141-222, 811-1063).

TPU-native equivalent:
  - loader threads parse file batches into reusable host staging buffers (the
    pinned-pool analogue — numpy arrays recycled through a free queue),
  - an uploader thread coalesces loader batches into step-sized buffers and issues
    jax.device_put (async; XLA overlaps the transfer with running steps),
  - backpressure: at most `ring_slots` device-resident steps may be in flight ahead of
    the consumer (the reference stalls loaders when uploaded-processed > ring capacity,
    :1012-1015).

File scanning/bounds mirror reload() (main_progressive_octree.cpp:644-773): all files
share one union box; every file's coordinates are translated by -union_min so the
octree domain starts at the origin.
"""
from __future__ import annotations

import collections
import dataclasses
import os
import queue
import threading
import time

import numpy as np

from ..formats import las, laz, simlod

BATCH_POINTS = 1_000_000   # loader batch granularity (reference MAX_BATCH_SIZE, :36)


class _BufPool:
    """Free-queue of PRE-TOUCHED host buffer sets (the pinned-memory-pool
    analogue, main_progressive_octree.cpp:141-222). On this microVM,
    first-touch page population of a fresh allocation intermittently runs
    ~100x slower than warm memory (15-50 MB/s vs GB/s during host IO storms),
    so the load pipeline never allocates in steady state: every decode output,
    staging plane, and record buffer cycles through one of these pools."""

    def __init__(self, make, n: int):
        self._make = make
        self._q: queue.Queue = queue.Queue()
        self.ensure(n)

    def ensure(self, n: int) -> None:
        """Top the pool up to n free sets (covers buffers leaked by a stream
        stopped with transfers in flight)."""
        while self._q.qsize() < n:
            bufs = self._make()
            for b in (bufs if isinstance(bufs, tuple) else (bufs,)):
                b.reshape(-1)[:: 4096 // b.itemsize] = 0   # touch every page
            self._q.put(bufs)

    def get(self, stop: threading.Event):
        while not stop.is_set():
            try:
                return self._q.get(timeout=0.1)
            except queue.Empty:
                continue
        return None

    def put(self, bufs) -> None:
        self._q.put(bufs)


# process-wide pool registry: streams come and go (every Engine.open creates
# one) but the pre-touched memory survives — re-touching costs seconds per
# open when the host is in an IO storm
_POOLS: dict = {}
_POOLS_LOCK = threading.Lock()


def _shared_pool(key, make, n: int) -> _BufPool:
    with _POOLS_LOCK:
        pool = _POOLS.get(key)
        if pool is None:
            pool = _POOLS[key] = _BufPool(make, n)
        else:
            pool.ensure(n)
        return pool


@dataclasses.dataclass
class FileEntry:
    path: str
    kind: str                # "simlod" | "las" | "laz"
    num_points: int
    box_min: np.ndarray      # original coords
    box_max: np.ndarray
    header: object = None


@dataclasses.dataclass
class BatchRef:
    entry: FileEntry
    first: int
    count: int


def scan_paths(paths) -> list[FileEntry]:
    files = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                files.append(os.path.join(p, name))
        else:
            files.append(p)
    entries = []
    for f in files:
        low = f.lower()
        if low.endswith(".simlod"):
            info = simlod.load_info(f)
            entries.append(FileEntry(f, "simlod", info.num_points,
                                     info.box_min.astype(np.float64),
                                     info.box_max.astype(np.float64), info))
        elif low.endswith(".las"):
            hdr = las.load_header(f)
            entries.append(FileEntry(f, "las", hdr.num_points, hdr.box_min,
                                     hdr.box_max, hdr))
        elif low.endswith(".laz"):
            hdr = laz.load_header(f)
            entries.append(FileEntry(f, "laz", hdr.num_points, hdr.box_min,
                                     hdr.box_max, hdr))
    return entries


class PointStream:
    """Threaded streaming reader yielding device-ready step batches.

    Iterate to get (xyz_device [B,3] f32, rgba_device [B] u32, count int); the arrays
    are padded to `step_points` rows. Device transfer is asynchronous (jax.device_put);
    the consumer's jit step blocks on it naturally.
    """

    def __init__(self, paths, step_points: int, device=None,
                 num_loaders: int | None = None, ring_slots: int = 8,
                 batch_points: int = BATCH_POINTS, chunk_steps: int = 1,
                 box_override=None):
        self.entries = scan_paths(paths)
        if not self.entries:
            raise FileNotFoundError(f"no point cloud files under {paths!r}")
        self.step_points = step_points
        self.device = device
        self.batch_points = batch_points
        self.chunk_steps = max(1, chunk_steps)
        if box_override is not None:
            # out-of-core brick streams: coordinates are rebased to a WIDER
            # world box (the union over all bricks) so every brick's octree
            # shares one global cube (see outofcore.py)
            self.box_min = np.asarray(box_override[0], np.float64)
            self.box_max = np.asarray(box_override[1], np.float64)
        else:
            self.box_min = np.min([e.box_min for e in self.entries], axis=0)
            self.box_max = np.max([e.box_max for e in self.entries], axis=0)
        self.total_points = sum(e.num_points for e in self.entries)

        # batch list (reference reload(), :719-767)
        self._batches = collections.deque()
        for e in self.entries:
            for first in range(0, e.num_points, batch_points):
                cnt = min(batch_points, e.num_points - first)
                self._batches.append(BatchRef(e, first, cnt))
        self._batch_lock = threading.Lock()

        # ONE loader per core, not the reference's 2x (IO latency is hidden by
        # the page cache here, so loading is CPU/GIL-bound: on a 1-core host,
        # 2 loader threads measured 5.8 MP/s vs 41.5 MP/s with 1 — GIL
        # ping-pong between decode threads swamps the pipeline)
        n_loaders = num_loaders or max(1, os.cpu_count() or 1)
        self._loaded: queue.Queue = queue.Queue(maxsize=max(4, ring_slots))
        self._ready: queue.Queue = queue.Queue(maxsize=ring_slots)  # backpressure

        # pooled, pre-touched host buffers (see _BufPool): loaders decode
        # straight into pooled column sets (one pass, no allocation); the
        # uploader stages into pooled [K,B] planes recycled after the H2D
        # transfer completes
        from .. import native as _native
        self._cols = _native.cols_available()
        if self._cols:
            bp = batch_points
            self._batch_pool = _shared_pool(
                ("batch", bp),
                lambda: (np.empty(bp, np.float32), np.empty(bp, np.float32),
                         np.empty(bp, np.float32), np.empty(bp, np.uint32)),
                n=max(4, ring_slots) + n_loaders + 2)
        K, B = self.chunk_steps, step_points
        set_bytes = 16 * K * B
        # in-flight H2D cap ~96 MB: the tunneled runtime rides a fast path only
        # for <= 16 MB transfers and modest in-flight totals (io/transfer.py,
        # scripts/h2d_bench.py) — each plane SET ships as 16 MB pieces below
        self._max_inflight = max(1, min(ring_slots, (96 << 20) // set_bytes))
        self._plane_pool = _shared_pool(
            ("plane", K, B),
            lambda: (np.empty((K, B), np.float32), np.empty((K, B), np.float32),
                     np.empty((K, B), np.float32), np.empty((K, B), np.uint32)),
            n=self._max_inflight + 1)
        self._inflight = collections.deque()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self.bytes_read = 0
        self.points_loaded = 0
        # per-phase wall-time accumulators (seconds) for the load-path profile
        self.t_decode = 0.0     # loader: file read + column decode
        self.t_lwait = 0.0      # loader: blocked on pools/queues
        self.t_copy = 0.0       # uploader: staging-plane fills
        self.t_put = 0.0        # uploader: device_put issue
        self.t_fence = 0.0      # uploader: waiting on H2D completion
        self.t_uwait = 0.0      # uploader: blocked on queues/pools
        self.t_start = time.perf_counter()

        self._loaders = [threading.Thread(target=self._loader, daemon=True)
                         for _ in range(n_loaders)]
        self._uploader = threading.Thread(target=self._upload, daemon=True)
        self._n_active_loaders = n_loaders
        self._active_lock = threading.Lock()
        for t in self._loaders:
            t.start()
        self._uploader.start()

    # --- loader threads (reference spawnLoader, :811-958) ---
    def _loader(self):
        translation = -self.box_min
        from .. import native
        while not self._stop.is_set():
            with self._batch_lock:
                if not self._batches:
                    break
                ref = self._batches.popleft()
            e = ref.entry
            n = ref.count
            if self._cols:
                # pooled single-pass path: decode columns straight into a
                # recycled buffer set; no allocation, no strided re-split
                t0 = time.perf_counter()
                bufs = self._batch_pool.get(self._stop)
                self.t_lwait += time.perf_counter() - t0
                if bufs is None:
                    break
                t0 = time.perf_counter()
                ox, oy, oz, oc = bufs
                if e.kind == "simlod":
                    shift = (e.box_min + translation).astype(np.float32)
                    mm = np.memmap(e.path, dtype=np.uint8, mode="r",
                                   offset=simlod.HEADER_BYTES)
                    raw = mm[ref.first * simlod.POINT_BYTES:
                             (ref.first + n) * simlod.POINT_BYTES]
                    native.decode_simlod_cols(raw, n, shift, ox, oy, oz, oc)
                    nbytes = n * simlod.POINT_BYTES
                elif e.kind == "las":
                    hdr = e.header
                    bpp = hdr.bytes_per_point
                    mm = np.memmap(e.path, dtype=np.uint8, mode="r",
                                   offset=hdr.offset_to_points)
                    raw = mm[ref.first * bpp:(ref.first + n) * bpp]
                    native.decode_las_cols(
                        raw, n, bpp, las.RGB_OFFSET.get(hdr.format, -1),
                        hdr.scale, hdr.offset,
                        np.asarray(translation, np.float64), ox, oy, oz, oc)
                    nbytes = n * bpp
                else:
                    xyz, rgba = laz.read_points(e.path, ref.first, n,
                                                translation=translation)
                    ox[:n] = xyz[:, 0]
                    oy[:n] = xyz[:, 1]
                    oz[:n] = xyz[:, 2]
                    oc[:n] = rgba
                    nbytes = n * 8  # compressed estimate
                self.t_decode += time.perf_counter() - t0
                item = ("cols", bufs, n)
            else:
                if e.kind == "simlod":
                    shift = (e.box_min + translation).astype(np.float32)
                    xyz, rgba = simlod.read_points(e.path, ref.first, n)
                    xyz = xyz + shift[None, :]
                    nbytes = n * simlod.POINT_BYTES
                elif e.kind == "las":
                    xyz, rgba = las.read_points(e.header, ref.first, n,
                                                translation=translation)
                    nbytes = n * e.header.bytes_per_point
                else:
                    xyz, rgba = laz.read_points(e.path, ref.first, n,
                                                translation=translation)
                    nbytes = n * 8
                item = (xyz, rgba)
            with self._stats_lock:
                self.points_loaded += n
                self.bytes_read += nbytes
            t0 = time.perf_counter()
            ok = self._put(self._loaded, item)
            self.t_lwait += time.perf_counter() - t0
            if not ok:
                break
        with self._active_lock:
            self._n_active_loaders -= 1
            if self._n_active_loaders == 0:
                self._put(self._loaded, None)  # end-of-stream sentinel

    def _put(self, q: queue.Queue, item) -> bool:
        """Backpressured put that stays stoppable (reference loaders stall on the
        ring the same way, :1012-1015, but we must also unblock on stop())."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    # --- uploader thread (reference spawnUploader, :963-1063) ---
    def _upload(self):
        import jax

        B = self.step_points
        K = self.chunk_steps
        # separate coordinate columns: a [B,3] device array lane-pads 32x on TPU.
        # With chunk_steps > 1, K step batches are stacked HOST-side into [K,B]
        # planes and shipped with ONE device_put per column — the engine then
        # feeds them to build_many verbatim (per-step device_put + on-device
        # restacking cost ~0.5 s of tiny-op dispatches per chunk over a
        # tunneled attachment).
        #
        # The planes are POOLED (pre-touched, recycled): a plane set returns
        # to the pool once its device transfer has completed. On the remote
        # (tunneled) backend the fence below guarantees the wire has read the
        # host buffer; on the in-process CPU backend device_put may alias the
        # numpy buffer zero-copy, so there the uploader hands jax a fresh
        # copy and recycles immediately.
        zero_copy_risk = jax.default_backend() == "cpu"
        planes = self._plane_pool.get(self._stop)
        counts = np.zeros((K,), np.int32)
        step = 0          # filled steps in the chunk
        fill = 0          # filled rows in the current step

        def fence_one():
            t0 = time.perf_counter()
            arrs, pset = self._inflight.popleft()
            for a in arrs:
                a.block_until_ready()
            self._plane_pool.put(pset)
            self.t_fence += time.perf_counter() - t0

        def flush():
            nonlocal planes, counts, step, fill
            if planes is None:
                return
            if fill > 0:          # close the partial step
                for p in planes:  # zero the tail: padded rows deterministic
                    p[step, fill:] = 0
                counts[step] = fill
                step, fill = step + 1, 0
            if step == 0:
                return
            for s in range(step, K):   # zero-count pad steps keep [K,B] static
                for p in planes:
                    p[s, :] = 0
            src = [p[0] if K == 1 else p for p in planes]
            if zero_copy_risk:
                src = [np.array(s) for s in src]
            t0 = time.perf_counter()
            # piece-wise H2D: <= 16 MB per device_put (the tunneled runtime's
            # fast-path unit; >= 32 MB transfers collapse ~50x — io/transfer.py)
            # + one device-side concat per column to reassemble the plane
            from .transfer import assemble, put_pieces
            piece_lists = [put_pieces(s, self.device) for s in src]
            cols = [assemble(pl) for pl in piece_lists]
            self.t_put += time.perf_counter() - t0
            item = (cols[0], cols[1], cols[2], cols[3],
                    int(counts[0]) if K == 1 else counts.copy())
            if zero_copy_risk:
                self._plane_pool.put(planes)      # jax owns fresh copies
            else:
                self._inflight.append((cols, planes))
                while len(self._inflight) >= self._max_inflight:
                    fence_one()
            counts = np.zeros((K,), np.int32)
            step = 0
            t0 = time.perf_counter()
            planes = self._plane_pool.get(self._stop) \
                if self._put(self._ready, item) else None
            self.t_uwait += time.perf_counter() - t0

        def consume(sx, sy, sz, sc, n):
            nonlocal step, fill, counts
            off = 0
            while off < n and planes is not None:
                t0 = time.perf_counter()
                take = min(B - fill, n - off)
                planes[0][step, fill:fill + take] = sx[off:off + take]
                planes[1][step, fill:fill + take] = sy[off:off + take]
                planes[2][step, fill:fill + take] = sz[off:off + take]
                planes[3][step, fill:fill + take] = sc[off:off + take]
                fill += take
                off += take
                self.t_copy += time.perf_counter() - t0
                if fill == B:
                    counts[step] = B
                    step, fill = step + 1, 0
                    if step == K:
                        flush()

        while not self._stop.is_set():
            try:
                item = self._loaded.get(timeout=0.1)
            except queue.Empty:
                continue
            if item is None:
                break
            if planes is None:
                break
            if len(item) == 3 and item[0] == "cols":
                _, bufs, n = item
                consume(bufs[0], bufs[1], bufs[2], bufs[3], n)
                self._batch_pool.put(bufs)
            else:
                xyz, rgba = item
                consume(xyz[:, 0], xyz[:, 1], xyz[:, 2], rgba, len(xyz))
        if not self._stop.is_set():
            flush()
        while self._inflight:
            fence_one()
        if planes is not None:
            self._plane_pool.put(planes)
        self._put(self._ready, None)

    # --- consumer side ---
    def __iter__(self):
        while True:
            item = self._ready.get()
            if item is None:
                return
            yield item

    def stop(self):
        """Stop and join the pipeline; safe with backpressured (blocked) threads."""
        self._stop.set()
        # drain so any put()-blocked thread can observe _stop and exit;
        # pooled column sets riding the queues return to their pool
        for q in (self._loaded, self._ready):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                if (isinstance(item, tuple) and len(item) == 3
                        and item[0] == "cols"):
                    self._batch_pool.put(item[1])
        for t in self._loaders:
            t.join(timeout=2.0)
        self._uploader.join(timeout=2.0)

    def stats(self):
        dt = time.perf_counter() - self.t_start
        return dict(points_loaded=self.points_loaded, bytes_read=self.bytes_read,
                    seconds=dt,
                    mps=self.points_loaded / dt / 1e6 if dt > 0 else 0.0,
                    gbps=self.bytes_read / dt / 1e9 if dt > 0 else 0.0,
                    t_decode=round(self.t_decode, 3),
                    t_lwait=round(self.t_lwait, 3),
                    t_copy=round(self.t_copy, 3), t_put=round(self.t_put, 3),
                    t_fence=round(self.t_fence, 3),
                    t_uwait=round(self.t_uwait, 3))
