"""Sustained GB-scale staging probe (fresh-process fast-path regime).

Both r5 bench attempts with the file-first ordering hung forever in the file
phase's staging: the uploader's device_put (or its fence) never completed.
This reproduces the exact pattern standalone — put_pieces of [K,B] column
planes with the stream's in-flight fencing — with per-set progress prints, so
the wedge point (bytes in) and the mitigation (piece size, in-flight cap,
inter-put pacing) can be measured directly.

env: SUST_TOTAL_MB (default 1024), SUST_PIECE_MB (16), SUST_INFLIGHT_MB (96),
     SUST_SLEEP_MS (0, between puts)
"""
import collections
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[sust {time.perf_counter()-T0:7.2f}s] {m}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()
TOTAL_MB = int(os.environ.get("SUST_TOTAL_MB", 1024))
PIECE_MB = int(os.environ.get("SUST_PIECE_MB", 16))
INFLIGHT_MB = int(os.environ.get("SUST_INFLIGHT_MB", 96))
SLEEP_MS = float(os.environ.get("SUST_SLEEP_MS", 0))

import jax  # noqa: E402

from simlod_tpu.io.transfer import assemble, put_pieces  # noqa: E402

dev = jax.devices()[0]
log(f"platform={dev.platform} total={TOTAL_MB}MB piece={PIECE_MB}MB "
    f"inflight={INFLIGHT_MB}MB sleep={SLEEP_MS}ms")

# one [K,B] f32 plane set = 4 columns x 8 MB x K steps; use K=2 -> 64 MB/set
K, B = 2, 2 << 20
SET_MB = 4 * K * B * 4 >> 20
planes = [np.random.default_rng(i).random((K, B), np.float32).astype(
    np.float32) for i in range(4)]
n_sets = max(1, TOTAL_MB // SET_MB)
max_inflight = max(1, INFLIGHT_MB // SET_MB)
inflight = collections.deque()
piece_bytes = PIECE_MB << 20

t_put = t_fence = 0.0
for s in range(n_sets):
    t0 = time.perf_counter()
    cols = []
    for p in planes:
        pl = put_pieces(p, None, piece_bytes)
        if SLEEP_MS:
            time.sleep(SLEEP_MS / 1e3)
        cols.append(assemble(pl))
    t_put += time.perf_counter() - t0
    inflight.append(cols)
    while len(inflight) >= max_inflight:
        t0 = time.perf_counter()
        old = inflight.popleft()
        for a in old:
            a.block_until_ready()
        t_fence += time.perf_counter() - t0
    done_mb = (s + 1) * SET_MB
    log(f"set {s+1}/{n_sets} staged ({done_mb} MB) put={t_put:.2f}s "
        f"fence={t_fence:.2f}s")
while inflight:
    old = inflight.popleft()
    for a in old:
        a.block_until_ready()
dt = time.perf_counter() - T0
log(f"DONE {n_sets*SET_MB} MB in {dt:.2f}s = {n_sets*SET_MB/dt:.0f} MB/s "
    f"(put {t_put:.2f}s fence {t_fence:.2f}s)")
