"""Raw H2D throughput probe over the tunneled TPU attachment.

Measures jax.device_put completion rate for various array sizes/shapes and
issue patterns, to size the streaming pipeline's transfer granularity.
"""
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[h2d] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    dev = jax.devices()[0]
    log(f"device={dev}")

    def run(label, arrays, reps=2):
        # warm once (alloc paths)
        for a in arrays:
            jax.device_put(a, dev).block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [jax.device_put(a, dev) for a in arrays]
            for o in outs:
                o.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        nbytes = sum(a.nbytes for a in arrays)
        log(f"{label}: {nbytes/1e6:.0f} MB in {best:.3f}s = "
            f"{nbytes/best/1e9:.3f} GB/s")

    MB = 1 << 20
    one256 = np.ones(256 * MB // 4, np.float32)
    run("1x256MB flat f32", [one256])
    run("8x32MB flat f32", [np.ones(32 * MB // 4, np.float32) for _ in range(8)])
    run("1x32MB flat f32", [np.ones(32 * MB // 4, np.float32)])
    run("1x32MB [4,B] f32", [np.ones((4, 8 * MB // 4), np.float32)])
    run("1x128MB [16,B] f32", [np.ones((16, 8 * MB // 4), np.float32)])
    run("4x128MB flat f32", [np.ones(128 * MB // 4, np.float32)
                             for _ in range(4)])
    run("1x512MB flat f32", [np.ones(512 * MB // 4, np.float32)])
    run("1x64MB flat u32", [np.ones(64 * MB // 4, np.uint32)])
    # sustained rate past the idle burst credit: a whole 64M-file's worth of
    # 16MB pieces (what the load pipeline actually ships)
    rng = np.random.default_rng(0)
    run("64x16MB (1GB of pieces)",
        [rng.random(16 * MB // 4).astype(np.float32) for _ in range(64)],
        reps=2)


if __name__ == "__main__":
    main()
