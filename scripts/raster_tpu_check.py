"""Compile + time the tile-binned Pallas rasterizer on the real TPU.

Synthesizes a representative 1080p sample load and times the full
rasterize_tiles path (sort + kernel) and the kernel alone.
"""
import os
import sys
import time

import numpy as np

S = int(os.environ.get("RT_SAMPLES", 4 << 20))
W, H = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig, Settings, Uniforms
    from simlod_tpu.render import raster, raster_tiles

    rng = np.random.default_rng(5)
    n = S
    xa = jnp.asarray(rng.uniform(-0.9, 0.9, n).astype(np.float32))
    ya = jnp.asarray(rng.uniform(-0.9, 0.9, n).astype(np.float32))
    za = jnp.asarray(rng.uniform(1.0, 5.0, n).astype(np.float32))
    ca = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))

    def mk_samples(x, y, z, rgba):
        return raster.Samples(
            x=x, y=y, z=z, rgba=rgba,
            node_fn=lambda: jnp.zeros(n, jnp.int32),
            level_fn=lambda: jnp.zeros(n, jnp.int32),
            valid=jnp.ones(n, bool), count=jnp.int32(n))

    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 1.0
    m[1, 1] = 1.0
    m[3, 2] = 1.0
    u = Uniforms.make(W, H, m, settings=Settings(enable_edl=False))

    cfg = EngineConfig()

    import functools

    def make_full(tile, chunk, rcfg):
        @functools.partial(jax.jit, static_argnums=(4, 5))
        def full(x, y, z, c, w, h, u):
            cc, d = raster_tiles.rasterize_tiles(
                rcfg, u, w, h, [mk_samples(x, y, z, c)], tile=tile, chunk=chunk)
            return cc[::4097].astype(jnp.int32).sum() + d[::4097].sum()
        return full

    fast_cfg = EngineConfig(raster_exact_tiebreak=False)
    # (tile, chunk, cfg-label) — tile is capped at 1024 by the factored kernel
    sweeps = [(512, 512, cfg, "exact"), (512, 512, fast_cfg, "fast-tb"),
              (1024, 1024, cfg, "exact"), (1024, 512, cfg, "exact"),
              (512, 1024, cfg, "exact"), (1024, 2048, cfg, "exact"),
              (256, 512, cfg, "exact"), (512, 256, cfg, "exact")]
    for tile, chunk, rcfg, lbl in sweeps:
        full = make_full(tile, chunk, rcfg)
        t0 = time.perf_counter()
        out = int(full(xa, ya, za, ca, W, H, u))
        print(f"tile={tile} chunk={chunk} {lbl} compile+run "
              f"{time.perf_counter()-t0:.0f}s chk={out}", file=sys.stderr)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = int(full(xa, ya, za, ca, W, H, u))
            best = min(best, time.perf_counter() - t0)
        print(f"rasterize_tiles S={S} tile={tile} chunk={chunk} {lbl}: "
              f"{best*1e3:.1f} ms")

    # scatter path for comparison
    @functools.partial(jax.jit, static_argnums=(4, 5))
    def old(x, y, z, c, w, h, u):
        cc, d = raster.rasterize(cfg, u, w, h, [mk_samples(x, y, z, c)])
        return cc[::4097].astype(jnp.int32).sum() + d[::4097].sum()

    t0 = time.perf_counter()
    _ = int(old(xa, ya, za, ca, W, H, u))
    print(f"old compile {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    best_o = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(old(xa, ya, za, ca, W, H, u))
        best_o = min(best_o, time.perf_counter() - t0)
    print(f"rasterize(scatter) S={S}: {best_o*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
