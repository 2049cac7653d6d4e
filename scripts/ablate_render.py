"""Bisect the 1080p frame cost: visibility / sample gather / project+sort / kernel.

Builds the 16M bench tree, then times nested prefixes of the render pipeline with
engine-style adaptive windows (the same programs bench.py times). Each program
returns checksums so XLA can't DCE ablated stages.
"""
import functools
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("ABL_POINTS", 16_000_000))
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu import constants as C
    from simlod_tpu.config import EngineConfig, Settings, Uniforms
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state
    from simlod_tpu.render import camera as cam
    from simlod_tpu.render import raster, raster_tiles, visibility
    from simlod_tpu.render.render import render_frame

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=2 << 20,
        spill_capacity=2 << 20,
        max_render_points=4 << 20,
        max_render_voxels=4 << 20,
    )
    xyz, rgba = synthetic.terrain(N_POINTS, seed=11)
    box_max = xyz.max(axis=0)
    B = cfg.step_points
    n_steps = (N_POINTS + B - 1) // B
    state = init_state(cfg, np.zeros(3, np.float32), box_max)
    for s in range(n_steps):
        lo, hi = s * B, min((s + 1) * B, N_POINTS)
        cols = [np.zeros((B,), np.float32) for _ in range(3)]
        cc = np.zeros((B,), np.uint32)
        for a in range(3):
            cols[a][: hi - lo] = xyz[lo:hi, a]
        cc[: hi - lo] = rgba[lo:hi]
        state = build.build_step(cfg, state, jax.device_put(cols[0]),
                                 jax.device_put(cols[1]), jax.device_put(cols[2]),
                                 jax.device_put(cc), jnp.asarray(hi - lo, jnp.int32))
    state = build.compact_voxels_auto(cfg, state)
    print(f"built: nodes={int(state.num_nodes)} vox={int(state.vox_used)}",
          file=sys.stderr, flush=True)

    c = cam.Camera(width=WIDTH, height=HEIGHT)
    orbit = cam.OrbitControls()
    orbit.focus_box(np.zeros(3), box_max)
    c.world = orbit.world()
    u = Uniforms.make(WIDTH, HEIGHT, c.transform(), settings=Settings())

    img, fstats = render_frame(cfg, state, WIDTH, HEIGHT, u)
    jax.block_until_ready(img)

    def bucket(n, cap):
        n = max(int(n * 1.25) + 1024, 1 << 18)
        return min(1 << (n - 1).bit_length(), cap)
    pw = bucket(int(fstats.num_visible_points), cfg.max_render_points)
    vw = bucket(int(fstats.num_visible_voxels), cfg.max_render_voxels)
    print(f"windows: points={pw} voxels={vw}", file=sys.stderr, flush=True)

    npx = WIDTH * HEIGHT
    tile, chunk = raster_tiles.TILE, raster_tiles.CHUNK
    n_tiles = (npx + tile - 1) // tile

    @functools.partial(jax.jit, static_argnums=0)
    def p_vis(cfg, st, u):
        vis = visibility.compute_visibility(st, u)
        return vis.emitted[:512].sum() + vis.num_visible_points

    @functools.partial(jax.jit, static_argnums=0)
    def p_gather(cfg, st, u):
        vis = visibility.compute_visibility(st, u)
        pts = raster.gather_point_samples(cfg, st, vis.emitted, pw)
        vox = raster.gather_voxel_samples(cfg, st, vis.emitted, vw)
        return (pts.x[:512].sum().astype(jnp.int32) + pts.rgba[:512].sum()
                + vox.x[:512].sum().astype(jnp.int32) + vox.rgba[:512].sum()
                ).astype(jnp.int32)

    def sorted_cols(cfg, st, u):
        """everything rasterize_tiles does before the pallas call"""
        vis = visibility.compute_visibility(st, u)
        pts = raster.gather_point_samples(cfg, st, vis.emitted, pw)
        vox = raster.gather_voxel_samples(cfg, st, vis.emitted, vw)
        npad = n_tiles * tile
        pixs, dbits, colors = [], [], []
        for s in (pts, vox):
            x, y, d, ok = raster._project(s, u)
            db = jax.lax.bitcast_convert_type(d, jnp.int32)
            col = raster._sample_colors(s, u)
            for pix, use in raster._splat_pixels(x, y, ok, u, WIDTH, HEIGHT,
                                                 cfg.max_point_size):
                pixs.append(jnp.where(use, pix, npad))
                dbits.append(jnp.where(use, db, jnp.int32(C.DEPTH_INF_BITS)))
                colors.append(col)
        pix = jnp.concatenate(pixs)
        db = jnp.concatenate(dbits)
        col = jnp.concatenate(colors)
        ckey = jax.lax.bitcast_convert_type(col ^ jnp.uint32(0x80000000), jnp.int32)
        spix, sdb, _, scol = jax.lax.sort((pix, db, ckey, col), num_keys=3,
                                          is_stable=False)
        return spix, sdb, scol

    @functools.partial(jax.jit, static_argnums=0)
    def p_project(cfg, st, u):
        # projection + concat only (no sort): sort ablated by summing inputs
        vis = visibility.compute_visibility(st, u)
        pts = raster.gather_point_samples(cfg, st, vis.emitted, pw)
        vox = raster.gather_voxel_samples(cfg, st, vis.emitted, vw)
        acc = jnp.int32(0)
        for s in (pts, vox):
            x, y, d, ok = raster._project(s, u)
            col = raster._sample_colors(s, u)
            for pix, use in raster._splat_pixels(x, y, ok, u, WIDTH, HEIGHT,
                                                 cfg.max_point_size):
                acc = acc + pix[:512].sum() + col[:512].sum().astype(jnp.int32) \
                    + use[:512].sum()
        return acc + d[:512].sum().astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=0)
    def p_sort(cfg, st, u):
        spix, sdb, scol = sorted_cols(cfg, st, u)
        return spix[:512].sum() + sdb[:512].sum() + scol[:512].sum().astype(jnp.int32)

    @functools.partial(jax.jit, static_argnums=0)
    def p_frame(cfg, st, u):
        img, _ = __import__("simlod_tpu.render.render",
                            fromlist=["render_frame_impl"]).render_frame_impl(
            cfg, st, WIDTH, HEIGHT, u, pw, vw)
        return img[::64, ::64].sum().astype(jnp.int32)

    progs = [("visibility", p_vis), ("+sample gather", p_gather),
             ("+project/splat", p_project), ("+pixel sort", p_sort),
             ("full frame", p_frame)]
    times = {}
    for name, fn in progs:
        out = fn(cfg, state, u)
        _ = int(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            _ = int(fn(cfg, state, u))
            best = min(best, time.perf_counter() - t0)
        times[name] = best
        print(f"{name:18s} {best*1e3:8.1f} ms", file=sys.stderr, flush=True)

    prev = 0.0
    for name, _ in progs:
        print(f"{name:18s} total={times[name]*1e3:8.1f} ms  "
              f"delta={(times[name]-prev)*1e3:8.1f} ms", flush=True)
        prev = times[name]
    return 0


if __name__ == "__main__":
    sys.exit(main())
