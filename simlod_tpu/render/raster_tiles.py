"""Tile-binned sort-based rasterizer — the TPU-native replacement for the
reference's 64-bit atomicMin framebuffer splats (render.cu:95-99, 487-493).

TPUs have no global atomics and XLA scatters cost ~20 ns per attempted row, so the
scatter-based path (render/raster.py) pays hundreds of ms per frame. This path
restructures rasterization around one sort and one Pallas kernel:

  1. project all samples -> (pixel, depth, color)                    [XLA, VPU]
  2. sort samples by (pixel, depth_bits, color_bits)                 [XLA, ~4 ns/row]
     After the sort each pixel's samples are one contiguous run whose FIRST row is
     the u64-atomicMin winner (min depth, then min color — the exact tiebreak of
     `(depth<<32)|rgba` in render.cu:95-99).
  3. a Pallas kernel walks the sorted stream once, gridded over framebuffer tiles
     of T pixels. Per chunk of K samples it builds a one-hot [K, T] matrix from the
     local pixel ids; "scatter" and "gather" both become MXU matmuls:
        depth_buf[T] += onehot^T @ (winner ? depth : 0)     (depth placement)
        wd[K]         = onehot   @ depth_buf                (per-sample winner depth)
        acc[T,4]     += onehot^T @ (accept ? (r,g,b,1) : 0) (HQS accumulate)
     where accept = depth < wd * 1.01 (render.cu:487). Chunks run in order (TPU
     Pallas grids are sequential), so a run's winner is always placed before any of
     its rows is accept-tested. Plain mode accumulates the winner's color halves
     instead of the HQS sums.
  4. resolve to RGBA + depth bits per tile                           [in-kernel, VPU]

Tile sample ranges come from one searchsorted over tile boundaries (the stream is
pixel-sorted); skewed tiles simply loop over more chunks — total work stays
O(samples + tiles).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import EngineConfig, Uniforms
from . import raster

TILE = 1024          # framebuffer pixels per tile (multiple of 128)
CHUNK = 1024         # samples processed per kernel inner iteration


def _make_kernel(tile: int, chunk: int):
    def _kernel(offs_ref,        # scalar prefetch: [n_tiles+1] i32 sample offsets
                mode_ref,        # scalar prefetch: [1] i32 (1 = HQS, 0 = plain)
                cols_hbm,        # [8, S] f32 in HBM: pix, depth, win, r, g, b, lo, hi
                color_out,       # [8, tile//8] u32 block (tile pixels, row-major)
                depth_out,       # [8, tile//8] i32 block
                cols_vmem,       # scratch [2, 8, chunk] f32 (double buffered)
                state_vmem,      # scratch [tile, 8] f32: col 0 depth, 1-4 acc
                sem):            # DMA semaphores [2]
        t = pl.program_id(0)
        tile_start = t * tile
        lo = offs_ref[t]
        hi = offs_ref[t + 1]
        # chunk-aligned coverage (prefix/suffix rows are masked by pixel range)
        c0 = lo // chunk
        c1 = (hi + chunk - 1) // chunk
        hqs = mode_ref[0] == 1

        state_vmem[:, :] = jnp.zeros((tile, 8), jnp.float32)

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, tile), 1)

        def dma_for(c, slot):
            return pltpu.make_async_copy(
                cols_hbm.at[:, pl.ds(c * chunk, chunk)],
                cols_vmem.at[slot], sem.at[slot])

        @pl.when(c0 < c1)
        def _():
            dma_for(c0, c0 % 2).start()

        def chunk_body(c, _):
            slot = c % 2

            @pl.when(c + 1 < c1)
            def _():
                dma_for(c + 1, (c + 1) % 2).start()

            dma_for(c, slot).wait()
            pix = cols_vmem[slot, 0, :].astype(jnp.int32) - tile_start
            depth = cols_vmem[slot, 1, :]
            win = cols_vmem[slot, 2, :]
            inb = (pix >= 0) & (pix < tile)
            oh = (pix[:, None] == col_iota).astype(jnp.float32)  # [chunk, tile]

            winb = jnp.where(inb, win, 0.0)
            # depth placement: each pixel has exactly one winner row stream-wide
            dcol = (winb * depth)[:, None]                       # [chunk, 1]
            dplace = jax.lax.dot_general(
                oh, dcol, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [tile, 1]
            new_depth = state_vmem[:, 0:1] + dplace
            state_vmem[:, 0:1] = new_depth

            # per-sample winner depth (gather as matmul)
            wd = jax.lax.dot_general(
                oh, new_depth, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, 0]        # [chunk]

            accept = inb & (depth < wd * 1.01)
            r, g, b = (cols_vmem[slot, 3, :], cols_vmem[slot, 4, :],
                       cols_vmem[slot, 5, :])
            clo, chi = cols_vmem[slot, 6, :], cols_vmem[slot, 7, :]
            one = jnp.ones_like(depth)
            am = jnp.where(hqs, accept.astype(jnp.float32), winb)
            v0 = jnp.where(hqs, r, clo)
            v1 = jnp.where(hqs, g, chi)
            v2 = jnp.where(hqs, b, 0.0)
            vals = jnp.stack([v0 * am, v1 * am, v2 * am, one * am], axis=-1)
            acc = jax.lax.dot_general(
                oh, vals, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [tile, 4]
            state_vmem[:, 1:5] = state_vmem[:, 1:5] + acc
            return 0

        jax.lax.fori_loop(c0, c1, chunk_body, 0, unroll=False)

        dbuf = state_vmem[:, 0]
        covered = dbuf > 0.0
        cnt = jnp.maximum(state_vmem[:, 4], 1.0)

        def q8(x):
            return (jnp.floor(x).astype(jnp.int32).astype(jnp.uint32)
                    & jnp.uint32(0xFF))

        hq_color = (q8(state_vmem[:, 1] / cnt)
                    | (q8(state_vmem[:, 2] / cnt) << 8)
                    | (q8(state_vmem[:, 3] / cnt) << 16)
                    | jnp.uint32(0xFF000000))
        pl_color = (state_vmem[:, 1].astype(jnp.int32).astype(jnp.uint32)
                    | (state_vmem[:, 2].astype(jnp.int32).astype(jnp.uint32)
                       << 16))
        color = jnp.where(hqs, hq_color, pl_color)
        bg = jnp.uint32(C.BACKGROUND_COLOR)
        lanes = tile // 8
        color_out[:, :] = jnp.where(covered, color, bg).reshape(8, lanes)
        inf_bits = jnp.int32(C.DEPTH_INF_BITS)
        depth_out[:, :] = jnp.where(
            covered, jax.lax.bitcast_convert_type(dbuf, jnp.int32),
            inf_bits).reshape(8, lanes)

    return _kernel


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _raster_kernel_call(cols, n_tiles: int, interpret: bool, tile: int,
                        chunk: int, offs, mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((8, tile // 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile // 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.VMEM((tile, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, depth = pl.pallas_call(
        _make_kernel(tile, chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * 8, tile // 8), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles * 8, tile // 8), jnp.int32),
        ),
        interpret=interpret,
    )(offs, mode, cols)
    return color.reshape(-1), depth.reshape(-1)


def rasterize_tiles(cfg: EngineConfig, uniforms: Uniforms, width: int, height: int,
                    sample_sets, interpret: bool = False,
                    tile: int | None = None, chunk: int | None = None):
    """Drop-in replacement for raster.rasterize: (color u32 [H*W], depth i32 [H*W])."""
    tile = tile or TILE
    chunk = chunk or CHUNK
    npx = width * height
    n_tiles = (npx + tile - 1) // tile
    npad = n_tiles * tile

    pixs, dbits, colors = [], [], []
    for s in sample_sets:
        x, y, d, ok = raster._project(s, uniforms)
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        col = raster._sample_colors(s, uniforms)
        for pix, use in raster._splat_pixels(x, y, ok, uniforms, width, height,
                                             cfg.max_point_size):
            pixs.append(jnp.where(use, pix, npad))
            dbits.append(jnp.where(use, db, jnp.int32(C.DEPTH_INF_BITS)))
            colors.append(col)
    pix = jnp.concatenate(pixs)
    db = jnp.concatenate(dbits)
    col = jnp.concatenate(colors)

    # sort by (pixel, depth bits, color bits): run start == u64 atomicMin winner.
    # color key has the sign bit flipped so i32 order matches unsigned order.
    ckey = jax.lax.bitcast_convert_type(col ^ jnp.uint32(0x80000000), jnp.int32)
    spix, sdb, _, scol = jax.lax.sort((pix, db, ckey, col), num_keys=3,
                                      is_stable=False)

    valid_row = spix < npad
    win = (spix != jnp.roll(spix, 1)).at[0].set(True) & valid_row
    # invalid rows carry +inf depth; zero it so 0-weighted matmul terms in the
    # kernel never produce 0 * inf = NaN (which would poison whole tiles)
    sdepth = jnp.where(valid_row,
                       jax.lax.bitcast_convert_type(sdb, jnp.float32), 0.0)

    S = spix.shape[0]
    Spad = ((S + chunk - 1) // chunk) * chunk
    padn = Spad - S
    f32 = lambda a: a.astype(jnp.float32)
    cols = jnp.stack([
        f32(spix), sdepth, f32(win),
        f32(scol & 0xFF), f32((scol >> 8) & 0xFF), f32((scol >> 16) & 0xFF),
        f32(scol & 0xFFFF), f32(scol >> 16),
    ], axis=0)
    if padn:
        pad = jnp.zeros((8, padn), jnp.float32)
        pad = pad.at[0, :].set(jnp.float32(npad))   # out-of-range pixel -> masked
        cols = jnp.concatenate([cols, pad], axis=1)

    # per-tile sample offsets: the stream is pixel-sorted, so tile ranges come from
    # one small binary search (n_tiles+1 probes) instead of any scatter
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile
    offs = jnp.searchsorted(spix, bounds, side="left").astype(jnp.int32)
    mode = jnp.where(uniforms.use_high_quality_shading, 1, 0).astype(
        jnp.int32).reshape(1)

    color, depth = _raster_kernel_call(cols, n_tiles, interpret, tile, chunk,
                                       offs, mode)
    return color[:npx], depth[:npx]
