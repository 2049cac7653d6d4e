"""Tile-binned sort-based rasterizer — the TPU-native replacement for the
reference's 64-bit atomicMin framebuffer splats (render.cu:95-99, 487-493).

TPUs have no global atomics and XLA scatters cost ~8 ns per attempted row, so the
scatter-based path (render/raster.py) pays hundreds of ms per frame. This path
restructures rasterization around one sort, a thin XLA prepass, and one Pallas kernel:

  1. project all samples -> (pixel, depth, color)                    [XLA, VPU]
  2. sort samples by (pixel, depth_bits, color_key)                  [XLA, ~1 ns/row/col]
     After the sort each pixel's samples are one contiguous run whose FIRST row is
     the u64-atomicMin winner (min depth, then min color — the exact tiebreak of
     `(depth<<32)|rgba` in render.cu:95-99).
  3. XLA prepass: the winner flag is a run-start compare; the winner DEPTH is
     carried to every row of its run by one take-last scan; the HQS accept test
     (depth < wd * 1.01, render.cu:487) and the mode select happen here on the VPU.
     The RESULT is packed into the sample stream itself: the winner and contribute
     bits ride the pixel word's high bits, so the kernel input is just FOUR i32
     columns per sample — (flags|pixel, depth_bits, color, pad), 16 B/sample (the
     previous 16-bf16-column layout moved 32 B/sample and needed a separate
     premultiply pass).
  4. a Pallas kernel walks the packed stream once, gridded over framebuffer tiles
     of T pixels. Per chunk of K samples it unpacks pixel/flags, masks rows whose
     tile id is not this tile (shared edge chunks, sort padding), extracts the
     depth/color BYTES on the VPU (exact in bf16: all <= 255), builds a one-hot
     [128, K] bf16 matrix over the factored local pixel id, and performs ONE
     MXU matmul per chunk:
        state[128, H*16] += onehot @ values^T     (bf16 x bf16 -> f32)
     Chunks run in order but carry no sequential dependency (winners were resolved
     in the prepass), so the whole kernel is a pure binned accumulation.
     (An int8 x int8 -> int32 variant was measured SLOWER — 22.7 ms vs 12.8 at
     the 16M bench frame — the i32->i8 pack relayouts on the VPU cost more than
     the MXU/DMA savings; bf16 stays.)
  5. resolve to RGBA + exact depth bits per tile (byte-plane reassembly) [VPU]

Tile sample ranges come from one searchsorted over tile boundaries (the stream is
pixel-sorted); skewed tiles simply loop over more chunks — total work stays
O(samples + tiles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import EngineConfig, Uniforms
from ..ops.segments import take_last
from . import raster

TILE = 512           # framebuffer pixels per tile (multiple of 128)
CHUNK = 512          # samples processed per kernel inner iteration
# (512/512 swept fastest on v5e at 4M samples/1080p — the kernel is bound by a
#  ~0.5 us/chunk fixed cost plus per-sample VPU work, so smaller tiles win until
#  boundary-chunk duplication at n_tiles ~ 8k overtakes; scripts/raster_tpu_check.py)
NCI = 4              # i32 input columns per sample: flags|pixel, depth bits,
                     # color, zero pad (Mosaic DMA slices align sublanes to 4)
NC = 8               # bf16 value rows per sample, shared by both shading modes
                     # via mode-selected weights (HQS: rgb*am + count + winner
                     # depth bytes; plain: winner color bytes + winner depth
                     # bytes) — half the VPU/matmul width of carrying both
                     # modes' rows side by side
NBUF = 4             # chunk DMA pipeline depth
# flag bits riding the pixel word (pixel ids stay below 2^28: a 33M-pixel
# framebuffer overflows the tile-id limit long before this)
WIN_BIT = 28         # this row is its pixel's u64-atomicMin winner
AM_BIT = 29          # this row contributes color (mode already resolved: HQS
                     # accept, or == winner in plain mode)
PIX_MASK = (1 << WIN_BIT) - 1


def _make_kernel(tile: int, chunk: int):
    H = tile // 128   # address factor groups (local pixel = hi * 128 + lo)

    def _kernel(offs_ref,        # scalar prefetch: [n_tiles+1] i32 sample offsets
                mode_ref,        # scalar prefetch: [1] i32 (1 = HQS, 0 = plain)
                cols_hbm,        # [S//chunk, NCI, chunk] i32 packed columns
                color_out,       # [8, tile//8] u32 block (tile pixels, row-major)
                depth_out,       # [8, tile//8] i32 block
                cols_vmem,       # scratch [NBUF, NCI, chunk] i32 ring buffer
                state_vmem,      # scratch [128, H*NC] i32 accumulators
                sem):            # DMA semaphores [NBUF]
        t = pl.program_id(0)
        lo = offs_ref[t]
        hi = offs_ref[t + 1]
        # chunk-aligned coverage (prefix/suffix rows are masked by tile id)
        c0 = lo // chunk
        c1 = (hi + chunk - 1) // chunk

        state_vmem[:, :] = jnp.zeros((128, H * NC), jnp.float32)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 0)

        # one contiguous chunk-block DMA per iteration, pipelined NBUF deep
        def dma_for(c, slot):
            return pltpu.make_async_copy(
                cols_hbm.at[c], cols_vmem.at[slot], sem.at[slot])

        for k in range(NBUF - 1):
            @pl.when(c0 + k < c1)
            def _():
                dma_for(c0 + k, (c0 + k) % NBUF).start()

        def chunk_body(c, _):
            slot = c % NBUF

            @pl.when(c + (NBUF - 1) < c1)
            def _():
                dma_for(c + (NBUF - 1), (c + (NBUF - 1)) % NBUF).start()

            dma_for(c, slot).wait()
            vals = cols_vmem[slot]                                # [NCI, chunk]
            f0 = vals[0]
            pix = f0 & PIX_MASK
            lpix = pix - t * tile
            mine = (lpix >= 0) & (lpix < tile)
            win = mine & (((f0 >> WIN_BIT) & 1) == 1)
            am = mine & (((f0 >> AM_BIT) & 1) == 1)
            db = vals[1]
            col = vals[2]

            # factored local pixel id: the one-hot covers ONLY the 128 lo
            # values; the hi factor moves into the VALUES (each value row is
            # replicated H-fold, masked by its hi group), so ONE
            # [128,chunk] x [H*NC,chunk] matmul accumulates the whole tile into
            # state[lo, hi*NC + row]. Rows of other tiles get lo == -1 and
            # match no one-hot row.
            lo_i = jnp.where(mine, lpix & 127, -1)
            hi_i = lpix >> 7
            oh_lo = (lo_i[None, :] == lo_iota).astype(jnp.bfloat16)  # [128, chunk]

            # mode as a bf16 VECTOR (Mosaic cannot legalize scalar bf16
            # selects — arith.select (i1, bf16, bf16) — so the mode blends
            # are arithmetic: hqv*a + plv*b). Derived from a vector COMPARE
            # (legalizes fine) so any mode value outside {0,1} degrades to
            # plain mode like the resolve phase below, instead of producing
            # negative plv weights (ADVICE r3).
            hqv = (jnp.full((chunk,), mode_ref[0], jnp.int32)
                   == 1).astype(jnp.bfloat16)
            plv = jnp.bfloat16(1) - hqv
            amf = am.astype(jnp.bfloat16)
            wf = win.astype(jnp.bfloat16)
            # mode-selected weights: color rows accumulate `am`-weighted bytes
            # in HQS, the single winner's bytes in plain; row 3 is the HQS
            # count / the plain winner's alpha byte; row 7 carries the last
            # depth byte biased +1 in plain (0..256 are all exact in bf16) so
            # it doubles as plain's coverage flag — colors can't (color_white
            # mode has alpha 0), and exactly ONE winner flags per pixel
            cw = hqv * amf + plv * wf

            def byte(v, k):  # bytes <= 255 are exact in bf16
                return ((v >> (8 * k)) & 0xFF).astype(jnp.bfloat16)

            rows = [
                byte(col, 0) * cw, byte(col, 1) * cw, byte(col, 2) * cw,
                hqv * amf + plv * byte(col, 3) * wf,
                byte(db, 0) * wf, byte(db, 1) * wf, byte(db, 2) * wf,
                (byte(db, 3) + plv) * wf,
            ]
            vals16 = jnp.stack(rows)                              # [NC, chunk]
            exp = jnp.concatenate(
                [jnp.where(hi_i[None, :] == h, vals16, jnp.bfloat16(0))
                 for h in range(H)], axis=0)                      # [H*NC, chunk]
            acc = jax.lax.dot_general(
                oh_lo, exp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # [128, H*NC]
            state_vmem[:, :] = state_vmem[:, :] + acc
            return 0

        jax.lax.fori_loop(c0, c1, chunk_body, 0, unroll=False)

        # vector-shaped mode predicate: scalar-pred selects on vector values
        # are another Mosaic legalization hazard (see chunk_body)
        hqs = jnp.full((128,), mode_ref[0], jnp.int32) == 1
        bg = jnp.uint32(C.BACKGROUND_COLOR)
        lanes = tile // 8
        rows_per_h = 128 // lanes  # out-block rows covered by one hi group

        def q8(x):
            return (jnp.floor(x).astype(jnp.int32).astype(jnp.uint32)
                    & jnp.uint32(0xFF))

        # resolve per hi group: pixels [h*128, (h+1)*128) are out-block rows
        # [h*rows_per_h, ...) — no [128, H, NC] transpose needed
        for h in range(H):
            st = state_vmem[:, h * NC:(h + 1) * NC]               # [128, NC]

            def b8(i):  # exact byte plane -> u32 (each cell: exactly one winner)
                return st[:, i].astype(jnp.int32).astype(jnp.uint32) \
                    & jnp.uint32(0xFF)

            cnt = st[:, 3]
            # select f32 then compare: i1-valued select operands hit another
            # Mosaic legalization gap (trunci i8 -> i1)
            covered = jnp.where(hqs, cnt, st[:, 7]) > 0.0
            cntf = jnp.maximum(cnt, 1.0)
            hq_color = (q8(st[:, 0] / cntf)
                        | (q8(st[:, 1] / cntf) << 8)
                        | (q8(st[:, 2] / cntf) << 16)
                        | jnp.uint32(0xFF000000))
            pl_color = b8(0) | (b8(1) << 8) | (b8(2) << 16) | (b8(3) << 24)
            color = jnp.where(hqs, hq_color, pl_color)
            db3 = jnp.where(hqs, b8(7),
                            (st[:, 7].astype(jnp.int32) - 1).astype(jnp.uint32)
                            & jnp.uint32(0xFF))
            dbits = (b8(4) | (b8(5) << 8) | (b8(6) << 16) | (db3 << 24)) \
                .astype(jnp.int32)
            color_out[h * rows_per_h:(h + 1) * rows_per_h, :] = \
                jnp.where(covered, color, bg).reshape(rows_per_h, lanes)
            depth_out[h * rows_per_h:(h + 1) * rows_per_h, :] = \
                jnp.where(covered, dbits,
                          jnp.int32(C.DEPTH_INF_BITS)).reshape(rows_per_h, lanes)

    return _kernel


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _raster_kernel_call(cols, n_tiles: int, interpret: bool, tile: int,
                        chunk: int, offs, mode):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((8, tile // 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile // 8), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, NCI, chunk), jnp.int32),
            pltpu.VMEM((128, (tile // 128) * NC), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
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
    # the factored kernel needs lo in [0,128) and the per-hi resolve needs
    # tile//8 lanes to divide 128 (i.e. tile in {128, 256, 512, 1024})
    assert tile % 128 == 0 and tile <= 1024 and 128 % (tile // 8) == 0, tile
    npx = width * height
    n_tiles = (npx + tile - 1) // tile
    npad = n_tiles * tile
    # pixel ids share their i32 with the win/contribute flag bits
    assert npad < (1 << WIN_BIT), (width, height)

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

    # sort by (pixel, depth bits, color key): run start == u64 atomicMin winner.
    # color key has the sign bit flipped so i32 order matches unsigned order; the
    # color itself is recovered from the key (no 4th payload).
    # With raster_exact_tiebreak=False the color rides as a payload instead of a
    # 3rd key: winner depth (and all HQS output) is unchanged, only the color of
    # exact-(pixel,depth) ties becomes comparator-order-defined.
    ckey = jax.lax.bitcast_convert_type(col ^ jnp.uint32(0x80000000), jnp.int32)
    nkeys = 3 if cfg.raster_exact_tiebreak else 2
    spix, sdb, sck = jax.lax.sort((pix, db, ckey), num_keys=nkeys, is_stable=False)
    scol = jax.lax.bitcast_convert_type(sck, jnp.uint32) ^ jnp.uint32(0x80000000)

    # --- prepass: winner flag, carried winner depth, mode-resolved contribute
    # bit; both bits ride the pixel word (see module docstring step 3) ---
    valid = spix < npad
    win = (spix != jnp.roll(spix, 1)).at[0].set(True) & valid
    winm = jnp.asarray(jnp.iinfo(jnp.int32).min, jnp.int32)
    wdb = take_last(jnp.where(win, sdb, winm), sentinel=int(jnp.iinfo(jnp.int32).min))
    wd = jax.lax.bitcast_convert_type(wdb, jnp.float32)
    depth = jax.lax.bitcast_convert_type(sdb, jnp.float32)
    accept = valid & (depth < wd * jnp.float32(1.01))
    am = jnp.where(uniforms.use_high_quality_shading, accept, win)
    f0 = spix | (win.astype(jnp.int32) << WIN_BIT) | (am.astype(jnp.int32) << AM_BIT)

    # per-tile sample offsets: the stream is pixel-sorted, so tile ranges come from
    # one small binary search (n_tiles+1 probes) instead of any scatter
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile
    offs = jnp.searchsorted(spix, bounds, side="left").astype(jnp.int32)

    cols = jnp.stack([f0, sdb, jax.lax.bitcast_convert_type(scol, jnp.int32),
                      jnp.zeros_like(f0)])
    S = spix.shape[0]
    Spad = ((S + chunk - 1) // chunk) * chunk
    if Spad != S:
        # pad rows: pixel id npad (no tile claims it), flags clear
        pad = jnp.full((NCI, Spad - S), npad, jnp.int32)
        cols = jnp.concatenate([cols, pad], axis=1)
    # chunk-major layout: each kernel DMA is one contiguous (NCI, chunk) block
    cols = cols.reshape(NCI, Spad // chunk, chunk).transpose(1, 0, 2)
    mode = jnp.where(uniforms.use_high_quality_shading, 1, 0).astype(
        jnp.int32).reshape(1)

    color, depth_bits = _raster_kernel_call(cols, n_tiles, interpret, tile,
                                            chunk, offs, mode)
    return color[:npx], depth_bits[:npx]
