"""The tile-binned Pallas rasterizer must agree with the scatter-based reference
path (render/raster.py) — same winners, same HQS averages — on both shading modes.

Runs the kernel in interpreter mode (CPU conftest); on TPU the identical kernel
compiles via Mosaic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simlod_tpu import constants as C
from simlod_tpu.config import EngineConfig, Settings, Uniforms
from simlod_tpu.render import raster, raster_tiles


def make_samples(rng, n, spread=0.8):
    x = rng.uniform(-spread, spread, n).astype(np.float32)
    y = rng.uniform(-spread, spread, n).astype(np.float32)
    z = rng.uniform(1.0, 5.0, n).astype(np.float32)
    rgba = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    valid = np.ones(n, bool)
    valid[-3:] = False
    return raster.Samples(
        x=jnp.asarray(x), y=jnp.asarray(y), z=jnp.asarray(z),
        rgba=jnp.asarray(rgba),
        node_fn=lambda: jnp.zeros(n, jnp.int32),
        level_fn=lambda: jnp.zeros(n, jnp.int32),
        valid=jnp.asarray(valid), count=jnp.int32(n - 3))


def ortho_uniforms(width, height, hqs):
    # simple perspective-ish transform: x/z, y/z with depth w = z
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 1.0
    m[1, 1] = 1.0
    m[3, 2] = 1.0
    s = Settings(use_high_quality_shading=hqs, enable_edl=False)
    return Uniforms.make(width, height, m, settings=s)


@pytest.mark.parametrize("hqs", [True, False])
def test_matches_scatter_path(hqs):
    rng = np.random.default_rng(7)
    cfg = EngineConfig()
    W, H = 160, 120
    s = make_samples(rng, 4096)
    u = ortho_uniforms(W, H, hqs)
    c_ref, d_ref = raster.rasterize(cfg, u, W, H, [s])
    c_new, d_new = raster_tiles.rasterize_tiles(cfg, u, W, H, [s],
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_new))
    cr, cn = np.asarray(c_ref), np.asarray(c_new)
    if hqs:
        # averages may differ by 1 ulp in the integer division vs float path
        for sh in (0, 8, 16):
            a = (cr >> sh) & 0xFF
            b = (cn >> sh) & 0xFF
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    else:
        np.testing.assert_array_equal(cr, cn)


@pytest.mark.parametrize("hqs", [True, False])
def test_fast_tiebreak_matches_when_no_depth_ties(hqs):
    # raster_exact_tiebreak=False demotes the color column from sort key to
    # payload; with distinct random f32 depths no (pixel, depth) ties exist,
    # so the output must be identical to the exact path
    rng = np.random.default_rng(11)
    cfg = EngineConfig(raster_exact_tiebreak=False)
    W, H = 160, 120
    s = make_samples(rng, 4096)
    u = ortho_uniforms(W, H, hqs)
    c_ref, d_ref = raster_tiles.rasterize_tiles(EngineConfig(), u, W, H, [s],
                                                interpret=True)
    c_new, d_new = raster_tiles.rasterize_tiles(cfg, u, W, H, [s],
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_new))
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_new))


def test_empty_frame():
    cfg = EngineConfig()
    W, H = 128, 64
    rng = np.random.default_rng(3)
    s = make_samples(rng, 256)
    s = s._replace(valid=jnp.zeros(256, bool), count=jnp.int32(0))
    u = ortho_uniforms(W, H, True)
    c, d = raster_tiles.rasterize_tiles(cfg, u, W, H, [s], interpret=True)
    assert (np.asarray(c) == C.BACKGROUND_COLOR).all()
    assert (np.asarray(d) == C.DEPTH_INF_BITS).all()
