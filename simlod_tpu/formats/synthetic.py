"""Synthetic point-cloud generation for tests and benchmarks.

The reference benchmarks against the Morro Bay / San Simeon lidar scans (README.md:
131-137), which are not redistributable here. This module generates clouds with the
same structural character — a 2.5D terrain surface with buildings/vegetation-like
clutter and scan-line spatial locality — so octree depth, split cascades, and voxel
occupancy behave like real lidar.
"""
from __future__ import annotations

import numpy as np


def terrain(n: int, seed: int = 0, extent: float = 1000.0, z_scale: float = 120.0,
            scan_order: bool = True):
    """Generate a lidar-like terrain cloud -> (xyz f32 [n,3], rgba u32 [n]).

    Multi-octave sine terrain + gaussian clutter; points are emitted in scan-line
    order (like real LAS files) unless scan_order=False (uniform shuffle).
    """
    rng = np.random.default_rng(seed)
    if scan_order:
        # boustrophedon scan lines with jitter: strong spatial locality like real scans
        lines = max(1, int(np.sqrt(n / 4)))
        per = n // lines + 1
        ys = np.repeat(np.linspace(0, 1, lines), per)[:n]
        xs = np.tile(np.linspace(0, 1, per), lines)[:n]
        flip = (np.repeat(np.arange(lines), per)[:n] % 2) == 1
        xs = np.where(flip, 1.0 - xs, xs)
        xs = np.clip(xs + rng.normal(0, 0.3 / per, n), 0, 1)
        ys = np.clip(ys + rng.normal(0, 0.3 / lines, n), 0, 1)
    else:
        xs = rng.random(n)
        ys = rng.random(n)

    def height(u, v):
        h = np.zeros_like(u)
        for freq, amp in ((2.1, 0.5), (5.3, 0.25), (11.7, 0.12), (23.9, 0.06)):
            h += amp * np.sin(freq * u * 2 * np.pi + freq) \
                * np.cos(freq * v * 2 * np.pi + 2 * freq)
        return h

    z = height(xs, ys)
    # clutter clusters (trees/buildings): lift ~8% of points above ground
    m = n // 12
    idx = rng.integers(0, n, m)
    z[idx] += rng.gamma(2.0, 0.03, m)
    z = (z - z.min()) / (np.ptp(z) + 1e-9)

    xyz = np.stack([xs * extent, ys * extent, z * z_scale], -1).astype(np.float32)

    t = z.astype(np.float32)
    r = (46 + 180 * t).astype(np.uint32)
    g = (82 + 120 * t).astype(np.uint32)
    b = (140 - 90 * t).astype(np.uint32)
    rgba = (r | (g << 8) | (b << 16) | np.uint32(255) << 24).astype(np.uint32)
    return xyz, rgba


def cloud_bounds(xyz: np.ndarray):
    return xyz.min(axis=0), xyz.max(axis=0)
