"""Time the FIRST vs later executions of an AOT lower().compile() executable.

The r5 file-first bench showed load_all's AOT build_many execution taking
151 s at 16M shapes where the warm jit path runs 0.64 s — this isolates
whether that is a one-time executable-load cost, how it scales with program
size, and whether a zero-count execution pays it equally.
"""
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[aot {time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()
N = int(os.environ.get("AOT_POINTS", 16_000_000))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simlod_tpu.config import EngineConfig  # noqa: E402
from simlod_tpu.octree import build  # noqa: E402
from simlod_tpu.octree.structures import init_state  # noqa: E402
from simlod_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()
B = 2 << 20
cfg = EngineConfig(
    node_capacity=1 << 19,
    point_capacity=max(N + (1 << 20), 1 << 24),
    voxel_capacity=1 << 26, segment_capacity=1 << 21,
    step_points=B, spill_capacity=1 << 20, seg_select_cap=2048,
    max_render_points=2 << 20, max_render_voxels=2 << 20)
n_steps = (N + B - 1) // B
KB = n_steps  # no bucketing: this probe controls the scan length directly
log(f"platform={jax.devices()[0].platform} N={N} KB={KB}")

state = init_state(cfg, np.zeros(3, np.float32), np.ones(3, np.float32))
st_sds = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state)
col = lambda dt: jax.ShapeDtypeStruct((KB, B), dt)
t0 = time.perf_counter()
ex = build.build_many.lower(
    cfg, st_sds, col(jnp.float32), col(jnp.float32), col(jnp.float32),
    col(jnp.uint32), jax.ShapeDtypeStruct((KB,), jnp.int32)).compile()
log(f"AOT compile {time.perf_counter()-t0:.1f}s")

rng = np.random.default_rng(0)
# zero-count batches: same program, no real work admitted
zx = jnp.zeros((KB, B), jnp.float32)
zc = jnp.zeros((KB, B), jnp.uint32)
zn = jnp.zeros((KB,), jnp.int32)
jax.block_until_ready((zx, zc, zn))

t0 = time.perf_counter()
state = ex(state, zx, zx, zx, zc, zn)
jax.block_until_ready(state.num_nodes)
log(f"exec1 (zero counts) {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
state = ex(state, zx, zx, zx, zc, zn)
jax.block_until_ready(state.num_nodes)
log(f"exec2 (zero counts) {time.perf_counter()-t0:.1f}s")

# real data third, comparable to the bench's build rep
xs = jnp.asarray(rng.random((KB, B), np.float32))
cs = jnp.asarray(rng.integers(0, 2**31, (KB, B)).astype(np.uint32))
ns = jnp.full((KB,), B, jnp.int32)
jax.block_until_ready((xs, cs, ns))
t0 = time.perf_counter()
state = ex(state, xs, xs, xs, cs, ns)
jax.block_until_ready(state.num_nodes)
log(f"exec3 (real) {time.perf_counter()-t0:.1f}s nodes={int(state.num_nodes)}")
