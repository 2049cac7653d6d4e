"""Final bisect of the tunneled-put collapse.

Known (earlier this round): fresh-process 16MB-piece puts ~1.1 GB/s; after the
octree build programs run once, the same puts run ~60 MB/s persistently.
Allocation pressure alone and dispatch count alone do NOT trigger it.

Questions:
  q1  does a plain big program (64M-row sort) trigger the collapse?
  q2  does deleting all device buffers + jax.clear_caches() restore put speed?
  q3  does a TINY octree build (small windows) trigger it?
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)

PIECE = 4 << 20   # 4M f32 = 16 MB
host = np.random.default_rng(0).random(PIECE * 8, np.float32)


def put_rate(tag, n_pieces=8):
    bufs = []
    t0 = time.perf_counter()
    for i in range(n_pieces):
        bufs.append(jax.device_put(host[i * PIECE:(i + 1) * PIECE]))
    for b in bufs:
        b.block_until_ready()
    dt = time.perf_counter() - t0
    mb = n_pieces * 16
    print(f"[{tag}] put {mb} MB in {dt:.2f}s = {mb/dt:.0f} MB/s", flush=True)
    del bufs
    return mb / dt


put_rate("fresh-0")
put_rate("fresh-1")

# q1: plain big program
big = jnp.arange(64 << 20, dtype=jnp.int32)[::-1]
f = jax.jit(lambda a: jnp.sort(a))
r = f(big); r.block_until_ready()
t0 = time.perf_counter()
r = f(big); r.block_until_ready()
print(f"big sort: {time.perf_counter()-t0:.2f}s", flush=True)
del big, r
put_rate("after-big-sort-0")
put_rate("after-big-sort-1")

# q3: tiny octree build
from simlod_tpu.config import EngineConfig
from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state
cfg = EngineConfig(node_capacity=1 << 12, point_capacity=1 << 18,
                   voxel_capacity=1 << 19, segment_capacity=1 << 14,
                   step_points=1 << 14, spill_capacity=1 << 14,
                   seg_select_cap=256, max_splits_per_round=64,
                   candidate_factor=21)
st = init_state(cfg, np.zeros(3, np.float32), np.ones(3, np.float32))
rng = np.random.default_rng(1)
x, y, z = (jnp.asarray(rng.random(1 << 14, np.float32)) for _ in range(3))
c = jnp.asarray(rng.integers(0, 2**31, 1 << 14).astype(np.uint32))
st = build.build_step(cfg, st, x, y, z, c, jnp.int32(1 << 14))
_ = int(st.num_nodes)
print("tiny build done, nodes:", int(st.num_nodes), flush=True)
put_rate("after-tiny-build-0")
put_rate("after-tiny-build-1")

# q2: full cleanup
del st, x, y, z, c
import gc
gc.collect()
jax.clear_caches()
put_rate("after-clear-0")
put_rate("after-clear-1")
print("done", flush=True)
