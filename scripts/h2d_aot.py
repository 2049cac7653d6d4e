"""Does AOT-compiling the build programs (no execution) trigger the put
collapse? And is it the donation that triggers it on execution?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)

PIECE = 4 << 20
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

# donated trivial program: is donation alone the trigger?
f_don = jax.jit(lambda a: a + 1, donate_argnums=0)
buf = jax.device_put(np.zeros(1024, np.float32))
buf = f_don(buf)
buf.block_until_ready()
del buf
put_rate("after-donated-trivial-0")
put_rate("after-donated-trivial-1")

# AOT-compile the tiny build WITHOUT executing
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
t0 = time.perf_counter()
compiled = build.build_step.lower(cfg, st, x, y, z, c,
                                  jnp.int32(1 << 14)).compile()
print(f"AOT compile done in {time.perf_counter()-t0:.1f}s", flush=True)
put_rate("after-aot-compile-0")
put_rate("after-aot-compile-1")

# now EXECUTE the compiled build
st2 = compiled(st, x, y, z, c, jnp.int32(1 << 14))
_ = int(st2.num_nodes)
print("exec done, nodes:", int(st2.num_nodes), flush=True)
put_rate("after-exec-0")
put_rate("after-exec-1")
print("done", flush=True)
