"""Dump optimized HLO of build_step (bench shapes) and summarize the big fusions."""
import os
import re
import sys

N_POINTS = int(os.environ.get("TR_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("TR_STEP", 2 << 20))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=STEP_POINTS,
        spill_capacity=STEP_POINTS,
    )
    state = init_state(cfg, np.zeros(3, np.float32), np.ones(3, np.float32))
    B = cfg.step_points
    x = jnp.zeros((B,), jnp.float32)
    c = jnp.zeros((B,), jnp.uint32)
    n = jnp.asarray(B, jnp.int32)
    lowered = jax.jit(build.build_step_impl, static_argnums=0).lower(
        cfg, state, x, x, x, c, n)
    txt = lowered.compile().as_text()
    out = "/tmp/build_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
