"""Sharded-step scaling measurement on the virtual CPU mesh.

Prints ONE JSON line with WEAK-scaling step times of the sharded build step:
per-chip batch held constant, total batch = n * B_chip. Real multi-chip
hardware is not available in this environment (SURVEY.md §2 distributed row;
one TPU chip behind a tunnel), so this measures the scaling SHAPE on the
8-device CPU mesh the tests use. All virtual devices share the host cores, so
wall time tracks TOTAL work; the per-chip cost wall/n should therefore stay
~constant as devices are added — growth would mean per-chip work depends on
device count (the round-2 replication bug this guards against).

Usage: python scripts/shard_scaling.py   (forces JAX_PLATFORMS=cpu itself)
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from simlod_tpu.config import EngineConfig, Uniforms, Settings
    from simlod_tpu.parallel import shard

    B_CHIP = 1 << 15

    def make_cfg(B):  # step_points is the GLOBAL batch width (B_CHIP rows/chip)
        return EngineConfig(
            node_capacity=1 << 12, point_capacity=1 << 20,
            voxel_capacity=1 << 20, segment_capacity=1 << 14, step_points=B,
            spill_capacity=1 << 14, max_splits_per_round=64,
            seg_select_cap=1 << 10, cand_multi_rows=1 << 13,
            max_points_per_node=4096, max_render_points=1 << 16,
            max_render_voxels=1 << 16)
    rng = np.random.default_rng(5)
    u = Uniforms.make(128, 96, np.eye(4, dtype=np.float32),
                      settings=Settings())

    devs = jax.devices()
    results = {}
    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        B = B_CHIP * n            # weak scaling: per-chip rows constant
        cfg = make_cfg(B)
        xyz = rng.random((B, 3), dtype=np.float32)
        rgba = rng.integers(0, 2**32, B, dtype=np.uint64).astype(np.uint32)
        mesh = Mesh(np.asarray(devs[:n]), (shard.AXIS,))
        sh = NamedSharding(mesh, P(shard.AXIS))
        step = shard.build_sharded_step(cfg, mesh, 128, 96, slot_factor=2)
        cols = [jax.device_put(np.ascontiguousarray(xyz[:, a]), sh)
                for a in range(3)]
        cc = jax.device_put(rgba, sh)
        state = shard.init_sharded_state(cfg, mesh, np.zeros(3, np.float32),
                                         np.ones(3, np.float32))
        # warm (compile); the step DONATES its state, so re-init for timing
        s1, img, _d, counts = step(state, *cols, cc, jnp.int32(B), u, False)
        jax.block_until_ready(s1.num_nodes)
        st = shard.init_sharded_state(cfg, mesh, np.zeros(3, np.float32),
                                      np.ones(3, np.float32))
        jax.block_until_ready(st.num_nodes)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            st, img, counts = step(st, *cols, cc, jnp.int32(B), u, False)
        jax.block_until_ready(st.num_nodes)
        wall = (time.perf_counter() - t0) / reps * 1e3
        results[f"step_ms_n{n}"] = round(wall, 1)
        results[f"perchip_ms_n{n}"] = round(wall / n, 1)
    base = results.get("perchip_ms_n1")
    top = results.get("perchip_ms_n8") or results.get("perchip_ms_n4")
    print(json.dumps({
        "metric": "sharded step weak-scaling per-chip cost ratio n8/n1 "
                  "(8-dev CPU mesh; ~1.0 = per-chip work is device-count "
                  "independent)",
        "value": round(top / base, 2) if base and top else None,
        "unit": "x",
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
