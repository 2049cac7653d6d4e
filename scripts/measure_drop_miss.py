"""Measure the real voxel damage of transient candidate drops at bench scale.

VERDICT r2 item 7: per-step candidate windows drop overflow candidates; drops
are recovered only if a later batch revisits the cell. This builds the bench
terrain twice — default windows vs oversized (undropped oracle) — compacts
both, and counts oracle voxel keys missing from the default run with a
device-side sorted set-diff (one scalar readback; no 400 MB key download).

Usage: [DM_POINTS=16000000] python scripts/measure_drop_miss.py
"""
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("DM_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("DM_STEP", 2 << 20))


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state

    cache_npz = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"bench_terrain_{N_POINTS}.npz")
    if os.path.exists(cache_npz):
        with np.load(cache_npz) as z:
            xyz, rgba = z["xyz"], z["rgba"]
    else:
        xyz, rgba = synthetic.terrain(N_POINTS, seed=11)
    box_max = xyz.max(axis=0)

    def build_with(cfg):
        B = cfg.step_points
        n_steps = (N_POINTS + B - 1) // B
        cols = [np.zeros((n_steps, B), np.float32) for _ in range(3)]
        cc = np.zeros((n_steps, B), np.uint32)
        nn = np.zeros((n_steps,), np.int32)
        for s in range(n_steps):
            lo, hi = s * B, min((s + 1) * B, N_POINTS)
            for a in range(3):
                cols[a][s, : hi - lo] = xyz[lo:hi, a]
            cc[s, : hi - lo] = rgba[lo:hi]
            nn[s] = hi - lo
        state = init_state(cfg, np.zeros(3, np.float32), box_max)
        state = build.build_many(
            cfg, state,
            jax.device_put(cols[0]), jax.device_put(cols[1]),
            jax.device_put(cols[2]), jax.device_put(cc), jax.device_put(nn))
        state = build.compact_voxels_auto(cfg, state)
        return state

    base = dict(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26, segment_capacity=1 << 21,
        step_points=STEP_POINTS, spill_capacity=1 << 19, seg_select_cap=2048)
    cfg_def = EngineConfig(**base)
    cfg_big = EngineConfig(**{**base, "cand_multi_rows": 1 << 21})

    t0 = time.perf_counter()
    s_def = build_with(cfg_def)
    print(f"default build: {time.perf_counter()-t0:.1f}s, "
          f"vox={int(s_def.vox_used)}, dropped="
          f"{int(s_def.num_candidates_dropped)}", file=sys.stderr)
    t0 = time.perf_counter()
    s_big = build_with(cfg_big)
    print(f"oracle build: {time.perf_counter()-t0:.1f}s, "
          f"vox={int(s_big.vox_used)}, dropped="
          f"{int(s_big.num_candidates_dropped)}", file=sys.stderr)

    cap = max(s_def.vox_k0.shape[0], s_big.vox_k0.shape[0])

    @jax.jit
    def missing_count(a0, a1, a2, na, b0, b1, b2, nb):
        """Count keys in B (oracle) not present in A, both stores compacted.

        Tag A rows 1, B rows 0; sort by (k0, k1, k2l, tag). An oracle row is
        covered iff its successor is the SAME key with tag 1 (duplicates
        within a store were removed by compaction, so runs are length <= 2)."""
        mx = jnp.iinfo(jnp.int32).max

        def cols(k0, k1, k2, n, tag, w):
            i = jnp.arange(w, dtype=jnp.int32)
            v = i < n
            return (jnp.where(v, k0[:w], mx), jnp.where(v, k1[:w], mx),
                    jnp.where(v, k2[:w], mx),
                    jnp.where(v, jnp.int32(tag), 2))

        A = cols(a0, a1, a2, na, 1, cap)
        Bc = cols(b0, b1, b2, nb, 0, cap)
        k0 = jnp.concatenate([A[0], Bc[0]])
        k1 = jnp.concatenate([A[1], Bc[1]])
        k2 = jnp.concatenate([A[2], Bc[2]])
        tg = jnp.concatenate([A[3], Bc[3]])
        k0, k1, k2, tg = jax.lax.sort((k0, k1, k2, tg), num_keys=4)
        nxt_same = (
            (k0 == jnp.roll(k0, -1)) & (k1 == jnp.roll(k1, -1))
            & (k2 == jnp.roll(k2, -1)))
        covered = nxt_same & (jnp.roll(tg, -1) == 1)
        is_b = tg == 0
        return jnp.sum((is_b & ~covered).astype(jnp.int64))

    miss = int(missing_count(
        s_def.vox_k0, s_def.vox_k1, s_def.vox_k2l, s_def.vox_used,
        s_big.vox_k0, s_big.vox_k1, s_big.vox_k2l, s_big.vox_used))
    total = int(s_big.vox_used)
    print(f"points={N_POINTS} oracle_voxels={total} missing={miss} "
          f"miss_fraction={miss/max(total,1):.5f} "
          f"dropped_candidates={int(s_def.num_candidates_dropped)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
