"""build_many (scan-pipelined ingest) must produce the same octree as step-by-step."""
import numpy as np
import jax
import jax.numpy as jnp

from simlod_tpu.octree import build
from simlod_tpu.octree.structures import init_state
from test_build import CFG, make_cloud


def test_build_many_matches_steps(rng):
    xyz, rgba = make_cloud(rng, 12000, "clusters")
    B = CFG.step_points
    K = (len(xyz) + B - 1) // B
    bx = np.zeros((K, B), np.float32)
    by = np.zeros((K, B), np.float32)
    bz = np.zeros((K, B), np.float32)
    bc = np.zeros((K, B), np.uint32)
    cnt = np.zeros((K,), np.int32)
    for i in range(K):
        c = xyz[i * B:(i + 1) * B]
        bx[i, :len(c)] = c[:, 0]
        by[i, :len(c)] = c[:, 1]
        bz[i, :len(c)] = c[:, 2]
        bc[i, :len(c)] = rgba[i * B:(i + 1) * B]
        cnt[i] = len(c)

    s1 = init_state(CFG, [0, 0, 0], [1, 1, 1])
    for i in range(K):
        s1 = build.build_step(CFG, s1, jnp.asarray(bx[i]), jnp.asarray(by[i]),
                              jnp.asarray(bz[i]), jnp.asarray(bc[i]),
                              jnp.int32(cnt[i]))
    s2 = init_state(CFG, [0, 0, 0], [1, 1, 1])
    s2 = build.build_many(CFG, s2, jnp.asarray(bx), jnp.asarray(by),
                          jnp.asarray(bz), jnp.asarray(bc), jnp.asarray(cnt))

    for name in ("num_nodes", "num_points_processed", "pool_used", "vox_used",
                 "num_segments"):
        assert int(getattr(s1, name)) == int(getattr(s2, name)), name
    np.testing.assert_array_equal(np.asarray(s1.child_base), np.asarray(s2.child_base))
    np.testing.assert_array_equal(np.asarray(s1.num_points), np.asarray(s2.num_points))
    np.testing.assert_array_equal(np.asarray(s1.pt_w0), np.asarray(s2.pt_w0))
