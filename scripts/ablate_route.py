"""Sub-ablation of route() and split_loop() internals at the bench step shape.

Chained-rep timing (R iterations inside one jit; cost = (t(R)-t(1))/(R-1)) so
tunnel RTT and dispatch overhead cancel. Probes:

  r_sort     the batch-wide 2-key 4-column merge sort alone
  r_morton   quantize + encode + decode round trip alone
  r_route    full route()
  s_spill    spill gather + 4-key sort at the bench spill window
  s_casc     the cascade while_loop body cost proxy (round-1 + child rows)
"""
import functools
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("ABL_POINTS", 16_000_000))
STEP = int(os.environ.get("ABL_STEP", 2 << 20))
R = int(os.environ.get("ABL_REPS", 4))


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state
    from simlod_tpu.ops import morton

    cfg = EngineConfig(
        node_capacity=1 << 19, point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26, segment_capacity=1 << 21,
        step_points=STEP, spill_capacity=1 << 19, seg_select_cap=2048)

    xyz, rgba = synthetic.terrain(N_POINTS, seed=11)
    box_max = xyz.max(axis=0)
    B = cfg.step_points
    n_steps = (N_POINTS + B - 1) // B

    def batch(s):
        lo, hi = s * B, min((s + 1) * B, N_POINTS)
        cols = [np.zeros((B,), np.float32) for _ in range(3)]
        cc = np.zeros((B,), np.uint32)
        for a in range(3):
            cols[a][: hi - lo] = xyz[lo:hi, a]
        cc[: hi - lo] = rgba[lo:hi]
        return (jax.device_put(cols[0]), jax.device_put(cols[1]),
                jax.device_put(cols[2]), jax.device_put(cc),
                jnp.asarray(hi - lo, jnp.int32))

    state = init_state(cfg, np.zeros(3, np.float32), box_max)
    for s in range(n_steps // 2):
        x, y, z, c, n = batch(s)
        state = build.build_step(cfg, state, x, y, z, c, n)
    state = build.compact_voxels_auto(cfg, state)
    print(f"mid-build: nodes={int(state.num_nodes)}", file=sys.stderr, flush=True)
    x, y, z, c, n = batch(n_steps // 2)

    W = min(cfg.boundary_window, cfg.node_capacity)
    BW = B + W

    def chain(body):
        def run(reps, *args):
            def it(i, carry):
                out = body(*carry)
                p = jnp.asarray(i % 2, out[0].dtype)   # defeat CSE across reps
                return (out[0] + p,) + tuple(out[1:])
            carry = jax.lax.fori_loop(0, reps, it, args)
            return sum(a[::4097].sum().astype(jnp.float32) for a in carry)
        return jax.jit(run, static_argnums=0)

    mx = jnp.int32(np.iinfo(np.int32).max)

    def mk_cols(seed):
        rng = np.random.default_rng(seed)
        return tuple(jax.device_put(
            rng.integers(0, 1 << 30, BW).astype(np.int32)) for _ in range(4))

    k0, k1, k2, aux = mk_cols(0)

    def sort4(k0, k1, k2, aux):
        return jax.lax.sort((k0, k1, k2, aux), num_keys=2, is_stable=False)

    def sort4_stable(k0, k1, k2, aux):
        return jax.lax.sort((k0, k1, k2, aux), num_keys=2, is_stable=True)

    def sort2(k0, k1, k2, aux):
        o0, o1 = jax.lax.sort((k0, k1), num_keys=2, is_stable=False)
        return o0, o1, k2, aux

    def sort1p3(k0, k1, k2, aux):
        return jax.lax.sort((k0, k1, k2, aux), num_keys=1, is_stable=False)

    xs = jax.device_put(np.random.default_rng(1).random(BW).astype(np.float32))
    ys = jax.device_put(np.random.default_rng(2).random(BW).astype(np.float32))
    zs = jax.device_put(np.random.default_rng(3).random(BW).astype(np.float32))

    def morton_rt(xc, yc, zc, aux):
        qx, qy, qz = morton.quantize_cols(xc, yc, zc, state.box_min,
                                          state.cube_size)
        w0, w1, w2 = morton.encode(qx, qy, qz)
        dx_, dy_, dz_ = morton.decode(w0, w1, w2)
        return (w0 + dx_).astype(jnp.float32), yc, zc, aux

    def route_full(xc, yc, zc, cc):
        # inputs are B-length (the real step shape); route outputs are
        # BW+W-long, so slice back to B for a shape-stable chained carry
        # (the full-length carry made this probe always FAIL — ADVICE r4)
        st, w = build.route(cfg, state, xc, yc, zc,
                            jax.lax.bitcast_convert_type(cc, jnp.uint32),
                            jnp.int32(B))
        return w.w0[:B].astype(jnp.float32), w.qx[:B].astype(jnp.float32), \
            w.leaf[:B].astype(jnp.float32), cc

    probes = [
        ("sort 2key+2payload (BW)", sort4, (k0, k1, k2, aux)),
        ("sort 2key+2payload stable", sort4_stable, (k0, k1, k2, aux)),
        ("sort 2key only (BW)", sort2, (k0, k1, k2, aux)),
        ("sort 1key+3payload (BW)", sort1p3, (k0, k1, k2, aux)),
        ("morton q+enc+dec (BW)", morton_rt, (xs, ys, zs, aux)),
        ("route() full", route_full,
         (xs[:B], ys[:B], zs[:B], jax.lax.bitcast_convert_type(
             jax.device_put(np.zeros(B, np.uint32)), jnp.int32))),
    ]
    for name, body, args in probes:
        try:
            f = chain(body)
            _ = float(f(1, *args))
            t0 = time.perf_counter(); _ = float(f(1, *args))
            t1 = time.perf_counter() - t0
            _ = float(f(R, *args))
            t0 = time.perf_counter(); _ = float(f(R, *args))
            tR = time.perf_counter() - t0
            per = (tR - t1) / (R - 1) * 1e3
            print(f"{name:28s} {per:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {type(e).__name__}: {e}"[:300], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
