"""Drill into the split loop's cost on real hardware (follow-up to ablate_step)."""
import functools
import os
import sys
import time

import numpy as np

N_POINTS = int(os.environ.get("ABL_POINTS", 16_000_000))
STEP_POINTS = int(os.environ.get("ABL_STEP", 2 << 20))


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.config import EngineConfig
    from simlod_tpu.formats import synthetic
    from simlod_tpu.octree import build
    from simlod_tpu.octree.structures import init_state
    from simlod_tpu.ops.segments import take_last, compact_mask_via_sort

    cfg = EngineConfig(
        node_capacity=1 << 19,
        point_capacity=max(N_POINTS + (1 << 20), 1 << 24),
        voxel_capacity=1 << 26,
        segment_capacity=1 << 21,
        step_points=STEP_POINTS,
        spill_capacity=STEP_POINTS,
    )

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

    def chk(st):
        return (st.num_nodes + st.vox_used + st.pool_used + st.num_segments
                + jnp.sum(st.counter) + jnp.sum(st.vox_node[:1024])
                + st.pt_w0[:1024].sum())

    J = lambda f: functools.partial(jax.jit, static_argnums=0)(f)

    def p_route(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        return st.b_key0[:64].sum() + w.leaf.sum() + w.x.sum().astype(jnp.int32)

    def p_runs(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        r = build.compute_runs(cfg, w)
        return (st.b_key0[:64].sum() + w.leaf.sum() + r.r_cnt.sum()
                + r.r_row.sum() + w.x.sum().astype(jnp.int32))

    def p_one_round(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        r = build.compute_runs(cfg, w)
        st, w, n_take = build._split_round(cfg, st, w, r)
        return chk(st) + w.leaf.sum() + n_take

    def p_two_rounds(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        r = build.compute_runs(cfg, w)
        st, w, n_take = build._split_round(cfg, st, w, r)
        r = build.compute_runs(cfg, w)
        st, w, n_take2 = build._split_round(cfg, st, w, r)
        return chk(st) + w.leaf.sum() + n_take + n_take2

    def p_loop(cfg, st, x, y, z, c, n):
        st, w = build.route(cfg, st, x, y, z, c, n)
        st, w, r = build.split_loop(cfg, st, w)
        return chk(st) + w.leaf.sum() + r.r_cnt.sum()

    def p_cond_copy(cfg, st, x, y, z, c, n):
        pred = n > 0
        st = jax.lax.cond(pred, lambda s: s, lambda s: s, st)
        st = jax.lax.cond(~pred, lambda s: s, lambda s: s, st)
        return chk(st)

    def p_take_last(cfg, st, x, y, z, c, n):
        m = jnp.where(x > 0.5, jnp.arange(x.shape[0], dtype=jnp.int32), -1)
        return take_last(m).sum()

    def p_compact(cfg, st, x, y, z, c, n):
        (a, b2), cnt = compact_mask_via_sort(x > 0.5, (y, z))
        return a.sum().astype(jnp.int32) + cnt

    progs = [("route", p_route), ("route+runs", p_runs),
             ("route+runs+1round", p_one_round),
             ("route+runs+2rounds", p_two_rounds),
             ("route+loop", p_loop),
             ("cond passthrough x2", p_cond_copy),
             ("take_last 2M", p_take_last), ("compact 2M 2pay", p_compact)]
    for name, f in progs:
        fn = J(f)
        out = fn(cfg, state, x, y, z, c, n)
        _ = int(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(fn(cfg, state, x, y, z, c, n))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:22s} {best*1e3:8.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
