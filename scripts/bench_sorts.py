"""Measure lax.sort / scan / gather costs on real TPU, tunnel-RTT-proof.

Each op runs R times CHAINED inside one jit program (output feeds the next
iteration), so per-op cost = (t(R) - t(1)) / (R - 1) — dispatch and readback
overhead (~30 ms through the axon tunnel) cancels out.
"""
import sys
import time

import numpy as np

R = 8
N = 2 << 20


def main():
    import jax
    import jax.numpy as jnp
    from simlod_tpu.utils import cache as _cache
    _cache.enable()
    from simlod_tpu.ops.fastops import gather1d

    rng = np.random.default_rng(0)
    key = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32))
    key2 = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32))
    pay = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32))

    def chain(body):
        def run(reps, k, k2, p):
            def it(i, carry):
                k, k2, p = carry
                k, k2, p = body(k, k2, p)
                # perturb so iterations can't be CSE'd
                return k ^ (i + 1), k2, p
            k, k2, p = jax.lax.fori_loop(0, reps, it, (k, k2, p))
            return k[::999].sum() + k2[::999].sum() + p[::999].sum()
        return jax.jit(run, static_argnums=0)

    def sort0(k, k2, p):
        return jax.lax.sort((k,))[0], k2, p

    def sort1(k, k2, p):
        k, p = jax.lax.sort((k, p), num_keys=1)
        return k, k2, p

    def sort1s(k, k2, p):
        k, p = jax.lax.sort((k, p), num_keys=1, is_stable=True)
        return k, k2, p

    def sort2k2p(k, k2, p):
        k, k2, p, _ = jax.lax.sort((k, k2, p, k), num_keys=2)
        return k, k2, p

    # pixel-sort shape study (render/raster_tiles.py:271): is the 3rd column's
    # cost in the comparator (keys) or the data movement (operands)?
    def sort3k0p(k, k2, p):          # current: (pix, depth, colorkey) all keys
        k, k2, p = jax.lax.sort((k, k2, p), num_keys=3)
        return k, k2, p

    def sort2k1p(k, k2, p):          # color demoted to payload (tie order free)
        k, k2, p = jax.lax.sort((k, k2, p), num_keys=2)
        return k, k2, p

    def sort2k0p(k, k2, p):          # color dropped from the sort entirely
        k, k2 = jax.lax.sort((k, k2), num_keys=2)
        return k, k2, p

    def sort1k4p(k, k2, p):
        k, k2, p, a, b = jax.lax.sort((k, k2, p, k, p), num_keys=1)
        return k, k2 ^ a, p ^ b

    def csum(k, k2, p):
        return jnp.cumsum(k), k2, p

    def gath(k, k2, p):
        idx = jnp.abs(k) % N
        return gather1d(p, idx), k2, p

    def packrow(k, k2, p):
        idx = jnp.abs(k) % N
        tab = jnp.stack([p, k2, p, k2], axis=-1)
        rows = tab[idx]
        return rows[:, 0] ^ rows[:, 1], k2, rows[:, 2] ^ rows[:, 3]

    def scatter_drop(k, k2, p):
        idx = jnp.abs(k) % (2 * N)
        out = jnp.zeros((N,), jnp.int32).at[idx].add(p, mode="drop")
        return out, k2, p

    ops = [("sort 1key 0pay", sort0), ("sort 1key 1pay", sort1),
           ("sort 1key 1pay stable", sort1s), ("sort 2key 2pay", sort2k2p),
           ("sort 3key 0pay (pixel sort)", sort3k0p),
           ("sort 2key 1pay (color=pay)", sort2k1p),
           ("sort 2key 0pay (no color)", sort2k0p),
           ("sort 1key 4pay", sort1k4p), ("cumsum", csum),
           ("gather1d", gath), ("packed row gather x4", packrow),
           ("scatter add (half dropped)", scatter_drop)]

    for name, body in ops:
        f = chain(body)
        for reps in (1, R):
            _ = int(f(reps, key, key2, pay))  # compile
        def t(reps):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(f(reps, key, key2, pay))
                best = min(best, time.perf_counter() - t0)
            return best
        per = (t(R) - t(1)) / (R - 1)
        print(f"{name:30s} {per*1e3:8.2f} ms  ({per/N*1e9:5.2f} ns/row)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
