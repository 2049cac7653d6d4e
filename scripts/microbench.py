"""Microbenchmarks for the TPU primitives the engine design depends on.

Run on a real TPU chip to validate design decisions:
  - scatter-add with duplicate indices (HQS color accumulation, per-leaf counting)
  - scatter-min with duplicate indices (depth buffer)
  - lax.sort with multiple int32 keys + payload (morton sort, voxel-store compaction)
  - segment-sum alternatives (sorted-adjacency vs scatter)
  - gather throughput (tree descent)

Usage: python scripts/microbench.py [sizes...]
"""
import time
import json
import functools

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    results = {}

    N = 16 * 1024 * 1024       # samples (points per frame / step)
    M = 2 * 1024 * 1024        # framebuffer pixels (1080p ~ 2M)
    NODES = 1 << 20

    idx = jax.random.randint(key, (N,), 0, M, dtype=jnp.int32)
    vals = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    fvals = jax.random.uniform(key, (N,), dtype=jnp.float32)
    nidx = jax.random.randint(key, (N,), 0, NODES, dtype=jnp.int32)

    @jax.jit
    def scatter_add(idx, vals):
        return jnp.zeros(M, jnp.int32).at[idx].add(vals)

    @jax.jit
    def scatter_min(idx, vals):
        return jnp.full(M, 2**30, jnp.int32).at[idx].min(vals)

    @jax.jit
    def scatter_add_nodes(nidx):
        return jnp.zeros(NODES, jnp.int32).at[nidx].add(1)

    @jax.jit
    def sort1(vals):
        return jnp.sort(vals)

    @jax.jit
    def sort3_payload(k0, k1, k2, p):
        return jax.lax.sort((k0, k1, k2, p), num_keys=3)

    @jax.jit
    def sort1_payload(k0, p):
        return jax.lax.sort((k0, p), num_keys=1)

    @jax.jit
    def gather(table, idx):
        return table[idx]

    @jax.jit
    def cumsum(v):
        return jnp.cumsum(v)

    @jax.jit
    def descend10(table, idx):
        def body(i, cur):
            return table[cur]
        return jax.lax.fori_loop(0, 10, body, idx)

    table = jax.random.randint(key, (M,), 0, M, dtype=jnp.int32)
    ntable = jax.random.randint(key, (NODES,), 0, NODES, dtype=jnp.int32)

    results["scatter_add_16M_into_2M"] = timeit(scatter_add, idx, vals)
    results["scatter_min_16M_into_2M"] = timeit(scatter_min, idx, vals)
    results["scatter_add1_16M_into_1M_nodes"] = timeit(scatter_add_nodes, nidx)
    results["sort_16M_i32"] = timeit(sort1, vals)
    results["sort_16M_3keys_payload"] = timeit(sort3_payload, vals, vals, vals, idx)
    results["sort_16M_1key_payload"] = timeit(sort1_payload, vals, idx)
    results["gather_16M_from_2M"] = timeit(gather, table, idx)
    results["gather_16M_from_1M_nodes"] = timeit(gather, ntable, nidx)
    results["descend10_16M"] = timeit(descend10, ntable, nidx)
    results["cumsum_16M"] = timeit(cumsum, vals)

    for k, v in results.items():
        print(f"{k:40s} {v*1000:10.2f} ms")
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
