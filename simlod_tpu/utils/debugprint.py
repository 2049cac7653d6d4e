"""Device->host debug print and key/value channel — the CudaPrint analogue (C16).

The reference's CudaPrint (modules/CudaPrint/CudaPrint.cuh/.h) gives device code a
printf-like channel plus a key/value table polled asynchronously by the host. The
JAX equivalents wrapped here:

  - dprint(fmt, *args): jax.debug.print inside jitted code (ordered).
  - KVChannel: a named slot table a jitted function can write scalars into via
    kv.set("name", value) while tracing; the host reads the latest values per step
    without extra device round-trips (values ride along in the step outputs).

The reference channel is compiled out upstream (early return at CudaPrint.cuh:51);
this one is always live but zero-cost when unused.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dprint(fmt: str, *args, ordered: bool = False):
    """Print from inside jitted code (reference device printf / CudaPrint::print)."""
    jax.debug.print(fmt, *args, ordered=ordered)


class KVChannel:
    """Key/value scalar channel for jitted code (reference CudaPrint::set).

    Usage inside a traced function:
        kv = KVChannel()
        ...
        kv.set("num_split_rounds", rounds)
        state_out, kv_out = fn(...), kv.values()
    The host keeps `kv_out` (a dict of scalars) and renders/logs it.
    """

    def __init__(self):
        self._vals: dict[str, jax.Array] = {}

    def set(self, key: str, value):
        self._vals[key] = jnp.asarray(value)

    def values(self) -> dict:
        return dict(self._vals)

    @staticmethod
    def to_host(values: dict) -> dict:
        import numpy as np
        return {k: np.asarray(v).item() for k, v in values.items()}
