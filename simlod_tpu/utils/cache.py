"""Persistent XLA compilation cache setup.

TPU compiles of the fused step take minutes through this environment's remote-compile
tunnel; the on-disk cache makes every process after the first start instantly (the
analogue of the reference's NVRTC-compile-once-then-cubin-cache behavior, C12).
Call enable() before the first jit execution (bench.py, app.py, and Engine do).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/simlod_tpu_xla")


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
