"""Hot reload — the TPU analogue of the reference's NVRTC kernel hot reload (C12).

The reference watches its .cu files and recompiles+relinks on save
(CudaModularProgram.h:181-185 + unsuck.hpp:700-730), letting you edit device code while
the app runs. Here "device code" is Python that jit-traces to XLA, so the equivalent
is: watch the package's source files, re-import the changed modules, clear jit caches,
and let the next call re-trace (XLA's compilation cache makes unchanged programs
cheap to re-jit). The on-compile callback hook is preserved.
"""
from __future__ import annotations

import importlib
import sys
import threading
from typing import Callable

from . import hostutils


class HotReloader:
    """Watches a package's modules and re-imports on change.

    Usage:
        hr = HotReloader("simlod_tpu", on_reload=[engine.rebind])
        hr.start()
    """

    def __init__(self, package: str = "simlod_tpu",
                 on_reload: list[Callable[[], None]] | None = None):
        self.package = package
        self.on_reload = list(on_reload or [])
        self._stops: list[threading.Event] = []
        self._lock = threading.Lock()

    def _modules(self):
        return [m for name, m in list(sys.modules.items())
                if name.startswith(self.package) and getattr(m, "__file__", None)]

    def start(self):
        for mod in self._modules():
            stop = hostutils.monitor_file(
                mod.__file__, lambda m=mod: self.reload(m))
            self._stops.append(stop)
        return self

    def stop(self):
        for s in self._stops:
            s.set()
        self._stops.clear()

    def reload(self, module):
        with self._lock:
            import jax
            importlib.reload(module)
            jax.clear_caches()  # drop stale traced programs; next call re-traces
            for cb in self.on_reload:
                cb()
