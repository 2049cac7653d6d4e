"""Build script: compiles the optional native fast-decode library (fastload.c) as a
plain shared object next to simlod_tpu/native/ (loaded via ctypes; install works fine
without a compiler — the formats layer falls back to numpy)."""
import os
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        self._build_native(os.path.join("simlod_tpu", "native"))
        out_pkg = os.path.join(self.build_lib, "simlod_tpu", "native")
        if os.path.isdir(out_pkg):
            self._build_native(out_pkg)

    def _build_native(self, pkg_dir):
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "simlod_tpu", "native", "fastload.c")
        out = os.path.join(pkg_dir, "_fastload.so")
        if not os.path.exists(src) or not os.path.isdir(pkg_dir):
            return
        try:
            subprocess.run(
                ["cc", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out],
                check=True)
            print(f"built native fastload -> {out}")
        except Exception as e:  # noqa: BLE001
            print(f"native fastload skipped ({e}); numpy fallback will be used",
                  file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
