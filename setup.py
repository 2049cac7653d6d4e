"""Build script: compiles the optional native libraries (fastload.c point-record
decoder and laszip_codec.c LAZ codec) as plain shared objects next to
simlod_tpu/native/ (loaded via ctypes; install works fine without a compiler —
the formats layer falls back to numpy / raises for LAZ)."""
import os
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py

NATIVE_LIBS = [("fastload.c", "_fastload.so"), ("laszip_codec.c", "_laszip.so")]


class BuildWithNative(build_py):
    def run(self):
        super().run()
        self._build_native(os.path.join("simlod_tpu", "native"))
        out_pkg = os.path.join(self.build_lib, "simlod_tpu", "native")
        if os.path.isdir(out_pkg):
            self._build_native(out_pkg)

    def _build_native(self, pkg_dir):
        src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "simlod_tpu", "native")
        if not os.path.isdir(pkg_dir):
            return
        for src_name, out_name in NATIVE_LIBS:
            src = os.path.join(src_dir, src_name)
            out = os.path.join(pkg_dir, out_name)
            if not os.path.exists(src):
                continue
            try:
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", src, "-o", out], check=True)
                print(f"built native {src_name} -> {out}")
            except Exception as e:  # noqa: BLE001
                print(f"native {src_name} skipped ({e}); fallback will be used",
                      file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
