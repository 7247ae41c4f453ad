"""Wheel build hook: ship the native host runtime inside the package.

The C++ host runtime (native/host_runtime.cpp) is optional — every entry
point has a numpy fallback (utils/native.py) — but wheels should carry it.
This hook copies the sources into ``phyngsc_tpu/_native/`` in the build tree
and best-effort compiles ``libphyngsc_host.so`` there (portable flags, no
-march=native; an installed copy can rebuild with ``make -C _native`` for
host-tuned codegen). Build failures are non-fatal: the wheel still works on
the numpy fallbacks, and utils/native.py can compile the shipped sources
into a user cache dir on first import.
"""

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


PORTABLE_FLAGS = ["-O3", "-fPIC", "-fopenmp", "-std=c++17", "-shared"]


class build_py_with_native(build_py):
    def run(self):
        super().run()
        root = Path(__file__).parent
        src = root / "native"
        dst = Path(self.build_lib) / "phyngsc_tpu" / "_native"
        if not (src / "host_runtime.cpp").exists():
            return
        dst.mkdir(parents=True, exist_ok=True)
        for name in ("host_runtime.cpp", "Makefile"):
            shutil.copy2(src / name, dst / name)
        cxx = shutil.which("g++") or shutil.which("c++")
        if cxx is None:
            return
        try:
            subprocess.run(
                [cxx, *PORTABLE_FLAGS, str(dst / "host_runtime.cpp"),
                 "-o", str(dst / "libphyngsc_host.so")],
                check=True, capture_output=True, timeout=300,
            )
        except (subprocess.SubprocessError, OSError):
            pass  # numpy fallbacks / on-demand rebuild cover this


setup(cmdclass={"build_py": build_py_with_native})
