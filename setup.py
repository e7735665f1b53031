"""Build hook: compile the optional native CSTPack reader into the wheel.

The native component (native/cstpack_reader.cc — mmap shard reader, libjpeg
decode pool; see native/Makefile) is a plain C shared library bound via
ctypes, not a CPython extension, so it is compiled directly with the C++
toolchain and shipped as package data at ``cstp_tpu/data/libcstpack.so``.
Build failure (missing g++/libjpeg) is non-fatal: the package installs and
falls back to the pure-Python readers (data/native_reader.py).
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


def _compile_native(out_path: str) -> bool:
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "native", "cstpack_reader.cc")
    if not os.path.exists(src):
        return False
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17", "-Wall",
           "-o", out_path, src, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return os.path.exists(out_path)
    except Exception:
        return False


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        if os.environ.get("CSTP_SKIP_NATIVE_BUILD"):
            return
        dest_dir = os.path.join(self.build_lib, "cstp_tpu", "data")
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, "libcstpack.so")
        tmp = dest + ".tmp"
        if _compile_native(tmp):
            shutil.move(tmp, dest)
            print("built native CSTPack reader -> %s" % dest)
        else:
            print("WARNING: native CSTPack reader not built "
                  "(g++/libjpeg unavailable?); pure-Python readers will be used")


setup(cmdclass={"build_py": BuildPyWithNative})
