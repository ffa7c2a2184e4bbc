"""Build the native runtime: g++ -O3 shared library, cached by source mtime.

Usage: python -m lzma_tpu.runtime.build [--force]
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "src", "lzma_core.cpp")
LIB = os.path.join(_DIR, "liblzma_tpu_native.so")

CXXFLAGS = [
    "-O3",
    "-std=c++17",
    "-fPIC",
    "-shared",
    "-march=native",
    "-funroll-loops",
    "-fno-exceptions",
    "-pthread",
    "-Wall",
]


def needs_build() -> bool:
    if not os.path.exists(LIB):
        return True
    return os.path.getmtime(SRC) > os.path.getmtime(LIB)


def build(force: bool = False, quiet: bool = True) -> str:
    if force or needs_build():
        cmd = ["g++", *CXXFLAGS, SRC, "-o", LIB]
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"native build failed:\n{result.stderr}")
        if not quiet:
            print(f"built {LIB}")
    return LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv, quiet=False)
