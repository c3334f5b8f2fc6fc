"""Build the native loader core (g++ -O3 -shared -lz), cached by mtime."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "vfi_io.cpp")
LIB = os.path.join(_DIR, "libvfi_io.so")


def build(force: bool = False) -> str:
    """Compile (if stale) and return the path to libvfi_io.so."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           SRC, "-o", LIB, "-lz"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
