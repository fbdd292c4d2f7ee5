"""Build the native engine: g++ -O3 -shared (the reference builds
libcachemanager.so the same way, cache_manager.cpp:9-10, but via a comment
line the user pastes; here it is a module: `python -m evstore_tpu.native.build`).
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "evstore_core.cpp")
OUT = os.path.join(os.path.dirname(__file__), "libevstore_core.so")


def build(force: bool = False, quiet: bool = False) -> str:
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", "-o", OUT, SRC]
    if not quiet:
        print("+ " + " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(OUT)
