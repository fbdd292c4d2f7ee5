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

# Sanitizer builds (the reference ships NONE despite hand-rolled semaphore
# concurrency with acknowledged races, evlfu_8.cpp:521,696 — SURVEY §5).
# ESV_SANITIZE=thread|address|undefined builds an instrumented .so beside
# the optimized one; tests/test_native.py::test_sanitizer_build exercises
# the engine under it when requested.
_SAN_FLAGS = {
    "thread": ["-fsanitize=thread", "-O1", "-g"],
    "address": ["-fsanitize=address", "-O1", "-g"],
    "undefined": ["-fsanitize=undefined", "-O1", "-g"],
}


def build(force: bool = False, quiet: bool = False,
          sanitize: str = None) -> str:
    sanitize = sanitize or os.environ.get("ESV_SANITIZE") or None
    out = OUT if not sanitize else OUT.replace(".so", f"-{sanitize}.so")
    if (not force and os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(SRC)):
        return out
    if sanitize:
        opt = _SAN_FLAGS[sanitize]
    else:
        opt = ["-O3", "-march=native"]
    cmd = (["g++"] + opt + ["-std=c++17", "-shared", "-fPIC", "-pthread",
                            "-o", out, SRC])
    if not quiet:
        print("+ " + " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(OUT)
