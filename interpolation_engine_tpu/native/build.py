"""Build the native extensions with the system toolchain (no pip).

Compiles ``json5c.cpp`` into a CPython extension next to this file. Invoked
lazily by importers (interpolation_engine_tpu.json5 prefers the native
parser when present) or manually:

    python -m interpolation_engine_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def so_path(name: str) -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(HERE, name + suffix)


def build_json5c(verbose: bool = False) -> str:
    """Compile json5c.cpp; returns the .so path (cached by mtime)."""
    src = os.path.join(HERE, "json5c.cpp")
    out = so_path("json5c")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", src, "-o", out,
    ]
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(
            f"native build failed:\n{result.stderr[-2000:]}")
    if verbose:
        print(f"built {out}")
    return out


def load_json5c():
    """Import the native parser, building it if necessary. Returns the
    module or None when the toolchain is unavailable."""
    try:
        build_json5c()
    except (RuntimeError, FileNotFoundError, OSError):
        return None
    if HERE not in sys.path:
        sys.path.insert(0, HERE)
    try:
        import json5c  # type: ignore
        return json5c
    except ImportError:
        return None


if __name__ == "__main__":
    build_json5c(verbose=True)
