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


def _source_hash(path: str) -> str:
    import hashlib
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def build_json5c(verbose: bool = False) -> str:
    """Compile json5c.cpp; returns the .so path.

    Caching is by *source content hash* (a sidecar .buildhash file), not
    mtime: git checkouts give every file the same mtime, and a stale — or
    foreign — binary must never be preferred over the reviewed source.
    Binaries are gitignored; the first import builds from source.
    """
    src = os.path.join(HERE, "json5c.cpp")
    out = so_path("json5c")
    hash_file = out + ".buildhash"
    want = _source_hash(src)
    if os.path.exists(out) and os.path.exists(hash_file):
        with open(hash_file) as f:
            if f.read().strip() == want:
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
    with open(hash_file, "w") as f:
        f.write(want + "\n")
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
