"""AOT executable cache for the device engines.

The VM kernels cost minutes to tens of minutes PER PROCESS before the
first step runs (the adventure mega-kernel: ~2,300 s), and none of it is
reusable through jax's persistent compilation cache: the lowered module
bytes are nondeterministic across processes (three identical builds of
the same kernel produced three distinct cache keys; re-jitting a
deserialized ``jax.export`` blob is nondeterministic the same way), so
the hash-of-module key never repeats. This module therefore persists the
COMPILED PJRT executable itself (``jax.experimental.serialize_executable``
— the same mechanism the persistent cache uses for its values) under a
key WE derive from the inputs that determine the kernel:

* the source files that define it (any code edit invalidates),
* caller-supplied parts (program content, config, batch shape),
* jax version + platform + device kind.

Reloading is deserialize-and-load: no tracing, no lowering, no backend
compile. Best-effort by design — any failure falls back silently to an
in-process build; the cache is an optimization, never a correctness
dependency. Writes are atomic (tmp + rename), so concurrent processes at
worst both build.

Env: IE_TPU_KERNEL_CACHE=0 disables; IE_TPU_KERNEL_CACHE_DIR overrides
the default. The default directory is REPO-LOCAL (.ie_kernel_cache next
to the package) so warm executables ride along with a git checkout —
the home-dir cache (~/.cache/ie_tpu_kernels) does not survive container
hops, which cost round 4 its official benchmark capture (BENCH_r04.json
rc=124: the driver's cold bench timed out on the ~2,500 s mega-kernel
compile). The legacy home-dir location is still read as a fallback.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def kernel_sources() -> tuple:
    """Every .py file under vm/, ops/, and compiler/ (sorted): the kernels
    are built from the whole closure of these packages (branch builders,
    ISA constants, byte-string primitives, the lowerer feeding the plan),
    so the cache key must cover all of them — a key that misses a source
    file serves a semantically stale executable after an edit, which the
    zeros smoke-run cannot catch. Over-broad invalidation only costs a
    rebuild."""
    import glob
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = []
    for sub in ("vm", "ops", "compiler"):
        files += glob.glob(os.path.join(pkg, sub, "*.py"))
    return tuple(sorted(files))


def cache_key(source_files, parts) -> str:
    """Content hash of the kernel-defining sources + build parameters +
    the jax/jaxlib/PJRT-plugin/platform identity (the plugin can change
    codegen without a jax version bump — ADVICE r3)."""
    h = hashlib.sha256()
    for p in source_files:
        with open(p, "rb") as f:
            h.update(f.read())
    dev = jax.devices()[0]
    try:
        import jaxlib
        jaxlib_ver = jaxlib.__version__
    except Exception:  # pragma: no cover - jaxlib always ships with jax
        jaxlib_ver = ""
    try:
        platform_ver = jax.extend.backend.get_backend().platform_version
    except Exception:
        platform_ver = ""
    h.update(repr((jax.__version__, jaxlib_ver, platform_ver, dev.platform,
                   getattr(dev, "device_kind", ""))).encode())
    for part in parts:
        h.update((part if isinstance(part, str) else repr(part)).encode())
    return h.hexdigest()[:32]


def enabled() -> bool:
    return os.environ.get("IE_TPU_KERNEL_CACHE", "1") != "0"


_LEGACY_DIR = "~/.cache/ie_tpu_kernels"


def cache_dir() -> str:
    if "IE_TPU_KERNEL_CACHE_DIR" in os.environ:
        return os.path.expanduser(os.environ["IE_TPU_KERNEL_CACHE_DIR"])
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), ".ie_kernel_cache")


def _entry_path(name: str, key: str):
    """Path of an existing cache entry, or None. Checks the active dir
    first, then the legacy home-dir location (read-only fallback so
    pre-round-5 warm caches keep working)."""
    fname = f"{name}-{key}.jaxexec"
    for d in (cache_dir(), os.path.expanduser(_LEGACY_DIR)):
        p = os.path.join(d, fname)
        if os.path.exists(p):
            return p
    return None


def is_cached(name: str, key: str) -> bool:
    """True when a serialized executable exists for (name, key). Cheap —
    used by bench.py's cold-start guard to decide whether the mega-kernel
    can be reloaded in seconds or would need a multi-thousand-second
    cold compile."""
    return enabled() and _entry_path(name, key) is not None


def load_or_export(name: str, key: str, build_fn, example_args):
    """Return a ready-to-run callable for the kernel named (name, key).

    Reloads a previously serialized executable when one exists; otherwise
    calls ``build_fn()`` (returning a jax.jit-wrapped function), AOT-
    compiles it against ``example_args`` (ShapeDtypeStruct pytrees),
    writes the serialized executable, and returns the compiled function.
    The returned callable is shape-locked to ``example_args`` — callers
    memoize per shape. Input-output aliasing (donation) is whatever
    build_fn's own jit declares; it is baked into the executable.
    """
    if not enabled():
        return build_fn()
    from jax.experimental import serialize_executable as _se
    path = os.path.join(cache_dir(), f"{name}-{key}.jaxexec")
    found = _entry_path(name, key)
    if found is not None:
        try:
            with open(found, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = _se.deserialize_and_load(payload, in_tree, out_tree)
            # smoke-run on zeros: a stale executable can fail at CALL
            # time, not load time (seen: XLA:CPU AOT machine-feature
            # mismatch) — rebuild instead of crashing the engine later
            import jax.numpy as jnp
            zeros = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), example_args)
            jax.block_until_ready(loaded(*zeros))
            return loaded
        except Exception:
            pass  # stale, unreadable, or plugin mismatch: rebuild below
    fn = build_fn()
    try:
        compiled = fn.lower(*example_args).compile()
    except Exception:
        return fn  # lowering quirk (e.g. AOT-unsupported backend)
    try:
        blob = pickle.dumps(_se.serialize(compiled))
        # private dir: entries are unpickled at load time, so a writable
        # shared cache dir would be arbitrary-code-execution at deserialize
        # time — keep it 0700 (pre-existing dirs keep their mode; point
        # IE_TPU_KERNEL_CACHE_DIR only at private locations)
        os.makedirs(cache_dir(), mode=0o700, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except Exception:
        pass  # serialization is best-effort
    return compiled
