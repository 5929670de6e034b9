"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/multi-chip tests run
everywhere (the real TPU is exercised by bench.py / the driver instead).
Must run before any jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax before this file runs, so the
# env var alone is too late — update the live config too (backends are still
# uninitialized at collection time).
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def clean_context():
    """Reset the process-wide runtime context between tests."""
    from interpolation_engine_tpu.core.context import CTX
    from interpolation_engine_tpu.programs import loader

    old = (CTX.inserts_dir, CTX.program_dir, CTX.agent_mode,
           CTX.agent_output_path, CTX.agent_input_path)
    loader.invalidate_cache()
    yield
    (CTX.inserts_dir, CTX.program_dir, CTX.agent_mode,
     CTX.agent_output_path, CTX.agent_input_path) = old


REFERENCE_EXAMPLES = "/root/reference/examples"


# Persistent XLA compilation cache: heavy VM-step compiles survive reruns.
try:
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
