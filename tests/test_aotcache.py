"""vm/aotcache.py: the AOT executable cache must round-trip a compiled
function bit-exactly, fall back silently on corrupt entries, and change
keys when sources or parameters change. Runs on CPU — load_or_export is
platform-agnostic; only the engines gate it to accelerators."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolation_engine_tpu.vm import aotcache


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "kernels"
    monkeypatch.setenv("IE_TPU_KERNEL_CACHE_DIR", str(d))
    monkeypatch.delenv("IE_TPU_KERNEL_CACHE", raising=False)
    return d


def _build():
    return jax.jit(lambda x: x * 2 + 1)


ARGS = (jax.ShapeDtypeStruct((4,), jnp.int32),)
X = jnp.arange(4, dtype=jnp.int32)


def test_roundtrip_and_reload(cache_dir):
    fn1 = aotcache.load_or_export("t", "k1", _build, ARGS)
    want = np.asarray(fn1(X))
    files = list(cache_dir.glob("t-k1.jaxexec"))
    assert len(files) == 1, list(cache_dir.iterdir())
    # second load takes the deserialize path when the host can execute
    # the serialized artifact; otherwise the smoke-run rejects it and a
    # rebuild happens — either way the result is exact (XLA:CPU AOT
    # reloads can be machine-feature picky; the accelerator path is the
    # real consumer)
    fn2 = aotcache.load_or_export("t", "k1", _build, ARGS)
    assert np.array_equal(np.asarray(fn2(X)), want)


def test_corrupt_entry_falls_back_to_build(cache_dir):
    os.makedirs(cache_dir, exist_ok=True)
    (cache_dir / "t-k2.jaxexec").write_bytes(b"not a pickle")
    fn = aotcache.load_or_export("t", "k2", _build, ARGS)
    assert np.array_equal(np.asarray(fn(X)), np.asarray(X) * 2 + 1)


def test_disabled_by_env(cache_dir, monkeypatch):
    monkeypatch.setenv("IE_TPU_KERNEL_CACHE", "0")
    fn = aotcache.load_or_export("t", "k3", _build, ARGS)
    assert np.array_equal(np.asarray(fn(X)), np.asarray(X) * 2 + 1)
    assert not cache_dir.exists() or not list(cache_dir.iterdir())


def test_cache_key_sensitivity(tmp_path):
    src = tmp_path / "s.py"
    src.write_text("A = 1\n")
    k1 = aotcache.cache_key((str(src),), ("part",))
    assert k1 == aotcache.cache_key((str(src),), ("part",))
    assert k1 != aotcache.cache_key((str(src),), ("other",))
    src.write_text("A = 2\n")
    assert k1 != aotcache.cache_key((str(src),), ("part",))


def test_load_batch_dedup_key_is_type_faithful():
    """The dedup key must NOT conflate states json would merge: a tuple
    value serializes like a list but the encoder REJECTS it, and bool
    dict keys are not their string forms — conflation would silently
    accept a state the engine must reject (load parity contract)."""
    import jax
    from interpolation_engine_tpu import json5
    from interpolation_engine_tpu.compiler import compile_program
    from interpolation_engine_tpu.programs.loader import add_line_numbers
    from interpolation_engine_tpu.programs.validator import validate_program
    from interpolation_engine_tpu.vm.turbo import (TurboConfig, TurboEngine,
                                                   TurboEncodeError)
    src = """
    {
        default_state: {order_index: 1, inserts: {hist: ['a']}},
        order: [{cmd:'list_append', list:'{hist}', item:'b',
                 output_name:'hist'},
                {cmd:'print', text:'{hist}'}],
        named_tasks: {}, save_states: {},
    }
    """
    program = json5.loads(add_line_numbers(src))
    validate_program(program)
    compiled = compile_program(program)
    eng = TurboEngine(compiled,
                      TurboConfig(tile=8, width=64, out_width=96,
                                  k_steps=8))
    good = {"inserts": {"hist": ["a", 1]}, "output": "", "order_index": 1}
    bad = {"inserts": {"hist": ("a", 1)}, "output": "", "order_index": 1}
    with pytest.raises(TurboEncodeError):
        eng.load_batch([good, bad])
