"""Pallas brace-scan kernel vs the jnp reference (interpreter mode on CPU)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from interpolation_engine_tpu.ops.pallas_scan import (
    brace_scan_pallas,
    brace_scan_reference,
)

MS = 128


def make_batch(strings):
    bufs = np.zeros((len(strings), MS), np.uint8)
    lens = np.zeros((len(strings),), np.int32)
    for i, s in enumerate(strings):
        data = s.encode()
        bufs[i, :len(data)] = list(data)
        lens[i] = len(data)
    return jnp.asarray(bufs), jnp.asarray(lens)


def test_curated():
    strings = [
        "plain", "{a}", "x{a}y", "{a}{b}", "{q-{i}}", r"\{a\}",
        r"{a} \{b\}", "unbalanced {", "}{", "", "{}", "a}b{c",
        r"esc\{only", "{outer{inner}rest}",
    ]
    bufs, lens = make_batch(strings)
    got = brace_scan_pallas(bufs, lens, interpret=True)
    want = brace_scan_reference(bufs, lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fuzz():
    rng = random.Random(55)
    strings = ["".join(rng.choices("ab{}\\ ", k=rng.randint(0, MS // 2)))
               for _ in range(700)]
    bufs, lens = make_batch(strings)
    got = brace_scan_pallas(bufs, lens, interpret=True)
    want = brace_scan_reference(bufs, lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_interp_differential_with_pallas_active(monkeypatch):
    """The full interpolation kernel with the Pallas brace scan ACTIVE
    (interpreter mode on CPU) matches the host oracle on every curated
    case — the kernel is a wired component, not a demo."""
    monkeypatch.setenv("IE_TPU_PALLAS", "interpret")
    import test_interp_kernel as tik
    from interpolation_engine_tpu.ops import interp_kernel as ik
    from test_interp_kernel import CASES, host_interpolate

    def device_interpolate(inserts, content):
        # direct (unjitted-outer) call: ik.interpolate keys its own jit
        # cache on the pallas mode, so the flag takes effect even when
        # test_interp_kernel's jitted wrapper was traced earlier
        from interpolation_engine_tpu.vm import state as vmstate
        st = vmstate.encode_inserts(inserts, tik.CFG)
        buf, length = tik.mk_buf(content, tik.CFG.max_str)
        orig = tik.run_kernel
        tik.run_kernel = lambda st, buf, ln: ik.interpolate(
            st, buf, ln, tik.CFG)
        try:
            return tik.device_interpolate(inserts, content)
        finally:
            tik.run_kernel = orig

    n_checked = 0
    for inserts, content in CASES:
        host = host_interpolate(inserts, content)
        dev = device_interpolate(inserts, content)
        if dev == ("host",):
            continue
        assert dev == host, f"content={content!r} inserts={inserts}"
        n_checked += 1
    assert n_checked >= 20
