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
