"""Device math kernel vs. the host oracle (differential)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpolation_engine_tpu.core.interp import interpolate_inserts, py_str
from interpolation_engine_tpu.core.math_eval import eval_math
from interpolation_engine_tpu.ops import interp_kernel as ik
from interpolation_engine_tpu.ops import math_kernel as mak
from interpolation_engine_tpu.vm.config import VMConfig
from interpolation_engine_tpu.vm import state as vmstate

CFG = VMConfig(max_str=128, max_key=48, n_slots=16, arena_size=1024,
               pool_size=16, out_size=256)


def buf(s: str):
    data = s.encode()
    b = np.zeros(CFG.max_str, np.uint8)
    b[:len(data)] = list(data)
    return jnp.asarray(b), jnp.int32(len(data))


@jax.jit
def run(st, b, ln):
    return mak.eval_math_bytes(st, b, ln, CFG)


def device_math(inserts, expr_interpolated: str):
    st = vmstate.encode_inserts(inserts, CFG)
    b, ln = buf(expr_interpolated)
    res = run(st, b, ln)
    err = int(res.err)
    if err == ik.ERR_HOST or err == ik.ERR_CAPACITY:
        return ("host",)
    if err != ik.ERR_OK:
        return ("raise",)
    return ("ok", int(res.value))


def host_math(inserts, expr: str):
    try:
        return ("ok", eval_math(dict(inserts), expr))
    except Exception:
        return ("raise",)


CASES = [
    ({}, "1+2"),
    ({}, "7 % 3"),
    ({}, "-7 % 3"),
    ({}, "7 % -3"),
    ({}, "2 * (3 + 4)"),
    ({}, "2 * (3 + (4 - 1))"),
    ({}, "10 / 2"),
    ({}, "1/3"),                 # inexact → host (host raises; device defers)
    ({}, "max(1,2,3)"),
    ({}, "min( 5 , 2 )"),
    ({}, "round(8/2)"),
    ({}, "sign(3-5)"),
    ({}, "sign(0)"),
    ({}, "sign(4)"),
    ({}, "max(1,2) * min(3,4)"),
    ({"l": ["a", "b", "c"]}, "length(l)"),
    ({"l": ["a", "b", "c"]}, "length(l) - 2 * 4"),
    ({"l": ["a", "b", "c"]}, "length(l) % 2"),
    ({"l": [3, 1, 2]}, "max(l)"),
    ({"l": [3, 1, 2]}, "min(l) + 1"),
    ({}, "2 - -3"),
    ({}, "2*-3"),
    ({}, "-2**2"),
    ({}, "2**3**2"),
    ({}, "2**-1"),               # negative exponent → host
    ({}, "bogus(1)"),
    ({}, "1 + x"),
    ({}, "(1+2) "),
    ({}, "100 - 3 - 4 - 5"),
    ({}, "2 * 3 % 4"),
    ({}, "6 // 4"),
    ({}, "-6 // 4"),
    ({}, ""),
    ({}, "5"),
    ({}, "  5  "),
    ({}, "1,2"),
    ({}, "sign(length(l))"),     # nested fn over missing list → raise
    ({"l": []}, "length(l)"),
]


@pytest.mark.parametrize("inserts,expr", CASES)
def test_math_kernel_matches_host(inserts, expr):
    host = host_math(inserts, expr)
    dev = device_math(inserts, expr)
    if dev == ("host",):
        pytest.skip("kernel defers to host")
    assert dev == host, f"expr={expr!r}"


def test_math_kernel_fuzz():
    rng = random.Random(4242)
    n_checked = 0
    for _ in range(500):
        n_tok = rng.randint(1, 6)
        parts = []
        for _ in range(n_tok):
            parts.append(str(rng.randint(0, 30)))
            parts.append(rng.choice(["+", "-", "*", "%", "-", "+", "*"]))
        expr = " ".join(parts[:-1])
        if rng.random() < 0.4:
            expr = f"({expr}) + 1"
        if rng.random() < 0.2:
            expr = f"max({expr}, 3)"
        host = host_math({}, expr)
        dev = device_math({}, expr)
        if dev == ("host",):
            continue
        assert dev == host, expr
        n_checked += 1
    assert n_checked > 420
