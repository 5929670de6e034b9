"""Device interpolation kernel vs. the host oracle (differential)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpolation_engine_tpu.core.interp import (
    InterpolationException,
    interpolate_inserts,
)
from interpolation_engine_tpu.ops import interp_kernel as ik
from interpolation_engine_tpu.vm.config import VMConfig
from interpolation_engine_tpu.vm import state as vmstate

CFG = VMConfig(max_str=128, max_key=48, n_slots=16, arena_size=1024,
               pool_size=16, out_size=256, max_subst=8)


def mk_buf(s: str, n: int):
    data = s.encode("utf-8")
    buf = np.zeros(n, np.uint8)
    buf[:len(data)] = list(data)
    return jnp.asarray(buf), jnp.int32(len(data))


@jax.jit
def run_kernel(st, buf, length):
    return ik.interpolate(st, buf, length, CFG)


def device_interpolate(inserts: dict, content: str):
    """Run the kernel; return ('ok', value) / ('raise', kind) / ('host',)."""
    st = vmstate.encode_inserts(inserts, CFG)
    buf, length = mk_buf(content, CFG.max_str)
    res = run_kernel(st, buf, length)
    err = int(res.err)
    if err == ik.ERR_MISSING:
        return ("raise", "interp")
    if err == ik.ERR_ASSERT:
        return ("raise", "assert")
    if err in (ik.ERR_CAPACITY, ik.ERR_HOST):
        return ("host",)
    vtype = int(res.vtype)
    if vtype == vmstate.T_INT:
        return ("ok", int(res.vint))
    if vtype == vmstate.T_STR:
        return ("ok", bytes(np.asarray(res.buf)[:int(res.length)]).decode(
            "utf-8", "replace"))
    if vtype == vmstate.T_LIST:
        base, count = int(res.pool_off), int(res.pool_len)
        elems = []
        arena = np.asarray(st.arena)
        for i in range(base, base + count):
            if int(st.pool_type[i]) == vmstate.T_INT:
                elems.append(int(st.pool_int[i]))
            else:
                eo, el = int(st.pool_off[i]), int(st.pool_len[i])
                elems.append(bytes(arena[eo:eo + el]).decode())
        return ("ok", elems)
    return ("host",)


def host_interpolate(inserts: dict, content: str):
    try:
        return ("ok", interpolate_inserts(dict(inserts), content))
    except InterpolationException:
        return ("raise", "interp")
    except AssertionError:
        return ("raise", "assert")


CASES = [
    ({}, "plain text"),
    ({"a": "A"}, "{a}"),
    ({"a": "A"}, "x{a}y"),
    ({"a": 7}, "{a}"),
    ({"a": -42}, "={a}="),
    ({"a": ["x", "y"]}, "{a}"),
    ({"i": 2, "q2": "Q"}, "{q{i}}"),
    ({"i": 2, "q-2": "Q"}, "{q-{i}}"),
    ({"name": "t", "t": "V"}, "{{name}}"),
    ({"name": "t", "t/d": "V"}, "{{name}/d}"),
    ({"a": "A"}, r"\{a\}"),
    ({"a": "A"}, r"{a} \{a\}"),
    ({"a": r"\{b\}", "b": "NO"}, "x{a}y"),
    ({}, "{missing}"),
    ({}, "pre {missing} post"),
    ({"a": "A"}, "{}"),
    ({"a": "A"}, ""),
    ({"a": "A", "b": "B"}, "{a}{b}"),
    ({"ab": "AB", "b": "b"}, "{a{b}}"),
    ({"x": "{y}", "y": "deep"}, "{x}"),
    ({"x": "{y}", "y": "deep"}, "a{x}b"),
    ({"n": 5}, "{n}{n}{n}"),
    ({"k": 3, "name": "k"}, "{{name}}"),      # int-valued indirection → raise
    ({"l": ["a"], "name": "l"}, "{{name}}"),  # list indirection → error
    ({"a{b": "V"}, "x"),                       # weird keys in store only
    ({"empty": ""}, "[{empty}]"),
    ({"s": "}{"}, "pre{s}post"),               # value introduces braces
]


@pytest.mark.parametrize("inserts,content", CASES)
def test_kernel_matches_host(inserts, content):
    host = host_interpolate(inserts, content)
    dev = device_interpolate(inserts, content)
    if dev == ("host",):
        pytest.skip("kernel defers to host for this case (allowed)")
    # normalize assert-vs-interp raise kinds must match exactly
    assert dev == host, f"content={content!r} inserts={inserts}"


def test_kernel_fuzz_matches_host():
    import random
    rng = random.Random(321)
    alphabet = "ab{}\\y "
    keys = ["a", "b", "ab", "y"]
    n_checked = 0
    n_host = 0
    for _ in range(400):
        inserts = {}
        for k in keys:
            r = rng.random()
            if r < 0.55:
                inserts[k] = "".join(rng.choices("AB{}\\c", k=rng.randint(0, 4)))
            elif r < 0.75:
                inserts[k] = rng.randint(-9, 99)
        content = "".join(rng.choices(alphabet, k=rng.randint(0, 12)))
        host = host_interpolate(inserts, content)
        dev = device_interpolate(inserts, content)
        if dev == ("host",):
            n_host += 1
            continue
        assert dev == host, f"content={content!r} inserts={inserts}"
        n_checked += 1
    # the device path must handle the overwhelming majority natively
    assert n_checked > 300, (n_checked, n_host)


def test_kernel_vmapped_batch():
    st = vmstate.encode_inserts({"a": "A", "n": 7}, CFG)
    batch = jax.tree.map(lambda x: jnp.stack([x] * 4), st)
    contents = ["{a}", "x{n}", "{missing}", "plain"]
    bufs = jnp.stack([mk_buf(c, CFG.max_str)[0] for c in contents])
    lens = jnp.stack([mk_buf(c, CFG.max_str)[1] for c in contents])

    @jax.jit
    @jax.vmap
    def batched(st, buf, ln):
        return ik.interpolate(st, buf, ln, CFG)

    res = batched(batch, bufs, lens)
    assert int(res.err[0]) == ik.ERR_OK
    assert bytes(np.asarray(res.buf[1])[:int(res.length[1])]) == b"x7"
    assert int(res.err[2]) == ik.ERR_MISSING
    assert int(res.err[3]) == ik.ERR_OK
