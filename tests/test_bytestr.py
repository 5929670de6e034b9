"""Unit tests for the device byte-string primitives (CPU, unjitted + jitted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpolation_engine_tpu.vm import bytestr as bs

N = 64


def mk(s: str):
    data = s.encode("utf-8")
    buf = np.zeros(N, np.uint8)
    buf[:len(data)] = list(data)
    return jnp.array(buf), jnp.int32(len(data))


def to_str(buf, length):
    return bytes(np.asarray(buf)[:int(length)]).decode("utf-8", "replace")


def test_concat():
    a, la = mk("hello ")
    b, lb = mk("world")
    out, ln, ov = bs.concat(a, la, b, lb, N)
    assert to_str(out, ln) == "hello world"
    assert not bool(ov)


def test_concat_overflow():
    a, la = mk("x" * 40)
    b, lb = mk("y" * 40)
    out, ln, ov = bs.concat(a, la, b, lb, N)
    assert bool(ov)
    assert int(ln) == N


def test_substring_and_splice():
    a, la = mk("abcdefgh")
    sub, ln = bs.substring(a, jnp.int32(2), jnp.int32(3), N)
    assert to_str(sub, ln) == "cde"
    rep, lr = mk("XY")
    out, ln, ov = bs.splice(a, la, jnp.int32(2), jnp.int32(5), rep, lr, N)
    assert to_str(out, ln) == "abXYfgh"


def test_splice_empty_replacement():
    a, la = mk("abcdef")
    rep, lr = mk("")
    out, ln, _ = bs.splice(a, la, jnp.int32(1), jnp.int32(4), rep, lr, N)
    assert to_str(out, ln) == "aef"


def test_find_rfind_count():
    a, la = mk("a{b{c}d}")
    assert int(bs.find(a, la, bs.BRACE_OPEN, jnp.int32(0))) == 1
    assert int(bs.find(a, la, bs.BRACE_OPEN, jnp.int32(2))) == 3
    assert int(bs.rfind(a, la, bs.BRACE_OPEN)) == 3
    assert int(bs.count(a, la, bs.BRACE_OPEN)) == 2
    assert int(bs.find(a, la, ord("z"), jnp.int32(0))) == -1
    assert int(bs.rfind(a, la, ord("z"))) == -1


def test_escape_hidden_mask():
    a, la = mk(r"a\{b{c\}d}")
    mask = bs.escape_hidden_mask(a, la)
    hidden = [i for i, h in enumerate(np.asarray(mask)) if h]
    s = r"a\{b{c\}d}"
    assert hidden == [s.index("{", 1), s.index("}")]
    # find skips hidden braces
    assert int(bs.find(a, la, bs.BRACE_OPEN, jnp.int32(0), mask)) == s.index("{", 3)


def test_int_to_bytes():
    for v in [0, 7, 42, -1, -120, 2147483647, -2147483648, 1000000]:
        out, ln = bs.int_to_bytes(jnp.int32(v), 16)
        assert to_str(out, ln) == str(v), v


def test_bytes_to_int():
    for s, want, ok in [("123", 123, True), ("-5", -5, True), ("+7", 7, True),
                        ("0", 0, True), ("12a", 0, False), ("", 0, False),
                        ("-", 0, False)]:
        buf, ln = mk(s)
        v, got_ok = bs.bytes_to_int(buf, ln)
        assert bool(got_ok) == ok, s
        if ok:
            assert int(v) == want, s


def test_unescape_braces():
    for raw, want in [
        (r"\{a\}", "{a}"),
        (r"no escapes", "no escapes"),
        ("a\\\\{b", "a\\{b"),   # '\\{' keeps the first backslash
        (r"\{\{", "{{"),
        ("trail\\", "trail\\"),
    ]:
        buf, ln = mk(raw)
        out, n = bs.unescape_braces(buf, ln)
        assert to_str(out, n) == raw.replace("\\{", "{").replace("\\}", "}"), raw
        assert to_str(out, n) == want


def test_escape_braces():
    for raw in ["{a}", "plain", "{{}}", "x{y"]:
        buf, ln = mk(raw)
        out, n, ov = bs.escape_braces(buf, ln, N)
        assert to_str(out, n) == raw.replace("{", "\\{").replace("}", "\\}")
        assert not bool(ov)


def test_vmapped_and_jitted():
    @jax.jit
    @jax.vmap
    def roundtrip(buf, ln):
        esc, n, _ = bs.escape_braces(buf, ln, N)
        out, n2 = bs.unescape_braces(esc, n)
        return out, n2

    strs = ["{a}", "plain", "x{y}z", ""]
    bufs = jnp.stack([mk(s)[0] for s in strs])
    lens = jnp.stack([mk(s)[1] for s in strs])
    outs, ns = roundtrip(bufs, lens)
    for i, s in enumerate(strs):
        assert to_str(outs[i], ns[i]) == s


def test_find_slot_hash_collision_is_detected_not_aliased():
    """Two slots sharing hash+len with different key bytes must never
    silently alias: the true-key lookup succeeds (byte verify), the
    colliding probe reports `collide` so callers park for host rescue."""
    import jax.numpy as jnp
    from interpolation_engine_tpu.vm.config import VMConfig
    from interpolation_engine_tpu.vm.state import (
        encode_inserts, find_slot, fnv1a_np)

    cfg = VMConfig(max_str=64, max_key=16, n_slots=8, arena_size=256,
                   pool_size=8, out_size=64)
    st = encode_inserts({"aa": 1, "bb": 2}, cfg)
    # forge a collision: pretend 'aa' (slot 0) hashes like 'bb', as a
    # crafted colliding key pair would
    st = st._replace(
        key_hash=st.key_hash.at[0].set(jnp.uint32(fnv1a_np(b"bb"))))

    def probe(key: bytes):
        buf = jnp.zeros((cfg.max_str,), jnp.uint8).at[:len(key)].set(
            jnp.array(list(key), jnp.uint8))
        return find_slot(st, buf, jnp.int32(len(key)))

    # probing 'bb' hits the hash+len prefilter on slot 0 first, whose bytes
    # mismatch while another candidate exists -> ambiguous -> collide
    found, slot, collide = probe(b"bb")
    assert bool(collide) and not bool(found)
    # an unrelated key is simply not found (no false collision)
    found, slot, collide = probe(b"zz")
    assert not bool(found) and not bool(collide)
    # sanity on an unforged store: exact lookups byte-verify clean
    st2 = encode_inserts({"aa": 1, "bb": 2}, cfg)
    buf = jnp.zeros((cfg.max_str,), jnp.uint8).at[:2].set(
        jnp.array(list(b"bb"), jnp.uint8))
    found, slot, collide = find_slot(st2, buf, jnp.int32(2))
    assert bool(found) and int(slot) == 1 and not bool(collide)

