"""The interpolation kernel — `{key}` resolution as fixed-shape byte scans.

Single-instance jnp implementation of the interpolation ISA (the exact
semantics live in core/interp.py, the host oracle; reference behavior:
interpolation_engine.py:497-541). Structure:

* escaped braces are *masked*, not sentinel-swapped — equivalent because the
  reference's sentinels are length-preserving and only brace visibility and
  restored key bytes are observable;
* simple-key detection is the same depth scan (depth 0 only at the ends);
* the general path loops innermost-first (rightmost '{', next '}'),
  substituting str(value) with bounded iterations;
* a simple key resolves to the typed stored value, with one level of
  ``{{key}}`` indirection.

Error codes instead of exceptions: ERR_MISSING maps to
InterpolationException (NULL-catchable), ERR_ASSERT to the reference's
assertion failures, ERR_CAPACITY to buffer overflow (host rescue), ERR_HOST
to semantics the device defers to the host (special time keys, lists
stringified into text, deep indirection).

Results are a tagged union (rtype/rint/rbuf/rlen/rpool) so simple-key type
preservation (int/list pass-through) survives the device roundtrip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..vm import bytestr as bs
from ..vm.config import VMConfig
from ..vm.state import T_INT, T_LIST, T_STR, VMInstance, find_slot

ERR_OK = 0
ERR_MISSING = 1     # InterpolationException semantics
ERR_ASSERT = 2      # reference AssertionError semantics
ERR_CAPACITY = 3    # device buffer overflow — host rescue
ERR_HOST = 4        # behavior the device defers to host


class InterpResult(NamedTuple):
    err: jnp.ndarray     # int32, one of ERR_*
    vtype: jnp.ndarray   # int32 (T_INT/T_STR/T_LIST)
    vint: jnp.ndarray    # int32
    buf: jnp.ndarray     # uint8[max_str] — string payload when vtype==T_STR
    length: jnp.ndarray  # int32
    pool_off: jnp.ndarray  # int32 — list span when vtype==T_LIST
    pool_len: jnp.ndarray  # int32


def _mk_str(buf, length, err=ERR_OK):
    return InterpResult(jnp.int32(err), jnp.int32(T_STR), jnp.int32(0),
                        buf, jnp.asarray(length, jnp.int32),
                        jnp.int32(0), jnp.int32(0))


def _mk_err(err, max_str: int):
    return InterpResult(jnp.int32(err), jnp.int32(T_STR), jnp.int32(0),
                        jnp.zeros((max_str,), jnp.uint8), jnp.int32(0),
                        jnp.int32(0), jnp.int32(0))


def simple_key_span(buf, length):
    """If buf[:length] is exactly one balanced {…} group (escape-aware),
    return (is_simple, inner_start=1, inner_len=length-2); the group must be
    non-empty to count (the reference treats '' as falsy)."""
    n = buf.shape[0]
    pos = bs.positions(n)
    hidden = bs.escape_hidden_mask(buf, length)
    opens = ((buf == bs.BRACE_OPEN) & ~hidden & (pos < length)).astype(jnp.int32)
    closes = ((buf == bs.BRACE_CLOSE) & ~hidden & (pos < length)).astype(jnp.int32)
    # depth AFTER processing the close at i, BEFORE processing open at i:
    # reference order per char: depth -= is_close; check; depth += is_open
    depth_before = jnp.cumsum(opens) - opens - (jnp.cumsum(closes) - closes)
    depth_at_check = depth_before - closes  # after close, before open
    is_end = (pos == 0) | (pos == length - 1)
    ok_at = (depth_at_check == 0) == is_end
    all_ok = jnp.all(ok_at | (pos >= length))
    is_simple = all_ok & (length > 2)
    return is_simple


def lookup(st: VMInstance, key_buf, key_len, cfg: VMConfig):
    """get_interpdata on the device store. Returns InterpResult."""
    n = key_buf.shape[0]

    def str_eq(s: str):
        data = s.encode()
        if len(data) > n:
            return jnp.bool_(False)
        target = jnp.zeros((n,), jnp.uint8).at[:len(data)].set(
            jnp.array(list(data), jnp.uint8))
        return bs.equal(key_buf, key_len, target, jnp.int32(len(data)))

    is_special_time = str_eq("HH:MM") | str_eq("HH:MM:SS")
    is_empty = key_len == 0

    found, slot, collide = find_slot(st, key_buf, key_len)
    vtype = st.vtype[slot]
    vint = st.vint[slot]
    voff = st.voff[slot]
    vlen = st.vlen[slot]

    # materialize string payloads into a working buffer
    str_buf, str_len = _arena_str(st, voff, vlen, cfg.max_str)

    # stored strings longer than the working buffer can't be materialized
    # without truncation → capacity park
    str_over = found & (vtype == T_STR) & (vlen > cfg.max_str)
    err = jnp.where(is_special_time, ERR_HOST,
                    jnp.where(collide, ERR_HOST,
                              jnp.where(is_empty | ~found, ERR_MISSING,
                                        jnp.where(str_over, ERR_CAPACITY,
                                                  ERR_OK))))
    return InterpResult(
        err=err.astype(jnp.int32),
        vtype=jnp.where(found, vtype, T_STR).astype(jnp.int32),
        vint=vint.astype(jnp.int32),
        buf=jnp.where(vtype == T_STR, str_buf, jnp.zeros_like(str_buf)),
        length=jnp.where(vtype == T_STR, str_len, 0).astype(jnp.int32),
        pool_off=jnp.where(vtype == T_LIST, voff, 0).astype(jnp.int32),
        pool_len=jnp.where(vtype == T_LIST, vlen, 0).astype(jnp.int32),
    )


def _arena_str(st: VMInstance, off, length, size: int):
    off = jnp.clip(off, 0, st.arena.shape[0] - size)
    chunk = jax.lax.dynamic_slice(st.arena, (off,), (size,))
    return bs.normalize(chunk, length), jnp.asarray(length, jnp.int32)


def value_to_bytes(res: InterpResult, max_str: int):
    """str(value) for int/str results; lists defer to host (Python repr)."""
    int_buf, int_len = bs.int_to_bytes(res.vint, max_str)
    is_int = res.vtype == T_INT
    is_list = res.vtype == T_LIST
    buf = jnp.where(is_int, int_buf, res.buf)
    length = jnp.where(is_int, int_len, res.length)
    err = jnp.where(is_list, ERR_HOST, res.err)
    return buf, length, err.astype(jnp.int32)


def general_interpolate(st: VMInstance, buf, length, cfg: VMConfig):
    """The innermost-first substitution loop on a working buffer.

    Returns (buf', len', err). Input bytes are raw program text (escapes
    intact); escaped braces stay escaped in the output, mirroring the
    reference's sentinel swap-out.
    """
    n = cfg.max_str

    # the brace scan (fused Pallas kernel when IE_TPU_PALLAS selects it)
    from .pallas_scan import brace_scan_one

    def cond(carry):
        buf, length, err, iters, done = carry
        n_open, _, _, _ = brace_scan_one(buf, length)
        return (err == ERR_OK) & ~done & (n_open > 0) & \
            (iters < cfg.max_subst)

    def body(carry):
        buf, length, err, iters, done = carry
        n_open, n_close, outer_from, inner_to = brace_scan_one(buf, length)
        balanced = n_open == n_close
        # no '}' after the last '{' (with balanced counts) → the reference
        # breaks out of its loop and returns the content as-is
        break_out = balanced & ((outer_from == -1) | (inner_to == -1))

        key_len = inner_to - outer_from - 1
        key_buf, _ = bs.substring(buf, outer_from + 1, key_len, n)

        res = lookup(st, key_buf, key_len, cfg)
        val_buf, val_len, verr = value_to_bytes(res, n)

        new_buf, new_len, overflow = bs.splice(
            buf, length, outer_from, inner_to + 1, val_buf, val_len, n)

        step_err = jnp.where(~balanced, ERR_ASSERT,
                             jnp.where(break_out, ERR_OK,
                             jnp.where(res.err != ERR_OK, res.err,
                                       jnp.where(verr != ERR_OK, verr,
                                                 jnp.where(overflow, ERR_CAPACITY,
                                                           ERR_OK)))))
        apply = (step_err == ERR_OK) & ~break_out
        buf = jnp.where(apply, new_buf, buf)
        length = jnp.where(apply, new_len, length)
        err = jnp.where(step_err != ERR_OK, step_err, err)
        return buf, length, err, iters + 1, done | break_out

    buf, length, err, iters, done = jax.lax.while_loop(
        cond, body, (buf, jnp.asarray(length, jnp.int32), jnp.int32(ERR_OK),
                     jnp.int32(0), jnp.bool_(False)))
    # hit the iteration cap with braces remaining → defer to host
    hidden = bs.escape_hidden_mask(buf, length)
    capped = (err == ERR_OK) & ~done & (iters >= cfg.max_subst) & \
        (bs.find(buf, length, bs.BRACE_OPEN, jnp.int32(0), hidden) != -1)
    err = jnp.where(capped, ERR_HOST, err)
    return buf, length, err


import functools


@functools.lru_cache(maxsize=None)
def _jitted_interpolate(cfg: VMConfig, pallas_mode):
    """Non-inlined jit of the kernel: instantiations inside the big step
    function become XLA calls that the compiler dedupes, cutting trace and
    compile size substantially. Keyed on the IE_TPU_PALLAS mode so a flag
    flip can't serve a stale trace."""
    def f(st, buf, length):
        return _interpolate_impl(st, buf, length, cfg)
    return jax.jit(f, inline=False)


def interpolate(st: VMInstance, buf, length, cfg: VMConfig) -> InterpResult:
    from .pallas_scan import pallas_mode
    res = _jitted_interpolate(cfg, pallas_mode())(
        st, buf, jnp.asarray(length, jnp.int32))
    # a logical length beyond the working buffer means the template was
    # truncated on load — capacity park (host rescue), never silent nulls
    over = jnp.asarray(length, jnp.int32) > cfg.max_str
    return res._replace(err=jnp.where(over, ERR_CAPACITY, res.err))


def _interpolate_impl(st: VMInstance, buf, length, cfg: VMConfig) -> InterpResult:
    """Full interpolate_inserts: simple-key typed fast path + general loop.

    One general_interpolate instantiation serves all three structural cases
    (full text / simple-key inner / {{k}} indirection inner) by selecting its
    input up front — the select-all-branches cost of three instantiations
    under vmap tripled the hottest kernel.
    """
    n = cfg.max_str
    length = jnp.asarray(length, jnp.int32)

    is_simple = simple_key_span(buf, length)
    inner_buf, inner_len = bs.substring(buf, jnp.int32(1), length - 2, n)
    inner_simple = simple_key_span(inner_buf, inner_len)
    inner2_buf, inner2_len = bs.substring(inner_buf, jnp.int32(1),
                                          inner_len - 2, n)
    inner2_simple = simple_key_span(inner2_buf, inner2_len)

    use_inner2 = is_simple & inner_simple
    use_inner = is_simple & ~inner_simple
    gen_buf = jnp.where(use_inner2, inner2_buf,
                        jnp.where(use_inner, inner_buf, buf))
    gen_len = jnp.where(use_inner2, inner2_len,
                        jnp.where(use_inner, inner_len, length))

    g_buf, g_len, g_err = general_interpolate(st, gen_buf, gen_len, cfg)

    # {{k}}: resolve k, then use its *string* value as the outer key. A
    # non-string intermediate raises in the reference (int →
    # InterpolationException via the failed dict probe; list/dict →
    # TypeError): map to ERR_MISSING / ERR_ASSERT. Nesting deeper than one
    # indirection level defers to host.
    indirect = lookup(st, g_buf, g_len, cfg)
    ind_err = jnp.where(
        indirect.err != ERR_OK, indirect.err,
        jnp.where(indirect.vtype == T_INT, ERR_MISSING,
                  jnp.where(indirect.vtype == T_LIST, ERR_ASSERT, ERR_OK)))
    ind_err = jnp.where(inner2_simple, ERR_HOST, ind_err).astype(jnp.int32)

    key_buf = jnp.where(use_inner2, indirect.buf, g_buf)
    key_len = jnp.where(use_inner2, indirect.length, g_len)
    key_err = jnp.where(use_inner2, ind_err, jnp.int32(ERR_OK))
    key_err = jnp.where(g_err != ERR_OK, g_err, key_err)

    simple_res = lookup(st, key_buf, key_len, cfg)
    simple_res = simple_res._replace(
        err=jnp.where(key_err != ERR_OK, key_err, simple_res.err))

    general_res = _mk_str(g_buf, g_len)._replace(err=g_err)

    def pick(a, b):
        return jnp.where(is_simple, a, b)

    return InterpResult(*[pick(a, b) for a, b in zip(simple_res, general_res)])
