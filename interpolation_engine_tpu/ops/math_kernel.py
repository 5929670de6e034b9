"""Device math evaluator — byte-level expression evaluation, integer domain.

Mirrors the host oracle (core/math_eval.py; reference behavior:
interpolation_engine.py:849-949): the (already interpolated) expression is
reduced innermost-paren-first — dispatching ``length``/``min``/``max``/
``round``/``sign`` when the group is preceded by a word character — then the
remaining flat expression is evaluated with Python operator semantics.

Device restrictions (ERR_HOST defers to the host executor):
* arithmetic stays in int32 — true division is performed only when exact
  (the reference's float intermediates round back to the same integer in
  that case); inexact division, '.' literals, or '**' with negative exponent
  defer to host;
* min/max over string lists defer to host.

Python semantics preserved: '%' takes the divisor's sign, unary minus binds
tighter than '*','/','%' and looser than '**' (so -2**2 == -4), '**' is
right-associative.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..vm import bytestr as bs
from ..vm.config import VMConfig
from ..vm.state import T_INT, T_LIST, VMInstance
from .interp_kernel import (
    ERR_ASSERT,
    ERR_CAPACITY,
    ERR_HOST,
    ERR_OK,
    lookup,
)

LPAREN, RPAREN = 40, 41
MAX_PARENS = 8
STACK = 16

OP_ADD, OP_SUB, OP_MUL, OP_DIV, OP_MOD, OP_POW, OP_FLOORDIV, OP_NEG = \
    1, 2, 3, 4, 5, 6, 7, 8
#                         0  +  -  *  /  %  ** //  neg
_PRECEDENCE = jnp.array([0, 1, 1, 2, 2, 2, 4, 2, 3], jnp.int32)
_RIGHT_ASSOC = jnp.array([0, 0, 0, 0, 0, 0, 1, 0, 1], jnp.int32)


class EvalResult(NamedTuple):
    err: jnp.ndarray
    value: jnp.ndarray  # int32


def _is_digit(b):
    return (b >= 48) & (b <= 57)


def _reduce_once(nums, ns, ops, os):
    """Apply the top operator; returns (nums, ns, os, err)."""
    op = ops[jnp.clip(os - 1, 0, STACK - 1)]
    is_unary = op == OP_NEG
    b = nums[jnp.clip(ns - 1, 0, STACK - 1)]
    a = jnp.where(is_unary, 0, nums[jnp.clip(ns - 2, 0, STACK - 1)])
    safe_b = jnp.where(b == 0, 1, b)
    exact_div = (a % safe_b) == 0
    div_val = a // safe_b
    mod_val = a % safe_b

    def pow_val():
        def body(_, acc):
            return acc * a
        return jax.lax.fori_loop(0, jnp.clip(b, 0, 31), body, jnp.int32(1))

    val = jnp.where(op == OP_ADD, a + b,
          jnp.where(op == OP_SUB, a - b,
          jnp.where(op == OP_MUL, a * b,
          jnp.where(op == OP_DIV, div_val,
          jnp.where(op == OP_FLOORDIV, div_val,
          jnp.where(op == OP_MOD, mod_val,
          jnp.where(op == OP_POW, pow_val(),
          jnp.where(op == OP_NEG, -b, 0))))))))
    err = jnp.where((op == OP_DIV) & ~exact_div, ERR_HOST,
          jnp.where(((op == OP_DIV) | (op == OP_MOD) | (op == OP_FLOORDIV))
                    & (b == 0), ERR_ASSERT,
          jnp.where((op == OP_POW) & (b < 0), ERR_HOST, ERR_OK)))
    new_ns = jnp.where(is_unary, ns, ns - 1)
    nums = nums.at[jnp.clip(new_ns - 1, 0, STACK - 1)].set(val)
    return nums, new_ns, os - 1, err.astype(jnp.int32)


def eval_flat(buf, length):
    """Evaluate a paren-free integer expression with Python semantics."""
    n = buf.shape[0]
    length = jnp.asarray(length, jnp.int32)

    def step(carry):
        i, nums, ns, ops, os, expect_operand, err = carry
        b = buf[i]
        nxt = buf[jnp.clip(i + 1, 0, n - 1)]

        is_space = b == 32
        is_dig = _is_digit(b)
        is_pow = (b == 42) & (nxt == 42) & (i + 1 < length)
        is_floordiv = (b == 47) & (nxt == 47) & (i + 1 < length)
        op_code = jnp.where(is_pow, OP_POW,
                  jnp.where(is_floordiv, OP_FLOORDIV,
                  jnp.where(b == 43, OP_ADD,
                  jnp.where(b == 45, OP_SUB,
                  jnp.where(b == 42, OP_MUL,
                  jnp.where(b == 47, OP_DIV,
                  jnp.where(b == 37, OP_MOD, 0)))))))
        op_width = jnp.where(is_pow | is_floordiv, 2, 1).astype(jnp.int32)

        def handle_space(args):
            i, nums, ns, ops, os, eo, err = args
            return (i + 1, nums, ns, ops, os, eo, err)

        def handle_digit(args):
            i, nums, ns, ops, os, eo, err = args

            def nc(c):
                j = c[0]
                return (j < length) & (_is_digit(buf[jnp.clip(j, 0, n - 1)])
                                       | (buf[jnp.clip(j, 0, n - 1)] == 46))

            def nb(c):
                j, v, saw_dot = c
                bj = buf[jnp.clip(j, 0, n - 1)]
                return (j + 1,
                        jnp.where(_is_digit(bj),
                                  v * 10 + (bj - 48).astype(jnp.int32), v),
                        saw_dot | (bj == 46))

            j, v, saw_dot = jax.lax.while_loop(
                nc, nb, (i, jnp.int32(0), jnp.bool_(False)))
            err = jnp.where(saw_dot, ERR_HOST,
                            jnp.where(~eo, ERR_ASSERT,
                                      jnp.where(ns >= STACK, ERR_HOST, err)))
            nums = nums.at[jnp.clip(ns, 0, STACK - 1)].set(v)
            return (j, nums, ns + 1, ops, os, jnp.bool_(False), err.astype(jnp.int32))

        def handle_operator(args):
            i, nums, ns, ops, os, eo, err = args

            def unary(a2):
                i, nums, ns, ops, os, err = a2
                # '+x' is identity; '-x' pushes OP_NEG
                push = op_code == OP_SUB
                bad = (op_code != OP_ADD) & (op_code != OP_SUB)
                err2 = jnp.where(bad, ERR_ASSERT,
                                 jnp.where(push & (os >= STACK), ERR_HOST, err))
                ops2 = jnp.where(push,
                                 ops.at[jnp.clip(os, 0, STACK - 1)].set(OP_NEG),
                                 ops)
                os2 = jnp.where(push, os + 1, os)
                return (i + op_width, nums, ns, ops2, os2, jnp.bool_(True),
                        err2.astype(jnp.int32))

            def binary(a2):
                i, nums, ns, ops, os, err = a2
                prec = _PRECEDENCE[op_code]
                right = _RIGHT_ASSOC[op_code] == 1

                def rc(c):
                    nums, ns, ops, os, err = c
                    can = (os > 0) & (err == ERR_OK)
                    top = _PRECEDENCE[ops[jnp.clip(os - 1, 0, STACK - 1)]]
                    need = jnp.where(right, top > prec, top >= prec)
                    return can & need

                def rb(c):
                    nums, ns, ops, os, err = c
                    nums, ns, os, e2 = _reduce_once(nums, ns, ops, os)
                    return nums, ns, ops, os, jnp.where(err == ERR_OK, e2, err)

                nums, ns, ops, os, err = jax.lax.while_loop(
                    rc, rb, (nums, ns, ops, os, err))
                err = jnp.where(os >= STACK, ERR_HOST, err)
                ops = ops.at[jnp.clip(os, 0, STACK - 1)].set(op_code)
                return (i + op_width, nums, ns, ops, os + 1, jnp.bool_(True),
                        err.astype(jnp.int32))

            return jax.lax.cond(eo, unary, binary,
                                (i, nums, ns, ops, os, err))

        def handle_bad(args):
            i, nums, ns, ops, os, eo, err = args
            return (i + 1, nums, ns, ops, os, eo,
                    jnp.where(err == ERR_OK, jnp.int32(ERR_ASSERT), err))

        branch = jnp.where(is_space, 0,
                 jnp.where(is_dig, 1,
                 jnp.where(op_code != 0, 2, 3))).astype(jnp.int32)
        return jax.lax.switch(branch,
                              [handle_space, handle_digit, handle_operator,
                               handle_bad],
                              (i, nums, ns, ops, os, expect_operand, err))

    def cond(carry):
        i, _, _, _, _, _, err = carry
        return (i < length) & (err == ERR_OK)

    init = (jnp.int32(0), jnp.zeros((STACK,), jnp.int32), jnp.int32(0),
            jnp.zeros((STACK,), jnp.int32), jnp.int32(0), jnp.bool_(True),
            jnp.int32(ERR_OK))
    i, nums, ns, ops, os, eo, err = jax.lax.while_loop(cond, step, init)

    # empty expression or trailing operator
    err = jnp.where((err == ERR_OK) & eo, ERR_ASSERT, err)

    def rc(c):
        nums, ns, ops, os, err = c
        return (os > 0) & (err == ERR_OK)

    def rb(c):
        nums, ns, ops, os, err = c
        nums, ns, os, e2 = _reduce_once(nums, ns, ops, os)
        return nums, ns, ops, os, jnp.where(err == ERR_OK, e2, err)

    nums, ns, ops, os, err = jax.lax.while_loop(rc, rb, (nums, ns, ops, os, err))
    err = jnp.where((err == ERR_OK) & (ns != 1), ERR_ASSERT, err)
    return EvalResult(err.astype(jnp.int32), nums[0])


# ---------------------------------------------------------------------------
# paren reduction + function dispatch
# ---------------------------------------------------------------------------

_FN_LENGTH, _FN_MIN, _FN_MAX, _FN_ROUND, _FN_SIGN, _FN_NONE = 1, 2, 3, 4, 5, 0


def _match_name(buf, start, length_total, name: str):
    """bytes at [start-len(name), start) == name (a backward literal match)."""
    data = jnp.array(list(name.encode()), jnp.uint8)
    m = int(data.shape[0])
    n = buf.shape[0]
    base = start - m
    ok = base >= 0

    def body(q, acc):
        idx = jnp.clip(base + q, 0, n - 1)
        return acc & (buf[idx] == data[q])
    ok = jax.lax.fori_loop(0, m, body, ok)
    # the char before the name must be a word-splitting char or start-of-string
    prevb = buf[jnp.clip(base - 1, 0, n - 1)]
    prev_split = (base == 0) | (prevb == 32) | (prevb == 40) | (prevb == 41) | \
        (prevb == 43) | (prevb == 45) | (prevb == 42) | (prevb == 47) | \
        (prevb == 94) | (prevb == 37)
    return ok & prev_split, jnp.int32(m)


def _eval_list_minmax(st: VMInstance, key_buf, key_len, want_max, cfg: VMConfig):
    """min/max over an int list stored under `key`."""
    res = lookup(st, key_buf, key_len, cfg)
    is_list = res.vtype == T_LIST
    base, cnt = res.pool_off, res.pool_len

    def body(q, carry):
        best, all_int, any_elem = carry
        idx = jnp.clip(base + q, 0, st.pool_type.shape[0] - 1)
        in_range = q < cnt
        et = st.pool_type[idx]
        ev = st.pool_int[idx]
        all_int = all_int & (~in_range | (et == T_INT))
        cand = jnp.where(want_max, jnp.maximum(best, ev), jnp.minimum(best, ev))
        best = jnp.where(in_range & (et == T_INT),
                         jnp.where(any_elem, cand, ev), best)
        any_elem = any_elem | (in_range & (et == T_INT))
        return best, all_int, any_elem

    best, all_int, any_elem = jax.lax.fori_loop(
        0, st.pool_type.shape[0], body,
        (jnp.int32(0), jnp.bool_(True), jnp.bool_(False)))
    err = jnp.where(res.err != ERR_OK, res.err,
          jnp.where(~is_list, ERR_ASSERT,
          jnp.where(~all_int, ERR_HOST,          # string lists → host
          jnp.where(cnt == 0, ERR_ASSERT, ERR_OK))))
    return EvalResult(err.astype(jnp.int32), best)


def _eval_enum_minmax(buf, length, want_max):
    """min/max over a comma-separated enumeration of flat expressions."""
    n = buf.shape[0]
    COMMA = 44

    def body(carry):
        start, best, any_v, err, done = carry
        nxt_comma = bs.find(buf, length, COMMA, start)
        end = jnp.where(nxt_comma == -1, length, nxt_comma)
        seg, seg_len = bs.substring(buf, start, end - start, n)
        r = eval_flat(seg, seg_len)
        err = jnp.where(err == ERR_OK, r.err, err)
        cand = jnp.where(want_max, jnp.maximum(best, r.value),
                         jnp.minimum(best, r.value))
        best = jnp.where(any_v, cand, r.value)
        done = nxt_comma == -1
        return end + 1, best, jnp.bool_(True), err, done

    def cond(carry):
        start, _, _, err, done = carry
        return ~done & (err == ERR_OK) & (start <= length)

    _, best, any_v, err, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(False),
                     jnp.int32(ERR_OK), jnp.bool_(False)))
    err = jnp.where(~any_v, ERR_ASSERT, err)
    return EvalResult(err.astype(jnp.int32), best)


def _has_only_enum_chars(buf, length):
    """inner ⊆ ' .0123456789+-*/%,' → enumeration, else a key name."""
    pos = bs.positions(buf.shape[0])
    b = buf
    legal = (b == 32) | (b == 46) | ((b >= 48) & (b <= 57)) | (b == 43) | \
        (b == 45) | (b == 42) | (b == 47) | (b == 37) | (b == 44)
    return jnp.all(legal | (pos >= length))


import functools


@functools.lru_cache(maxsize=None)
def _jitted_eval_math(cfg: VMConfig):
    def f(st, buf, length):
        return _eval_math_bytes_impl(st, buf, length, cfg)
    return jax.jit(f, inline=False)


def eval_math_bytes(st: VMInstance, buf, length, cfg: VMConfig) -> EvalResult:
    return _jitted_eval_math(cfg)(st, buf, jnp.asarray(length, jnp.int32))


def _eval_math_bytes_impl(st: VMInstance, buf, length, cfg: VMConfig) -> EvalResult:
    """Full eval_math on an already-interpolated byte expression."""
    n = buf.shape[0]
    length = jnp.asarray(length, jnp.int32)

    n_open = bs.count(buf, length, LPAREN)
    n_close = bs.count(buf, length, RPAREN)
    balanced_err = jnp.where(n_open != n_close, ERR_ASSERT, ERR_OK)

    def body(carry):
        buf, length, err, iters = carry
        outer_from = bs.rfind(buf, length, LPAREN)
        inner_to = bs.find(buf, length, RPAREN, outer_from + 1)
        proceed = (outer_from != -1) & (inner_to != -1)

        inner_len = inner_to - outer_from - 1
        inner_buf, _ = bs.substring(buf, outer_from + 1, inner_len, n)

        # function-call classification: the char before '(' — with the
        # reference's negative-index quirk (outer_from == 0 reads the last
        # byte of the string)
        before_idx = jnp.where(outer_from == 0, length - 1, outer_from - 1)
        before = buf[jnp.clip(before_idx, 0, n - 1)]
        is_split = (before == 32) | (before == 40) | (before == 41) | \
            (before == 43) | (before == 45) | (before == 42) | \
            (before == 47) | (before == 94) | (before == 37)
        is_plain = is_split | (length == 0)

        # which function name precedes '('?
        fn = jnp.int32(_FN_NONE)
        fn_len = jnp.int32(0)
        for code, name in ((_FN_LENGTH, "length"), (_FN_MIN, "min"),
                           (_FN_MAX, "max"), (_FN_ROUND, "round"),
                           (_FN_SIGN, "sign")):
            okn, m = _match_name(buf, outer_from, length, name)
            fn = jnp.where((fn == _FN_NONE) & okn, code, fn)
            fn_len = jnp.where((fn == code) & okn & (fn_len == 0), m, fn_len)

        plain = eval_flat(inner_buf, inner_len)

        is_enum = _has_only_enum_chars(inner_buf, inner_len)
        enum_min = _eval_enum_minmax(inner_buf, inner_len, jnp.bool_(False))
        enum_max = _eval_enum_minmax(inner_buf, inner_len, jnp.bool_(True))
        list_min = _eval_list_minmax(st, inner_buf, inner_len, jnp.bool_(False), cfg)
        list_max = _eval_list_minmax(st, inner_buf, inner_len, jnp.bool_(True), cfg)
        length_res = lookup(st, inner_buf, inner_len, cfg)
        length_val = EvalResult(
            jnp.where(length_res.err != ERR_OK, length_res.err,
                      jnp.where(length_res.vtype != T_LIST,
                                ERR_ASSERT, ERR_OK)).astype(jnp.int32),
            length_res.pool_len)

        fn_res_err = jnp.where(fn == _FN_LENGTH, length_val.err,
                     jnp.where(fn == _FN_MIN,
                               jnp.where(is_enum, enum_min.err, list_min.err),
                     jnp.where(fn == _FN_MAX,
                               jnp.where(is_enum, enum_max.err, list_max.err),
                     jnp.where((fn == _FN_ROUND) | (fn == _FN_SIGN), plain.err,
                               jnp.int32(ERR_ASSERT)))))
        fn_res_val = jnp.where(fn == _FN_LENGTH, length_val.value,
                     jnp.where(fn == _FN_MIN,
                               jnp.where(is_enum, enum_min.value, list_min.value),
                     jnp.where(fn == _FN_MAX,
                               jnp.where(is_enum, enum_max.value, list_max.value),
                     jnp.where(fn == _FN_ROUND, plain.value,
                     jnp.where(fn == _FN_SIGN, jnp.sign(plain.value), 0)))))

        sub_err = jnp.where(is_plain, plain.err, fn_res_err)
        sub_val = jnp.where(is_plain, plain.value, fn_res_val)
        rep_from = jnp.where(is_plain, outer_from, outer_from - fn_len)

        val_buf, val_len = bs.int_to_bytes(sub_val, n)
        new_buf, new_len, overflow = bs.splice(
            buf, length, rep_from, inner_to + 1, val_buf, val_len, n)

        step_err = jnp.where(~proceed, ERR_OK,
                   jnp.where(sub_err != ERR_OK, sub_err,
                             jnp.where(overflow, ERR_CAPACITY, ERR_OK)))
        apply = proceed & (step_err == ERR_OK)
        buf = jnp.where(apply, new_buf, buf)
        length = jnp.where(apply, new_len, length)
        err = jnp.where(step_err != ERR_OK, step_err, err)
        iters = jnp.where(proceed, iters + 1, MAX_PARENS)
        return buf, length, err, iters

    def cond(carry):
        buf, length, err, iters = carry
        has_paren = bs.find(buf, length, LPAREN, jnp.int32(0)) != -1
        return (err == ERR_OK) & has_paren & (iters < MAX_PARENS)

    buf, length, err, iters = jax.lax.while_loop(
        cond, body, (buf, length, jnp.where(balanced_err != ERR_OK,
                                            balanced_err, ERR_OK).astype(jnp.int32),
                     jnp.int32(0)))
    capped = (err == ERR_OK) & (iters >= MAX_PARENS) & \
        (bs.find(buf, length, LPAREN, jnp.int32(0)) != -1)
    err = jnp.where(capped, ERR_HOST, err)

    final = eval_flat(buf, length)
    err = jnp.where(err == ERR_OK, final.err, err)
    return EvalResult(err.astype(jnp.int32), final.value)
