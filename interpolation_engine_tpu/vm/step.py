"""The device VM step: one instruction for one instance (vmap over a batch).

``make_step(compiled, cfg)`` closes over the instruction/aux/string/label
tables and returns a jittable ``step(st) -> st`` plus ``run(st, n) -> st``
(a bounded inner loop). Dispatch is ``lax.switch`` over the opcode, exactly
the structure SURVEY.md §7.1(3) prescribes; every handler is masked so
non-RUNNING instances pass through unchanged.

Error policy: device kernels return error codes; any non-OK result makes the
handler *park* the instance (PARK_HOST_OP) instead of approximating — the
host ring re-executes the original task with the exact host executor, so
observable behavior (including error messages) always matches the oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..compiler.lower import CompiledProgram
from ..ops import interp_kernel as ik
from ..ops import match_kernel as mk
from ..ops import math_kernel as mak
from ..ops.interp_kernel import ERR_HOST, ERR_MISSING, ERR_OK
from . import bytestr as bs
from . import isa
from .config import (PARKED, RUNNING, DONE, PARK_AWAIT_INSERT, PARK_HOST_OP,
                     PARK_THREADS, T_FREE, T_NEW, T_READY, T_WAIT, T_DONE,
                     VMConfig)
from .state import (
    T_INT,
    T_LIST,
    T_STR,
    VMInstance,
    arena_write,
    find_slot,
    fnv1a,
    store_set,
)


class Value(NamedTuple):
    """A resolved operand value (tagged union, like InterpResult)."""
    err: jnp.ndarray
    vtype: jnp.ndarray
    vint: jnp.ndarray
    buf: jnp.ndarray
    length: jnp.ndarray
    pool_off: jnp.ndarray
    pool_len: jnp.ndarray


class Tables(NamedTuple):
    """Program tables, passed as (traced) step arguments so compiled step
    executables are shared across programs with the same padded shapes."""
    code: jnp.ndarray
    aux: jnp.ndarray
    strtab: jnp.ndarray
    labels: jnp.ndarray


def _pad_pow2(arr, min_size=64):
    import numpy as _np
    n = arr.shape[0]
    target = max(min_size, 1 << (max(n, 1) - 1).bit_length())
    if target == n:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return _np.pad(arr, pad)


def pack_tables(compiled: CompiledProgram) -> Tables:
    """Pad program tables to power-of-two buckets (padding rows are OP_HALT /
    zeros, which are inert)."""
    import numpy as _np
    labels = _np.asarray(compiled.labels, _np.int32).reshape(-1, 5)
    if labels.shape[0] == 0:
        labels = _np.full((1, 5), -1, _np.int32)
    return Tables(
        code=jnp.asarray(_pad_pow2(_np.asarray(compiled.code, _np.int32))),
        aux=jnp.asarray(_pad_pow2(_np.asarray(compiled.aux, _np.int32))),
        strtab=jnp.asarray(_pad_pow2(_np.asarray(compiled.strtab, _np.uint8))),
        labels=jnp.asarray(_pad_pow2(labels, min_size=8)),
    )


def used_opcodes(compiled: CompiledProgram) -> frozenset:
    """Opcodes present in a program (for step specialization)."""
    import numpy as _np
    return frozenset(int(op) for op in _np.unique(
        _np.asarray(compiled.code)[:, 0]))


def make_step(compiled: CompiledProgram, cfg: VMConfig):
    """Build (step, run) bound to this program's packed tables.

    The underlying traced function depends only on cfg and table shapes, so
    jit caching shares one executable across same-bucket programs.
    """
    tables = pack_tables(compiled)
    gstep, grun, geager, _ = make_generic_step(cfg)

    def step(st):
        return geager(st, tables)

    def run(st, n_steps: int):
        return grun(st, tables, n_steps)

    return step, run


@functools.lru_cache(maxsize=None)
def make_generic_step(cfg: VMConfig, ops: frozenset = None):
    """Build (step, run, eager_step) for a config.

    ``ops`` optionally restricts the dispatch to a set of opcodes: handlers
    outside the set become parks (they can never be hit for a program whose
    code only contains ``ops``), which shrinks the compiled HLO dramatically
    — important on the slow remote-compile path. ``None`` keeps all
    handlers (the shareable default).
    """
    MS = cfg.max_str

    # Late-binding cell: `step` stores its traced table arguments here before
    # dispatch; helpers read them at trace time. Tracing is single-threaded,
    # and each shape bucket is traced exactly once under jit.
    _T: dict = {}

    def axu(i):
        aux = _T["aux"]
        return aux[jnp.clip(i, 0, aux.shape[0] - 1)]

    def tmpl(off, ln):
        return bs.from_table(_T["strtab"], off, ln, MS)

    def interp_tmpl(st, off, ln):
        buf, length = tmpl(off, ln)
        return ik.interpolate(st, buf, length, cfg)

    def res_to_value(r: ik.InterpResult) -> Value:
        return Value(r.err, r.vtype, r.vint, r.buf, r.length,
                     r.pool_off, r.pool_len)

    def err_value(err) -> Value:
        return Value(jnp.asarray(err, jnp.int32), jnp.int32(T_STR),
                     jnp.int32(0), jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                     jnp.int32(0), jnp.int32(0))

    # ---- operand resolution ----------------------------------------------------

    def resolve_vspec(st: VMInstance, base):
        """Resolve the vspec triple at aux[base..base+3) WITHOUT mutating st.

        List literals are NOT materialized here (see materialize_list);
        returns kind so callers can materialize when a pool value is needed.
        """
        kind = axu(base)
        x = axu(base + 1)
        y = axu(base + 2)

        def k_str(_):
            return res_to_value(interp_tmpl(st, x, y))

        def k_int(_):
            return Value(jnp.int32(ERR_OK), jnp.int32(T_INT), x,
                         jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                         jnp.int32(0), jnp.int32(0))

        def k_list(_):
            # marker: caller must materialize; report as list with base/count
            return Value(jnp.int32(ERR_OK), jnp.int32(T_LIST), jnp.int32(0),
                         jnp.zeros((MS,), jnp.uint8), jnp.int32(0), x, y)

        def k_host(_):
            return err_value(ERR_HOST)

        return jax.lax.switch(jnp.clip(kind, 0, 3),
                              [k_str, k_int, k_list, k_host], None), kind

    def materialize_list(st: VMInstance, base, count):
        """Write a VK_LIST literal's elements into the pool; returns
        (st', pool_base, count, err). Elements are nested vspecs."""
        pool_base = st.pool_top

        def body(i, carry):
            st, err = carry
            espec_base = base + 3 * i
            val, kind = resolve_vspec(st, espec_base)
            in_range = i < count
            # element templates resolving to lists (or literal nested lists)
            # defer to host
            elem_err = jnp.where(val.vtype == T_LIST, ERR_HOST, val.err)
            st2, eoff, ov = arena_write(st, val.buf, val.length, cfg)
            use_str = val.vtype == T_STR
            st2 = st2._replace(
                arena=jnp.where(use_str, st2.arena, st.arena),
                arena_top=jnp.where(use_str, st2.arena_top, st.arena_top))
            idx = jnp.clip(pool_base + i, 0, cfg.pool_size - 1)
            pool_ov = (pool_base + i) >= cfg.pool_size
            from .state import _masked_slot_update as _msu
            write_slot = jnp.where(in_range, idx, -1)
            st2 = st2._replace(
                pool_type=_msu(st2.pool_type, write_slot, val.vtype),
                pool_int=_msu(st2.pool_int, write_slot, val.vint),
                pool_off=_msu(st2.pool_off, write_slot,
                              jnp.where(use_str, eoff, 0)),
                pool_len=_msu(st2.pool_len, write_slot, val.length),
            )
            step_err = jnp.where(~in_range, ERR_OK,
                        jnp.where(elem_err != ERR_OK, elem_err,
                        jnp.where((use_str & ov) | pool_ov,
                                  ik.ERR_CAPACITY, ERR_OK)))
            st = jax.tree.map(lambda a, b: jnp.where(in_range & (err == ERR_OK),
                                                     b, a), st, st2)
            err = jnp.where((err == ERR_OK) & (step_err != ERR_OK),
                            step_err, err)
            return st, err

        st, err = jax.lax.fori_loop(
            0, jnp.clip(jnp.asarray(count), 0, cfg.max_list), body,
            (st, jnp.int32(ERR_OK)))
        err = jnp.where(count > cfg.max_list, ERR_HOST, err)
        st = st._replace(pool_top=jnp.where(err == ERR_OK,
                                            pool_base + count, st.pool_top))
        return st, pool_base, jnp.asarray(count, jnp.int32), err.astype(jnp.int32)

    def resolve_list_operand(st: VMInstance, base):
        """Resolve a vspec that must yield a list → (st', pool_off, count, err)."""
        val, kind = resolve_vspec(st, base)
        is_literal = kind == isa.VK_LIST
        st2, lit_off, lit_cnt, lit_err = materialize_list(
            st, axu(base + 1),
            jnp.where(is_literal, axu(base + 2), 0))
        # pick literal vs looked-up list
        pool_off = jnp.where(is_literal, lit_off, val.pool_off)
        count = jnp.where(is_literal, lit_cnt, val.pool_len)
        err = jnp.where(is_literal, lit_err,
                        jnp.where(val.err != ERR_OK, val.err,
                                  jnp.where(val.vtype != T_LIST,
                                            ik.ERR_ASSERT, ERR_OK)))
        st = jax.tree.map(lambda a, b: jnp.where(is_literal, b, a), st, st2)
        return st, pool_off, count, err.astype(jnp.int32)

    def interp_name(st: VMInstance, off, ln, literal: bool = False):
        """Resolve an output_name template to key bytes (must be a string).

        ``literal`` is a trace-time flag: literal names skip the
        interpolation kernel entirely (compiler-proved brace-free)."""
        if literal:
            buf, length = tmpl(off, ln)
            return buf, length, jnp.int32(ERR_OK)
        r = interp_tmpl(st, off, ln)
        buf, length, verr = ik.value_to_bytes(r, MS)
        err = jnp.where(r.err != ERR_OK, r.err, verr)
        return buf, length, err.astype(jnp.int32)

    def set_value(st: VMInstance, name_buf, name_len, val: Value):
        """Store a resolved value under a key; returns (st', err)."""
        # string payloads move into the arena
        st2, soff, sov = arena_write(st, val.buf, val.length, cfg)
        use_str = val.vtype == T_STR
        st2 = st2._replace(
            arena=jnp.where(use_str, st2.arena, st.arena),
            arena_top=jnp.where(use_str, st2.arena_top, st.arena_top))
        voff = jnp.where(val.vtype == T_STR, soff,
                         jnp.where(val.vtype == T_LIST, val.pool_off, 0))
        vlen = jnp.where(val.vtype == T_STR, val.length,
                         jnp.where(val.vtype == T_LIST, val.pool_len, 0))
        st3, set_ov = store_set(st2, name_buf, name_len, val.vtype, val.vint,
                                voff, vlen, cfg)
        err = jnp.where(val.err != ERR_OK, val.err,
                        jnp.where((use_str & sov) | set_ov,
                                  ik.ERR_CAPACITY, ERR_OK))
        return st3, err.astype(jnp.int32)

    def advance(st: VMInstance, err, new_st: VMInstance, jump_pc=None):
        """Commit new_st and advance pc on success; park on error."""
        ok = err == ERR_OK
        committed = jax.tree.map(lambda a, b: jnp.where(ok, b, a), st, new_st)
        next_pc = st.pc + 1 if jump_pc is None else jump_pc
        return committed._replace(
            pc=jnp.where(ok, next_pc, st.pc),
            status=jnp.where(ok, committed.status, PARKED),
            park_kind=jnp.where(ok, committed.park_kind, PARK_HOST_OP),
            park_arg=jnp.where(ok, committed.park_arg, st.pc),
            steps=st.steps + 1,
            last_err=jnp.asarray(err, jnp.int32),
        )

    def pool_elem_value(st: VMInstance, idx) -> Value:
        idx = jnp.clip(idx, 0, cfg.pool_size - 1)
        et = st.pool_type[idx]
        buf, ln = _arena(st, st.pool_off[idx], st.pool_len[idx])
        return Value(jnp.int32(ERR_OK), et, st.pool_int[idx],
                     jnp.where(et == T_STR, buf, jnp.zeros_like(buf)),
                     jnp.where(et == T_STR, ln, 0),
                     jnp.int32(0), jnp.int32(0))

    def _arena(st, off, ln):
        off = jnp.clip(off, 0, cfg.arena_size - MS)
        chunk = jax.lax.dynamic_slice(st.arena, (off,), (MS,))
        return bs.normalize(chunk, ln), jnp.asarray(ln, jnp.int32)

    def value_as_str(val: Value):
        buf, ln, verr = ik.value_to_bytes(
            ik.InterpResult(val.err, val.vtype, val.vint, val.buf, val.length,
                            val.pool_off, val.pool_len), MS)
        err = jnp.where(val.err != ERR_OK, val.err, verr)
        return buf, ln, err.astype(jnp.int32)

    # =====================================================================
    # handlers — signature: (st, a, b, c) -> st
    # =====================================================================

    def h_halt(st, a, b, c):
        return st._replace(status=jnp.where(st.status == RUNNING, DONE,
                                            st.status))

    def h_nop(st, a, b, c):
        return st._replace(pc=st.pc + 1, steps=st.steps + 1)

    def h_print(st, a, b, c):
        val, _ = resolve_vspec(st, a)
        sbuf, slen, verr = value_as_str(val)
        # ints/lists through print crash or defer in the reference → host
        verr = jnp.where((val.err == ERR_OK) & (val.vtype != T_STR),
                         ERR_HOST, verr)
        ubuf, ulen = bs.unescape_braces(sbuf, slen)
        new_out, new_len, ov = _append_out(st, ubuf, ulen)
        err = jnp.where(verr != ERR_OK, verr,
                        jnp.where(ov, ik.ERR_CAPACITY, ERR_OK))
        return advance(st, err, st._replace(out=new_out, out_len=new_len))

    def _append_out(st, buf, ln):
        O = cfg.out_size
        pos = bs.positions(O)
        shifted = bs.shift_right(bs._fit(buf, O), st.out_len)
        merged = jnp.where((pos >= st.out_len) & (pos < st.out_len + ln),
                           shifted, st.out).astype(jnp.uint8)
        total = st.out_len + ln
        # ln beyond the payload buffer would append nulls → overflow
        over = (total > O) | (ln > buf.shape[0])
        return merged, jnp.minimum(total, O), over

    def make_h_set(literal_name: bool):
        def h_set(st, a, b, c):
            nbuf, nlen, nerr = interp_name(st, axu(a), axu(a + 1),
                                           literal_name)
            val, kind = resolve_vspec(st, a + 2)
            is_literal_list = kind == isa.VK_LIST
            st2, lit_off, lit_cnt, lit_err = materialize_list(
            st, axu(a + 3), jnp.where(is_literal_list, axu(a + 4), 0))
            st_use = jax.tree.map(lambda x, y: jnp.where(is_literal_list, y, x),
                              st, st2)
            val = Value(
            err=jnp.where(is_literal_list, lit_err, val.err),
            vtype=jnp.where(is_literal_list, T_LIST, val.vtype),
            vint=val.vint, buf=val.buf, length=val.length,
            pool_off=jnp.where(is_literal_list, lit_off, val.pool_off),
            pool_len=jnp.where(is_literal_list, lit_cnt, val.pool_len))
            st3, serr = set_value(st_use, nbuf, nlen, val)
            err = jnp.where(nerr != ERR_OK, nerr,
                            jnp.where(val.err != ERR_OK, val.err, serr))
            return advance(st, err, st3)
        return h_set

    def h_unescape(st, a, b, c):
        nbuf, nlen, nerr = interp_name(st, axu(a), axu(a + 1))
        kind = axu(a + 2)
        x, y = axu(a + 3), axu(a + 4)
        is_str_kind = kind == isa.VK_STR
        is_int_kind = kind == isa.VK_INT

        # string templates: interp (task level) → unescape → interp → store
        # (use a safe offset when the vspec is not a string)
        s_off = jnp.where(is_str_kind, x, 0)
        s_len = jnp.where(is_str_kind, y, 0)
        first = interp_tmpl(st, s_off, s_len)
        is_str_val = first.vtype == T_STR
        ubuf, ulen = bs.unescape_braces(first.buf, first.length)
        second = ik.interpolate(st, ubuf, ulen, cfg)
        val_str = res_to_value(second)
        val_str = val_str._replace(
            err=jnp.where(first.err != ERR_OK, first.err, val_str.err))
        # the first interp may already yield a non-string (simple key):
        # unescape is a no-op on non-strings, the value passes through
        val_pass = res_to_value(first)
        val = jax.tree.map(lambda sv, pv: jnp.where(is_str_val, sv, pv),
                           val_str, val_pass)
        # int literals store directly; list literals / host shapes defer
        val_int = Value(jnp.int32(ERR_OK), jnp.int32(T_INT), x,
                        jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                        jnp.int32(0), jnp.int32(0))
        val = jax.tree.map(lambda sv, iv: jnp.where(is_str_kind, sv, iv),
                           val, val_int)
        val = val._replace(err=jnp.where(
            is_str_kind | is_int_kind, val.err, jnp.int32(ERR_HOST)))
        st3, serr = set_value(st, nbuf, nlen, val)
        err = jnp.where(nerr != ERR_OK, nerr,
                        jnp.where(val.err != ERR_OK, val.err, serr))
        return advance(st, err, st3)

    def h_clear(st, a, b, c):
        return advance(st, jnp.int32(ERR_OK),
                       st._replace(out=jnp.zeros_like(st.out),
                                   out_len=jnp.int32(0)))

    def h_sleep(st, a, b, c):
        # batched VM runs sleep as a zero-time tick (timing is host policy)
        return st._replace(pc=st.pc + 1, steps=st.steps + 1)

    def h_goto(st, a, b, c):
        return advance(st, jnp.int32(ERR_OK), st, jump_pc=jnp.asarray(a))

    def _resolve_label(scope_id, name_buf, name_len, own_pc):
        """Dynamic label lookup; CONTINUE → own_pc + 1.

        The hash hit is byte-verified against the label's interned name (a
        dynamic target string could otherwise alias a label via a crafted
        hash collision); intra-scope label collisions are rejected at
        compile time, so verifying the single hit row suffices.
        """
        labels = _T["labels"]
        h = fnv1a(name_buf, name_len)
        cont = jnp.zeros((MS,), jnp.uint8).at[:8].set(
            jnp.array(list(b"CONTINUE"), jnp.uint8))
        is_continue = bs.equal(name_buf, name_len, cont, jnp.int32(8))
        hit = (labels[:, 0] == scope_id) & \
              (labels[:, 1].astype(jnp.uint32) == h)
        row = jnp.argmax(hit)
        stored_buf, stored_len = tmpl(labels[row, 3], labels[row, 4])
        # name_len > 0 also rejects the zero pad rows of the label table
        found = jnp.any(hit) & (name_len > 0) & \
            bs.equal(name_buf, name_len, stored_buf, stored_len)
        target = labels[row, 2]
        pc = jnp.where(is_continue, own_pc + 1,
                       jnp.where(found, target, -1))
        return pc.astype(jnp.int32), is_continue

    def h_goto_map(st, a, b, c):
        text_r = interp_tmpl(st, axu(a), axu(a + 1))
        scope_id = axu(a + 2)
        tbuf, tlen, tverr = ik.value_to_bytes(text_r, MS)
        interp_error = text_r.err == ERR_MISSING
        # other text errors (assert/capacity/host) go to host
        hard_err = jnp.where(
            (text_r.err != ERR_OK) & ~interp_error, text_r.err,
            jnp.where(~interp_error & (tverr != ERR_OK), tverr, ERR_OK))

        NULL = jnp.zeros((MS,), jnp.uint8).at[:4].set(
            jnp.array(list(b"NULL"), jnp.uint8))

        # the reference interpolates EVERY key and EVERY value eagerly before
        # matching (interpolation_engine.py:1696-1697), so errors in unchosen
        # entries also propagate
        def body(e, carry):
            (matched, tgt_buf, tgt_len, null_buf, null_len, has_null,
             err) = carry
            base = a + 3 + 5 * e
            in_range = e < b
            key_r = interp_tmpl(st, axu(base), axu(base + 1))
            kbuf, klen, kerr = ik.value_to_bytes(key_r, MS)
            kerr = jnp.where(key_r.err != ERR_OK, key_r.err, kerr)
            val_r = interp_tmpl(st, axu(base + 2), axu(base + 3))
            vbuf, vlen, verr = ik.value_to_bytes(val_r, MS)
            verr = jnp.where(val_r.err != ERR_OK, val_r.err, verr)
            is_null = bs.equal(kbuf, klen, NULL, jnp.int32(4))
            m = mk.wildcard_match(kbuf, klen, tbuf, tlen, cfg.max_stars)
            hit = in_range & m.ok & ~matched & ~interp_error
            unsupported = in_range & ~m.supported
            err = jnp.where(in_range & (err == ERR_OK),
                            jnp.where(kerr != ERR_OK, kerr,
                                      jnp.where(verr != ERR_OK, verr,
                                                jnp.where(unsupported,
                                                          ERR_HOST, ERR_OK))),
                            err)
            tgt_buf = jnp.where(hit, vbuf, tgt_buf)
            tgt_len = jnp.where(hit, vlen, tgt_len)
            matched = matched | hit
            first_null = in_range & is_null & ~has_null
            null_buf = jnp.where(first_null, vbuf, null_buf)
            null_len = jnp.where(first_null, vlen, null_len)
            has_null = has_null | (in_range & is_null)
            return (matched, tgt_buf, tgt_len, null_buf, null_len, has_null,
                    err)

        zero = jnp.zeros((MS,), jnp.uint8)
        init = (jnp.bool_(False), zero, jnp.int32(0), zero,
                jnp.int32(0), jnp.bool_(False), jnp.int32(ERR_OK))
        matched, tgt_buf, tgt_len, null_buf, null_len, has_null, loop_err = \
            jax.lax.fori_loop(0, jnp.minimum(jnp.asarray(b), 32), body, init)
        loop_err = jnp.where(b > 32, ERR_HOST, loop_err)

        use_null = interp_error
        gbuf = jnp.where(use_null, null_buf, tgt_buf)
        glen = jnp.where(use_null, null_len, tgt_len)

        jump, is_continue = _resolve_label(scope_id, gbuf, glen, st.pc)

        err = jnp.where(hard_err != ERR_OK, hard_err,
              jnp.where(loop_err != ERR_OK, loop_err,
              jnp.where(use_null & ~has_null, ik.ERR_ASSERT,
              jnp.where(~use_null & ~matched, ik.ERR_ASSERT,
              jnp.where(jump < 0, ik.ERR_ASSERT, ERR_OK)))))
        return advance(st, err, st, jump_pc=jump)

    def h_math(st, a, b, c):
        # double interpolation: the task-level recursive_interpolate plus
        # eval_math's own interpolate (reference :903)
        first = interp_tmpl(st, axu(a), axu(a + 1))
        fbuf, flen, ferr = ik.value_to_bytes(first, MS)
        ferr = jnp.where(first.err != ERR_OK, first.err, ferr)
        second = ik.interpolate(st, fbuf, flen, cfg)
        sbuf, slen, serr = ik.value_to_bytes(second, MS)
        serr = jnp.where(second.err != ERR_OK, second.err, serr)
        res = mak.eval_math_bytes(st, sbuf, slen, cfg)
        nbuf, nlen, nerr = interp_name(st, axu(a + 2), axu(a + 3))
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_INT), res.value,
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0))
        st2, seterr = set_value(st, nbuf, nlen, val)
        err = jnp.where(ferr != ERR_OK, ferr,
              jnp.where(serr != ERR_OK, serr,
              jnp.where(res.err != ERR_OK, res.err,
              jnp.where(nerr != ERR_OK, nerr, seterr))))
        return advance(st, err, st2)

    def h_print_lit(st, a, b, c):
        """print of a brace-free literal: no interpolation kernel at all."""
        sbuf, slen = tmpl(axu(a), axu(a + 1))
        ubuf, ulen = bs.unescape_braces(sbuf, slen)
        new_out, new_len, ov = _append_out(st, ubuf, ulen)
        err = jnp.where(ov, ik.ERR_CAPACITY, ERR_OK)
        return advance(st, err, st._replace(out=new_out, out_len=new_len))

    def h_goto_map_lit(st, a, b, c):
        """goto_map whose keys and targets are all literal: only the text
        interpolates; per-entry work is one wildcard match on raw bytes."""
        text_r = interp_tmpl(st, axu(a), axu(a + 1))
        scope_id = axu(a + 2)
        tbuf, tlen, tverr = ik.value_to_bytes(text_r, MS)
        interp_error = text_r.err == ERR_MISSING
        hard_err = jnp.where(
            (text_r.err != ERR_OK) & ~interp_error, text_r.err,
            jnp.where(~interp_error & (tverr != ERR_OK), tverr, ERR_OK))

        NULL = jnp.zeros((MS,), jnp.uint8).at[:4].set(
            jnp.array(list(b"NULL"), jnp.uint8))

        def body(e, carry):
            matched, tgt_off, tgt_len, null_off, null_len, has_null, err = carry
            base = a + 3 + 5 * e
            in_range = e < b
            kbuf, klen = tmpl(axu(base), axu(base + 1))
            is_null = bs.equal(kbuf, klen, NULL, jnp.int32(4))
            m = mk.wildcard_match(kbuf, klen, tbuf, tlen, cfg.max_stars)
            hit = in_range & m.ok & ~matched & ~interp_error
            unsupported = in_range & ~m.supported
            err = jnp.where(in_range & (err == ERR_OK) & unsupported,
                            ERR_HOST, err)
            tgt_off = jnp.where(hit, axu(base + 2), tgt_off)
            tgt_len = jnp.where(hit, axu(base + 3), tgt_len)
            matched = matched | hit
            first_null = in_range & is_null & ~has_null
            null_off = jnp.where(first_null, axu(base + 2), null_off)
            null_len = jnp.where(first_null, axu(base + 3), null_len)
            has_null = has_null | (in_range & is_null)
            return matched, tgt_off, tgt_len, null_off, null_len, has_null, err

        init = (jnp.bool_(False), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), jnp.bool_(False), jnp.int32(ERR_OK))
        matched, tgt_off, tgt_len, null_off, null_len, has_null, loop_err = \
            jax.lax.fori_loop(0, jnp.minimum(jnp.asarray(b), 32), body, init)
        loop_err = jnp.where(b > 32, ERR_HOST, loop_err)

        use_null = interp_error
        goff = jnp.where(use_null, null_off, tgt_off)
        glen_ = jnp.where(use_null, null_len, tgt_len)
        gbuf, glen = tmpl(goff, glen_)

        jump, is_continue = _resolve_label(scope_id, gbuf, glen, st.pc)

        err = jnp.where(hard_err != ERR_OK, hard_err,
              jnp.where(loop_err != ERR_OK, loop_err,
              jnp.where(use_null & ~has_null, ik.ERR_ASSERT,
              jnp.where(~use_null & ~matched, ik.ERR_ASSERT,
              jnp.where(jump < 0, ik.ERR_ASSERT, ERR_OK)))))
        return advance(st, err, st, jump_pc=jump)

    def make_h_math_rpn(literal_name: bool):
      def h_math_rpn(st, a, b, c):
        """Statically-compiled math: a short RPN program over int32.

        All leaves are direct store lookups (holes are simple keys by
        construction), so the whole evaluation is ~n_entries cheap vector
        ops — versus the byte evaluator's per-byte while loop.
        """
        nbuf, nlen, nerr = interp_name(st, axu(a), axu(a + 1), literal_name)
        n_entries = axu(a + 2)
        STACK = 8

        def list_reduce(val, want_max):
            base, cnt = val.pool_off, val.pool_len
            pos = bs.positions(cfg.pool_size)
            in_span = (pos >= base) & (pos < base + cnt)
            is_int = st.pool_type == T_INT
            ok = (val.err == ERR_OK) & (val.vtype == T_LIST) & (cnt > 0) & \
                jnp.all(~in_span | is_int)
            big = jnp.int32(2**31 - 1)
            mn = jnp.min(jnp.where(in_span & is_int, st.pool_int, big))
            mx = jnp.max(jnp.where(in_span & is_int, st.pool_int, -big))
            value = jnp.where(want_max, mx, mn)
            # string lists defer to host; wrong types error like the host
            err = jnp.where(val.err != ERR_OK, val.err,
                  jnp.where(val.vtype != T_LIST, ik.ERR_ASSERT,
                  jnp.where(cnt == 0, ik.ERR_ASSERT,
                  jnp.where(~jnp.all(~in_span | is_int), ERR_HOST, ERR_OK))))
            return value, err.astype(jnp.int32)

        def body(i, carry):
            stack, sp, err = carry
            base = a + 3 + 3 * i
            kind = axu(base)
            x = axu(base + 1)
            y = axu(base + 2)

            is_leaf_key = (kind == isa.RPN_HOLE) | (kind == isa.RPN_LENGTH) | \
                (kind == isa.RPN_MINLIST) | (kind == isa.RPN_MAXLIST)
            kbuf, klen = tmpl(jnp.where(is_leaf_key, x, 0),
                              jnp.where(is_leaf_key, y, 0))
            looked = ik.lookup(st, kbuf, klen, cfg)
            mn_val, mn_err = list_reduce(looked, jnp.bool_(False))
            mx_val, mx_err = list_reduce(looked, jnp.bool_(True))

            hole_ok = (looked.err == ERR_OK) & (looked.vtype == T_INT)
            # digit-string values also count as ints (reference: the text is
            # re-parsed after interpolation)
            parsed, parse_ok = bs.bytes_to_int(looked.buf, looked.length)
            hole_val = jnp.where(looked.vtype == T_INT, looked.vint, parsed)
            hole_err = jnp.where(looked.err != ERR_OK, looked.err,
                       jnp.where(looked.vtype == T_INT, ERR_OK,
                       jnp.where((looked.vtype == T_STR) & parse_ok, ERR_OK,
                                 ERR_HOST)))
            len_err = jnp.where(looked.err != ERR_OK, looked.err,
                                jnp.where(looked.vtype != T_LIST,
                                          ik.ERR_ASSERT, ERR_OK))

            is_leaf = is_leaf_key | (kind == isa.RPN_CONST)
            leaf_val = jnp.where(kind == isa.RPN_CONST, x,
                       jnp.where(kind == isa.RPN_HOLE, hole_val,
                       jnp.where(kind == isa.RPN_LENGTH, looked.pool_len,
                       jnp.where(kind == isa.RPN_MINLIST, mn_val, mx_val))))
            leaf_err = jnp.where(kind == isa.RPN_CONST, ERR_OK,
                       jnp.where(kind == isa.RPN_HOLE, hole_err,
                       jnp.where(kind == isa.RPN_LENGTH, len_err,
                       jnp.where(kind == isa.RPN_MINLIST, mn_err, mx_err))))

            top = stack[jnp.clip(sp - 1, 0, STACK - 1)]
            snd = stack[jnp.clip(sp - 2, 0, STACK - 1)]
            safe_top = jnp.where(top == 0, 1, top)
            exact = (snd % safe_top) == 0
            bin_val = jnp.where(kind == isa.RPN_ADD, snd + top,
                      jnp.where(kind == isa.RPN_SUB, snd - top,
                      jnp.where(kind == isa.RPN_MUL, snd * top,
                      jnp.where(kind == isa.RPN_DIV, snd // safe_top,
                      jnp.where(kind == isa.RPN_MOD, snd % safe_top,
                      jnp.where(kind == isa.RPN_MIN2, jnp.minimum(snd, top),
                                jnp.maximum(snd, top)))))))
            bin_err = jnp.where((kind == isa.RPN_DIV) & ~exact, ERR_HOST,
                      jnp.where(((kind == isa.RPN_DIV) | (kind == isa.RPN_MOD))
                                & (top == 0), ik.ERR_ASSERT, ERR_OK))
            is_unary = (kind == isa.RPN_NEG) | (kind == isa.RPN_SIGN)
            un_val = jnp.where(kind == isa.RPN_NEG, -top, jnp.sign(top))

            new_val = jnp.where(is_leaf, leaf_val,
                                jnp.where(is_unary, un_val, bin_val))
            new_sp = jnp.where(is_leaf, sp + 1, jnp.where(is_unary, sp, sp - 1))
            write_at = jnp.clip(new_sp - 1, 0, STACK - 1)
            from .state import _masked_slot_update as _msu
            stack = _msu(stack, write_at, new_val)
            step_err = jnp.where(is_leaf, leaf_err,
                                 jnp.where(is_unary, ERR_OK, bin_err))
            err = jnp.where((err == ERR_OK) & (step_err != ERR_OK),
                            step_err.astype(jnp.int32), err)
            return stack, new_sp, err

        stack, sp, err = jax.lax.fori_loop(
            0, jnp.clip(n_entries, 0, 24), body,
            (jnp.zeros((STACK,), jnp.int32), jnp.int32(0), jnp.int32(ERR_OK)))
        result = stack[0]
        err = jnp.where((err == ERR_OK) & (sp != 1), ik.ERR_ASSERT, err)

        val = Value(jnp.int32(ERR_OK), jnp.int32(T_INT), result,
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    jnp.int32(0), jnp.int32(0))
        st2, seterr = set_value(st, nbuf, nlen, val)
        err = jnp.where(nerr != ERR_OK, nerr,
                        jnp.where(err != ERR_OK, err, seterr))
        return advance(st, err, st2)
      return h_math_rpn

    # ---- list ops -----------------------------------------------------------

    def h_list_join(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        before = interp_tmpl(st1, axu(a + 3), axu(a + 4))
        between = interp_tmpl(st1, axu(a + 5), axu(a + 6))
        after = interp_tmpl(st1, axu(a + 7), axu(a + 8))
        bbuf, blen, berr = ik.value_to_bytes(before, MS)
        tbuf, tlen, terr = ik.value_to_bytes(between, MS)
        abuf, alen, aerr = ik.value_to_bytes(after, MS)
        strerr = jnp.where(before.err != ERR_OK, before.err,
                 jnp.where(between.err != ERR_OK, between.err,
                 jnp.where(after.err != ERR_OK, after.err,
                 jnp.where(berr != ERR_OK, berr,
                 jnp.where(terr != ERR_OK, terr, aerr)))))

        def body(i, carry):
            buf, ln, err = carry
            in_range = i < lcnt
            ev = pool_elem_value(st1, lbase + i)
            # join requires string elements (reference TypeError otherwise)
            eerr = jnp.where(ev.vtype != T_STR, ERR_HOST, ERR_OK)
            buf2, ln2, ov1 = bs.concat(buf, ln, tbuf,
                                       jnp.where(i > 0, tlen, 0), MS)
            buf3, ln3, ov2 = bs.concat(buf2, ln2, ev.buf, ev.length, MS)
            step_err = jnp.where(eerr != ERR_OK, eerr,
                                 jnp.where(ov1 | ov2, ik.ERR_CAPACITY, ERR_OK))
            buf = jnp.where(in_range & (err == ERR_OK), buf3, buf)
            ln = jnp.where(in_range & (err == ERR_OK), ln3, ln)
            err = jnp.where(in_range & (err == ERR_OK) & (step_err != ERR_OK),
                            step_err, err)
            return buf, ln, err

        mid_buf, mid_len, join_err = jax.lax.fori_loop(
            0, cfg.max_list, body,
            (jnp.zeros((MS,), jnp.uint8), jnp.int32(0), jnp.int32(ERR_OK)))
        join_err = jnp.where(lcnt > cfg.max_list, ERR_HOST, join_err)

        out1, l1, ov1 = bs.concat(bbuf, blen, mid_buf, mid_len, MS)
        out2, l2, ov2 = bs.concat(out1, l1, abuf, alen, MS)

        nbuf, nlen, nerr = interp_name(st1, axu(a + 9), axu(a + 10))
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_STR), jnp.int32(0),
                    out2, l2, jnp.int32(0), jnp.int32(0))
        st2, seterr = set_value(st1, nbuf, nlen, val)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(strerr != ERR_OK, strerr,
              jnp.where(join_err != ERR_OK, join_err,
              jnp.where(ov1 | ov2, ik.ERR_CAPACITY,
              jnp.where(nerr != ERR_OK, nerr, seterr)))))
        return advance(st, err, st2)

    def _copy_list_span(st, src_base, count, skip_idx=None):
        """Copy pool descriptors [src_base, src_base+count) to the pool top,
        optionally skipping one index; returns (st', new_base, new_count, err).

        Vectorized: a masked gather over the whole pool (a per-element
        scatter loop would serialize on TPU)."""
        dst_base = st.pool_top
        L = cfg.pool_size
        pos = bs.positions(L)
        j = pos - dst_base  # element ordinal landing at this dest slot
        if skip_idx is None:
            shift = jnp.zeros((L,), jnp.int32)
            out_count = jnp.asarray(count, jnp.int32)
        else:
            has_skip = (skip_idx >= 0) & (skip_idx < count)
            shift = jnp.where(has_skip & (j >= skip_idx), 1, 0)
            out_count = jnp.asarray(count, jnp.int32) - \
                jnp.where(has_skip, 1, 0)
        src = jnp.clip(src_base + j + shift, 0, L - 1)
        valid = (j >= 0) & (j < out_count)
        st = st._replace(
            pool_type=jnp.where(valid, st.pool_type[src], st.pool_type),
            pool_int=jnp.where(valid, st.pool_int[src], st.pool_int),
            pool_off=jnp.where(valid, st.pool_off[src], st.pool_off),
            pool_len=jnp.where(valid, st.pool_len[src], st.pool_len),
        )
        overflow = dst_base + out_count > L
        err = jnp.where(count > cfg.max_list, ERR_HOST,
                        jnp.where(overflow, ik.ERR_CAPACITY, ERR_OK))
        n_written = jnp.where(overflow, 0, out_count)
        st = st._replace(pool_top=jnp.where(err == ERR_OK,
                                            dst_base + n_written, st.pool_top))
        return st, dst_base, n_written, err.astype(jnp.int32)

    def h_list_append(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        item, ikind = resolve_vspec(st1, a + 3)
        item_err = jnp.where(item.vtype == T_LIST, ERR_HOST, item.err)
        st2, new_base, new_cnt, cerr = _copy_list_span(st1, lbase, lcnt)
        # append the item
        st3, ioff, iov = arena_write(st2, item.buf, item.length, cfg)
        use_str = item.vtype == T_STR
        st3 = st3._replace(
            arena=jnp.where(use_str, st3.arena, st2.arena),
            arena_top=jnp.where(use_str, st3.arena_top, st2.arena_top))
        from .state import _masked_slot_update as _msu
        dst = jnp.clip(new_base + new_cnt, 0, cfg.pool_size - 1)
        pool_ov = (new_base + new_cnt) >= cfg.pool_size
        st3 = st3._replace(
            pool_type=_msu(st3.pool_type, dst, item.vtype),
            pool_int=_msu(st3.pool_int, dst, item.vint),
            pool_off=_msu(st3.pool_off, dst, jnp.where(use_str, ioff, 0)),
            pool_len=_msu(st3.pool_len, dst, item.length),
            pool_top=new_base + new_cnt + 1,
        )
        nbuf, nlen, nerr = interp_name(st3, axu(a + 6), axu(a + 7))
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_LIST), jnp.int32(0),
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    new_base, new_cnt + 1)
        st4, seterr = set_value(st3, nbuf, nlen, val)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(item_err != ERR_OK, item_err,
              jnp.where(cerr != ERR_OK, cerr,
              jnp.where((use_str & iov) | pool_ov, ik.ERR_CAPACITY,
              jnp.where(nerr != ERR_OK, nerr, seterr)))))
        return advance(st, err, st4)

    def _values_equal(st, ev: Value, item: Value):
        both_int = (ev.vtype == T_INT) & (item.vtype == T_INT)
        both_str = (ev.vtype == T_STR) & (item.vtype == T_STR)
        int_eq = both_int & (ev.vint == item.vint)
        str_eq = both_str & bs.equal(ev.buf, ev.length, item.buf, item.length)
        return int_eq | str_eq

    def h_list_remove(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        item, _ = resolve_vspec(st1, a + 3)
        item_err = jnp.where(item.vtype == T_LIST, ERR_HOST, item.err)

        # find first equal element
        def find_body(i, carry):
            found_idx = carry
            ev = pool_elem_value(st1, lbase + i)
            eq = (i < lcnt) & _values_equal(st1, ev, item) & (found_idx < 0)
            return jnp.where(eq, i, found_idx)

        found_idx = jax.lax.fori_loop(0, cfg.max_list, find_body,
                                      jnp.int32(-1))
        st2, new_base, new_cnt, cerr = _copy_list_span(
            st1, lbase, lcnt, skip_idx=jnp.where(found_idx < 0, -999,
                                                 found_idx))
        nbuf, nlen, nerr = interp_name(st2, axu(a + 6), axu(a + 7))
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_LIST), jnp.int32(0),
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    new_base, new_cnt)
        st3, seterr = set_value(st2, nbuf, nlen, val)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(item_err != ERR_OK, item_err,
              jnp.where(cerr != ERR_OK, cerr,
              jnp.where(nerr != ERR_OK, nerr, seterr))))
        return advance(st, err, st3)

    def h_list_concat(st, a, b, c):
        nbuf, nlen, nerr = interp_name(st, axu(a), axu(a + 1))
        dst_base = st.pool_top

        def body(li, carry):
            st, total, err = carry
            base = a + 2 + 3 * li
            in_range = li < b
            st1, lb, lc, lerr = resolve_list_operand(st, base)
            st2, _, copied, cerr = _copy_list_span(st1, lb, lc)
            step_err = jnp.where(lerr != ERR_OK, lerr, cerr)
            do = in_range & (err == ERR_OK)
            st = jax.tree.map(lambda x, y: jnp.where(do, y, x), st, st2)
            total = jnp.where(do & (step_err == ERR_OK), total + copied, total)
            err = jnp.where(do & (step_err != ERR_OK), step_err, err)
            return st, total, err

        MAX_CONCAT = 8
        st1, total, err0 = jax.lax.fori_loop(
            0, jnp.minimum(jnp.asarray(b), MAX_CONCAT), body,
            (st, jnp.int32(0), jnp.int32(ERR_OK)))
        err0 = jnp.where(b > MAX_CONCAT, ERR_HOST, err0)
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_LIST), jnp.int32(0),
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    dst_base, total)
        st2, seterr = set_value(st1, nbuf, nlen, val)
        err = jnp.where(nerr != ERR_OK, nerr,
                        jnp.where(err0 != ERR_OK, err0, seterr))
        return advance(st, err, st2)

    def h_list_index(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        idx_val, _ = resolve_vspec(st1, a + 3)
        parsed, parse_ok = bs.bytes_to_int(idx_val.buf, idx_val.length)
        index = jnp.where(idx_val.vtype == T_INT, idx_val.vint, parsed)
        idx_err = jnp.where(idx_val.err != ERR_OK, idx_val.err,
                  jnp.where((idx_val.vtype == T_STR) & ~parse_ok, ERR_HOST,
                  jnp.where(idx_val.vtype == T_LIST, ERR_HOST, ERR_OK)))
        py_idx = jnp.where(index > 0, index - 1,
                           jnp.where(index < 0, lcnt + index, -1))
        bounds_err = jnp.where((index == 0) | (py_idx < 0) | (py_idx >= lcnt),
                               ik.ERR_ASSERT, ERR_OK)
        ev = pool_elem_value(st1, lbase + py_idx)
        nbuf, nlen, nerr = interp_name(st1, axu(a + 6), axu(a + 7))
        st2, seterr = set_value(st1, nbuf, nlen, ev)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(idx_err != ERR_OK, idx_err,
              jnp.where(bounds_err != ERR_OK, bounds_err,
              jnp.where(nerr != ERR_OK, nerr, seterr))))
        return advance(st, err, st2)

    def _slice_index(index, lcnt, right: bool):
        """The reference's 1-based slice bound (quirks preserved)."""
        return jnp.where(index > 0, index - 1,
               jnp.where(index < 0, lcnt + index,
                         jnp.where(right, 0, -10**6)))

    def _math_operand(st, val: Value):
        """from_index/to_index: int passthrough or eval_math on strings
        (eval_math interpolates its input again — reference :903)."""
        second = ik.interpolate(st, val.buf, val.length, cfg)
        sbuf, slen, serr = ik.value_to_bytes(second, MS)
        res2 = mak.eval_math_bytes(st, sbuf, slen, cfg)
        is_str = val.vtype == T_STR
        value = jnp.where(is_str, res2.value, val.vint)
        err = jnp.where(val.err != ERR_OK, val.err,
              jnp.where(is_str & (second.err != ERR_OK), second.err,
              jnp.where(is_str & (serr != ERR_OK), serr,
              jnp.where(is_str & (res2.err != ERR_OK), res2.err,
              jnp.where(val.vtype == T_LIST, ERR_HOST, ERR_OK)))))
        return value, err.astype(jnp.int32)

    def h_list_slice(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        from_val, _ = resolve_vspec(st1, a + 3)
        to_val, _ = resolve_vspec(st1, a + 6)
        from_i, ferr = _math_operand(st1, from_val)
        to_i, terr = _math_operand(st1, to_val)
        start = _slice_index(from_i, lcnt, right=False)
        end = _slice_index(to_i, lcnt, right=True) + 1
        # Python slice clamping
        start_c = jnp.clip(start, 0, lcnt)
        end_c = jnp.clip(end, 0, lcnt)
        zero_err = jnp.where(from_i == 0, ik.ERR_ASSERT, ERR_OK)
        count = jnp.maximum(end_c - start_c, 0)
        st2, new_base, new_cnt, cerr = _copy_list_span(
            st1, lbase + start_c, count)
        nbuf, nlen, nerr = interp_name(st2, axu(a + 9), axu(a + 10))
        val = Value(jnp.int32(ERR_OK), jnp.int32(T_LIST), jnp.int32(0),
                    jnp.zeros((MS,), jnp.uint8), jnp.int32(0),
                    new_base, new_cnt)
        st3, seterr = set_value(st2, nbuf, nlen, val)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(ferr != ERR_OK, ferr,
              jnp.where(terr != ERR_OK, terr,
              jnp.where(zero_err != ERR_OK, zero_err,
              jnp.where(cerr != ERR_OK, cerr,
              jnp.where(nerr != ERR_OK, nerr, seterr))))))
        return advance(st, err, st3)

    # ---- replace_map ------------------------------------------------------------

    def h_replace_map(st, a, b, c):
        nbuf, nlen, nerr = interp_name(st, axu(a + 3), axu(a + 4))
        repeat = axu(a + 5) == 1
        entries_base = a + 6

        item, ikind = resolve_vspec(st, a)
        # only string items on device; lists/dicts → host
        item_hard_err = jnp.where(
            (item.err == ERR_OK) & (item.vtype == T_LIST), ERR_HOST,
            jnp.where(ikind == isa.VK_LIST, ERR_HOST, ERR_OK))

        ibuf, ilen, iverr = ik.value_to_bytes(item, MS)
        # a missing key inside the item → NULL handling
        miss0 = item.err == ERR_MISSING
        hard0 = jnp.where((item.err != ERR_OK) & ~miss0, item.err,
                 jnp.where(item_hard_err != ERR_OK, item_hard_err,
                 jnp.where(~miss0 & (iverr != ERR_OK), iverr, ERR_OK)))

        def one_round(carry):
            cur_buf, cur_len, last_buf, last_len, st_c, missing, hard, \
                iters, done = carry
            # (A) re-interpolate current
            r = ik.interpolate(st_c, cur_buf, cur_len, cfg)
            rbuf, rlen, rverr = ik.value_to_bytes(r, MS)
            round_missing = r.err == ERR_MISSING
            round_hard = jnp.where((r.err != ERR_OK) & ~round_missing, r.err,
                                   jnp.where(~round_missing & (rverr != ERR_OK),
                                             rverr, ERR_OK))

            # find first matching entry
            def entry_body(e, ec):
                matched, out_buf, out_len, e_missing, e_hard, st_e = ec
                base = entries_base + 4 * e
                in_range = e < b
                key_r = ik.interpolate(st_e, *tmpl(axu(base), axu(base + 1)),
                                       cfg)
                kbuf, klen, kverr = ik.value_to_bytes(key_r, MS)
                k_missing = key_r.err == ERR_MISSING
                k_hard = jnp.where((key_r.err != ERR_OK) & ~k_missing,
                                   key_r.err,
                                   jnp.where(~k_missing & (kverr != ERR_OK),
                                             kverr, ERR_OK))
                m = mk.wildcard_match(kbuf, klen, rbuf, rlen, cfg.max_stars)
                unsupported = in_range & ~m.supported
                hit = in_range & ~matched & m.ok & ~k_missing & (k_hard == ERR_OK)

                # stage captures into a temp store: keys '1'..'9'
                def stage(st_t):
                    def cap_body(ci, stc):
                        digit = jnp.zeros((cfg.max_key,), jnp.uint8).at[0].set(
                            49 + ci)
                        cbuf, clen = bs.substring(
                            rbuf, m.cap_off[ci], m.cap_len[ci], MS)
                        stc2, coff, cov = arena_write(stc, cbuf,
                                                      m.cap_len[ci], cfg)
                        stc3, sov = store_set(
                            stc2, digit.astype(jnp.uint8), jnp.int32(1),
                            jnp.int32(T_STR), jnp.int32(0), coff,
                            m.cap_len[ci], cfg)
                        use = ci < m.n_caps
                        return jax.tree.map(
                            lambda x, y: jnp.where(use, y, x), stc, stc3)
                    return jax.lax.fori_loop(0, cfg.max_stars, cap_body, st_t)

                st_caps = stage(st_e)
                val_r = ik.interpolate(st_caps,
                                       *tmpl(axu(base + 2), axu(base + 3)),
                                       cfg)
                vbuf, vlen, vverr = ik.value_to_bytes(val_r, MS)
                v_missing = val_r.err == ERR_MISSING
                v_hard = jnp.where((val_r.err != ERR_OK) & ~v_missing,
                                   val_r.err,
                                   jnp.where(~v_missing & (vverr != ERR_OK),
                                             vverr, ERR_OK))

                out_buf = jnp.where(hit & ~v_missing & (v_hard == ERR_OK),
                                    vbuf, out_buf)
                out_len = jnp.where(hit & ~v_missing & (v_hard == ERR_OK),
                                    vlen, out_len)
                e_missing = e_missing | (in_range & ~matched & k_missing) | \
                    (hit & v_missing)
                e_hard = jnp.where(
                    (e_hard == ERR_OK) & in_range & ~matched,
                    jnp.where(k_hard != ERR_OK, k_hard,
                              jnp.where(unsupported, ERR_HOST,
                                        jnp.where(hit, v_hard, ERR_OK))),
                    e_hard)
                matched = matched | hit
                return matched, out_buf, out_len, e_missing, e_hard, st_e

            einit = (jnp.bool_(False), rbuf, rlen, jnp.bool_(False),
                     jnp.int32(ERR_OK), st_c)
            matched, out_buf, out_len, e_missing, e_hard, _ = \
                jax.lax.fori_loop(0, jnp.minimum(jnp.asarray(b), 16),
                                  entry_body, einit)
            over_entries = b > 16

            new_missing = missing | round_missing | e_missing
            new_hard = jnp.where(hard != ERR_OK, hard,
                       jnp.where(round_hard != ERR_OK, round_hard,
                       jnp.where(e_hard != ERR_OK, e_hard,
                                 jnp.where(over_entries, ERR_HOST, ERR_OK))))

            stable = bs.equal(out_buf, out_len, last_buf, last_len)
            finished = stable | ~repeat | new_missing | (new_hard != ERR_OK)
            return (out_buf, out_len, out_buf, out_len, st_c, new_missing,
                    new_hard, iters + 1, finished)

        def round_cond(carry):
            *_, missing, hard, iters, done = carry
            return ~done & (iters < cfg.max_fix)

        init = (ibuf, ilen, ibuf, ilen, st, miss0, hard0.astype(jnp.int32),
                jnp.int32(0), miss0 | (hard0 != ERR_OK))
        (fin_buf, fin_len, _, _, _, missing, hard, iters, done) = \
            jax.lax.while_loop(round_cond, one_round, init)
        # non-convergence within max_fix → host
        hard = jnp.where((hard == ERR_OK) & ~done & (iters >= cfg.max_fix),
                         ERR_HOST, hard)

        # missing → NULL raw value (uninterpolated); find the NULL entry
        NULL = jnp.zeros((MS,), jnp.uint8).at[:4].set(
            jnp.array(list(b"NULL"), jnp.uint8))

        def null_body(e, carry):
            noff, nln, has = carry
            base = entries_base + 4 * e
            in_range = e < b
            kbuf, klen = tmpl(axu(base), axu(base + 1))
            is_null = bs.equal(kbuf, klen, NULL, jnp.int32(4))
            first = in_range & is_null & ~has
            return (jnp.where(first, axu(base + 2), noff),
                    jnp.where(first, axu(base + 3), nln),
                    has | (in_range & is_null))

        null_off, null_len, has_null = jax.lax.fori_loop(
            0, jnp.minimum(jnp.asarray(b), 16), null_body,
            (jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        null_buf, null_ln = tmpl(null_off, null_len)

        hard = jnp.where(missing & ~has_null, ik.ERR_ASSERT, hard)
        use_buf = jnp.where(missing, null_buf, fin_buf)
        use_len = jnp.where(missing, null_ln, fin_len)

        # non-string items pass through recursive_replace untouched in the
        # reference (an int item is stored as-is, no matching)
        item_is_int = (item.err == ERR_OK) & (item.vtype == T_INT)
        val = Value(jnp.int32(ERR_OK),
                    jnp.where(item_is_int, T_INT, T_STR).astype(jnp.int32),
                    item.vint,
                    jnp.where(item_is_int, jnp.zeros_like(use_buf), use_buf),
                    jnp.where(item_is_int, 0, use_len),
                    jnp.int32(0), jnp.int32(0))
        hard = jnp.where(item_is_int, ERR_OK, hard)
        st2, seterr = set_value(st, nbuf, nlen, val)
        err = jnp.where(nerr != ERR_OK, nerr,
                        jnp.where(hard != ERR_OK, hard, seterr))
        return advance(st, err, st2)

    # ---- delete ------------------------------------------------------------------

    def _delete_common(st, a, b, keep_matching: bool):
        def slot_body(s, carry):
            st_c, err = carry
            occ = st_c.occ[s]
            kbuf, klen = _arena(st_c, st_c.key_off[s], st_c.key_len[s])

            def wc_body(w, wc):
                any_match, werr = wc
                in_range = w < b
                base = a + 2 * w
                wr = ik.interpolate(st_c, *tmpl(axu(base), axu(base + 1)), cfg)
                wbuf, wlen, wverr = ik.value_to_bytes(wr, MS)
                werr2 = jnp.where(wr.err != ERR_OK, wr.err, wverr)
                m = mk.wildcard_match(wbuf, wlen, kbuf, klen, cfg.max_stars)
                werr = jnp.where(in_range & (werr == ERR_OK),
                                 jnp.where(werr2 != ERR_OK, werr2,
                                           jnp.where(~m.supported, ERR_HOST,
                                                     ERR_OK)), werr)
                any_match = any_match | (in_range & m.ok)
                return any_match, werr

            any_match, werr = jax.lax.fori_loop(
                0, jnp.minimum(jnp.asarray(b), 12), wc_body,
                (jnp.bool_(False), jnp.int32(ERR_OK)))
            werr = jnp.where(b > 12, ERR_HOST, werr)
            should_delete = jnp.where(keep_matching, ~any_match, any_match)
            from .state import _masked_slot_update as _msu
            new_occ = _msu(st_c.occ, jnp.where(occ & should_delete, s, -1),
                           False)
            st_c = st_c._replace(occ=new_occ)
            err = jnp.where(occ & (werr != ERR_OK) & (err == ERR_OK),
                            werr, err)
            return st_c, err

        st2, err = jax.lax.fori_loop(0, cfg.n_slots, slot_body,
                                     (st, jnp.int32(ERR_OK)))
        return st2, err

    def h_delete(st, a, b, c):
        st2, err = _delete_common(st, a, b, keep_matching=False)
        return advance(st, err, st2)

    def h_delete_except(st, a, b, c):
        st2, err = _delete_common(st, a, b, keep_matching=True)
        return advance(st, err, st2)

    # ---- random / for / park ------------------------------------------------------

    def h_random_choice(st, a, b, c):
        st1, lbase, lcnt, lerr = resolve_list_operand(st, a)
        rng = st.rng * jnp.uint32(1664525) + jnp.uint32(1013904223)
        idx = jnp.where(lcnt > 0,
                        ((rng >> 8) % jnp.maximum(lcnt, 1).astype(jnp.uint32))
                        .astype(jnp.int32),
                        0)
        ev = pool_elem_value(st1, lbase + idx)
        nbuf, nlen, nerr = interp_name(st1, axu(a + 3), axu(a + 4))
        st2, seterr = set_value(st1, nbuf, nlen, ev)
        st2 = st2._replace(rng=rng)
        err = jnp.where(lerr != ERR_OK, lerr,
              jnp.where(lcnt == 0, ik.ERR_ASSERT,
              jnp.where(nerr != ERR_OK, nerr, seterr)))
        return advance(st, err, st2)

    def h_for_head(st, a, b, c):
        loop_id = axu(a)
        exit_pc = axu(a + 1)
        counter = st.counters[jnp.clip(loop_id, 0, cfg.max_loops - 1)]
        entering = counter == 0

        # resolve pair lists; all must be lists of equal length
        def pair_list(st_c, i):
            base = a + 2 + 5 * i + 2  # skip name off/len
            return resolve_list_operand(st_c, base)

        def len_body(i, carry):
            st_c, length, err = carry
            in_range = i < b
            st2, lb, lc, lerr = pair_list(st_c, i)
            neq = (i > 0) & (lc != length) & in_range
            st_c = jax.tree.map(lambda x, y: jnp.where(in_range, y, x),
                                st_c, st2)
            length = jnp.where(in_range & (i == 0), lc, length)
            err = jnp.where(in_range & (err == ERR_OK),
                            jnp.where(lerr != ERR_OK, lerr,
                                      jnp.where(neq, ik.ERR_ASSERT, ERR_OK)),
                            err)
            return st_c, length, err

        MAX_PAIRS = 4
        st1, length, err0 = jax.lax.fori_loop(
            0, jnp.minimum(jnp.asarray(b), MAX_PAIRS), len_body,
            (st, jnp.int32(0), jnp.int32(ERR_OK)))
        err0 = jnp.where(b > MAX_PAIRS, ERR_HOST, err0)

        cur = jnp.where(entering, 1, counter)
        exiting = cur > length

        # set loop vars for this iteration
        def var_body(i, carry):
            st_c, err = carry
            in_range = (i < b) & ~exiting
            name_base = a + 2 + 5 * i
            nbuf2, nlen2, nerr2 = interp_name(st_c, axu(name_base),
                                              axu(name_base + 1))
            st2, lb, lc, lerr = pair_list(st_c, i)
            ev = pool_elem_value(st2, lb + cur - 1)
            st3, serr = set_value(st2, nbuf2, nlen2, ev)
            step_err = jnp.where(nerr2 != ERR_OK, nerr2,
                                 jnp.where(lerr != ERR_OK, lerr, serr))
            st_c = jax.tree.map(lambda x, y: jnp.where(
                in_range & (err == ERR_OK), y, x), st_c, st3)
            err = jnp.where(in_range & (err == ERR_OK) & (step_err != ERR_OK),
                            step_err, err)
            return st_c, err

        st2, err1 = jax.lax.fori_loop(
            0, jnp.minimum(jnp.asarray(b), MAX_PAIRS), var_body,
            (st1, jnp.int32(ERR_OK)))

        from .state import _masked_slot_update as _msu
        new_counters = _msu(st2.counters,
                            jnp.clip(loop_id, 0, cfg.max_loops - 1),
                            jnp.where(exiting, 0, cur))
        st3 = st2._replace(counters=new_counters)
        err = jnp.where(err0 != ERR_OK, err0, err1)
        jump = jnp.where(exiting, exit_pc, st.pc + 1)
        return advance(st, err, st3, jump_pc=jump)

    def h_for_next(st, a, b, c):
        from .state import _masked_slot_update as _msu
        loop_id = jnp.clip(jnp.asarray(b), 0, cfg.max_loops - 1)
        st2 = st._replace(counters=_msu(st.counters, loop_id,
                                        st.counters[loop_id] + 1))
        return advance(st, jnp.int32(ERR_OK), st2, jump_pc=jnp.asarray(a))

    def h_park(st, a, b, c):
        # literal-name await_insert (lower.py encodes b=key_off, c=key_len):
        # a present key means the host twin's poll has NO yield
        # (executor.py:250-251) — the lane continues synchronously, so
        # advance in-kernel; an absent key suspends the twin at its sleep
        # (where a later race cancel ALWAYS lands), so park. Ambiguous
        # hash collisions park too: the host re-executes exactly. Every
        # other park kind has ready=False (kind/len guards).
        kbuf, klen = tmpl(b, c)
        found, _slot, collide = find_slot(st, kbuf, klen)
        ready = ((jnp.asarray(a, jnp.int32) == PARK_AWAIT_INSERT) &
                 (jnp.asarray(c, jnp.int32) > 0) & found & ~collide)
        return st._replace(
            pc=jnp.where(ready, st.pc + 1, st.pc),
            steps=jnp.where(ready, st.steps + 1, st.steps),
            status=jnp.where(ready, st.status, jnp.int32(PARKED)),
            park_kind=jnp.where(ready, st.park_kind,
                                jnp.asarray(a, jnp.int32)),
            park_arg=jnp.where(ready, st.park_arg, st.pc))

    # ---- parallel_wait / parallel_race thread lanes -----------------------
    # Reference: asyncio.gather / wait(FIRST_COMPLETED) over subtask
    # coroutines sharing one state (interpolation_engine.py:1581-1626).
    # Device shape: one pc lane per subtask; exactly one lane executes at a
    # time (asyncio is single-threaded). A lane runs until it parks; the
    # host ring then decides — exactly like the event loop — whether its IO
    # completes without suspending (lane continues, no switch observable)
    # or truly blocks (the next lane runs). See driver._service_threads.

    NT = cfg.max_threads

    def _pick(st: VMInstance, mask) -> tuple:
        """First lane in `mask`, cyclic from cur_tid+1 (FIFO whenever at
        most one lane is runnable — the common case)."""
        lane = jnp.arange(NT, dtype=jnp.int32)
        start = jnp.where(st.cur_tid < 0, 0, st.cur_tid + 1)
        rot = (start + lane) % NT
        hit = mask[rot]
        return jnp.any(hit), rot[jnp.argmax(hit)]

    def h_par_begin(st, a, b, c):
        K = axu(a + 1)
        loop_lo, loop_hi = axu(a + 3), axu(a + 4)
        lane = jnp.arange(NT, dtype=jnp.int32)
        entries = _T["aux"][jnp.clip(a + 5 + lane, 0,
                                     _T["aux"].shape[0] - 1)]
        started = lane < K
        # reset loop counters allocated inside the block: a raced (cancelled)
        # lane may have left one mid-loop, and the reference purges raced
        # sub-cursors so a re-entered block restarts its loops
        li = jnp.arange(cfg.max_loops, dtype=jnp.int32)
        counters = jnp.where((li >= loop_lo) & (li < loop_hi),
                             0, st.counters)
        # lane 0 runs first (asyncio schedules gathered tasks in order)
        return st._replace(
            tpc=jnp.where(started, entries, 0),
            tstate=jnp.where(started, jnp.int32(T_NEW), jnp.int32(T_FREE)),
            tpark_kind=jnp.zeros((NT,), jnp.int32),
            tpark_arg=jnp.zeros((NT,), jnp.int32),
            cur_tid=jnp.int32(0),
            par_mode=axu(a),
            par_join=axu(a + 2),
            counters=counters,
            pc=entries[0],
            steps=st.steps + 1)

    def _finish_block(st: VMInstance) -> VMInstance:
        return st._replace(
            pc=st.par_join, status=jnp.int32(RUNNING),
            cur_tid=jnp.int32(-1), par_mode=jnp.int32(0),
            par_join=jnp.int32(0),
            tstate=jnp.zeros((NT,), jnp.int32),
            par_epoch=st.par_epoch + 1)

    def h_thread_end(st, a, b, c):
        K = axu(a + 1)
        lane = jnp.arange(NT, dtype=jnp.int32)
        cur = jnp.clip(st.cur_tid, 0, NT - 1)
        tstate = jnp.where(lane == cur, jnp.int32(T_DONE), st.tstate)
        st = st._replace(tstate=tstate, steps=st.steps + 1)
        started = lane < K
        new_left = jnp.any(started & (tstate == T_NEW))
        wait_left = jnp.any(started & (tstate == T_WAIT))
        ready_left = jnp.any(started & (tstate == T_READY))
        all_done = jnp.all(~started | (tstate == T_DONE))
        wait_mode = st.par_mode == 1
        # wait: done when every lane is; race/drain: done when no lane
        # still has a slice coming — NEW lanes get their first slice,
        # READY lanes (resumed IO) their continuation slice, WAIT lanes
        # their cancel, all before asyncio's FIRST_COMPLETED waiter
        # processes the cancellation
        complete = jnp.where(wait_mode, all_done,
                             ~new_left & ~wait_left & ~ready_left)
        drain = ~wait_mode & ~complete
        run_mask = (st.tstate == T_NEW) | (st.tstate == T_READY)
        any_run, nxt = _pick(st, run_mask)
        # priority: complete > run next lane > park for the ring
        st = st._replace(par_mode=jnp.where(
            drain, jnp.int32(3), st.par_mode))
        fin = _finish_block(st)
        pick_pc = jnp.where(any_run, st.tpc[nxt], st.pc)
        return st._replace(
            pc=jnp.where(complete, fin.pc, pick_pc),
            status=jnp.where(complete | any_run, jnp.int32(RUNNING),
                             jnp.int32(PARKED)),
            park_kind=jnp.where(complete | any_run, st.park_kind,
                                jnp.int32(PARK_THREADS)),
            park_arg=jnp.where(complete | any_run, st.park_arg, st.pc),
            cur_tid=jnp.where(complete, jnp.int32(-1),
                              jnp.where(any_run, nxt, jnp.int32(-1))),
            par_mode=jnp.where(complete, 0, st.par_mode),
            par_join=jnp.where(complete, 0, st.par_join),
            tstate=jnp.where(complete, jnp.zeros((NT,), jnp.int32),
                             st.tstate),
            par_epoch=st.par_epoch + jnp.where(complete, 1, 0),
        )

    def thread_yield(st_prev: VMInstance, st_new: VMInstance) -> VMInstance:
        """Post-step transform: a park raised while inside a parallel block
        suspends the current LANE (T_WAIT) and parks the instance for the
        ring — which resumes the same lane if its IO completes without
        suspending (the asyncio synchronous-continuation illusion) or runs
        the next lane if it truly blocks. The device must NOT switch to
        another lane here, even mid-drain: whether the parked lane's slice
        continues (before any later lane runs — the ordering asyncio
        exposes) is host-side knowledge."""
        parked = ((st_new.status == PARKED) & (st_new.par_mode > 0)
                  & (st_new.cur_tid >= 0)
                  & (st_new.park_kind != PARK_THREADS))
        lane = jnp.arange(NT, dtype=jnp.int32)
        cur = jnp.clip(st_new.cur_tid, 0, NT - 1)
        sel = parked & (lane == cur)
        waited = st_new._replace(
            tstate=jnp.where(sel, jnp.int32(T_WAIT), st_new.tstate),
            tpark_kind=jnp.where(sel, st_new.park_kind, st_new.tpark_kind),
            tpark_arg=jnp.where(sel, st_new.park_arg, st_new.tpark_arg),
            tpc=jnp.where(sel, st_new.park_arg, st_new.tpc),
        )
        return waited._replace(
            park_kind=jnp.where(parked, jnp.int32(PARK_THREADS),
                                waited.park_kind),
        )

    handlers = [h_park] * isa.N_OPS  # placeholder; filled below, masked by ops
    handlers[isa.OP_HALT] = h_halt
    handlers[isa.OP_PRINT] = h_print
    handlers[isa.OP_SET] = make_h_set(False)
    handlers[isa.OP_SET_LN] = make_h_set(True)
    handlers[isa.OP_UNESCAPE] = h_unescape
    handlers[isa.OP_GOTO] = h_goto
    handlers[isa.OP_GOTO_MAP] = h_goto_map
    handlers[isa.OP_MATH] = h_math
    handlers[isa.OP_LIST_JOIN] = h_list_join
    handlers[isa.OP_LIST_CONCAT] = h_list_concat
    handlers[isa.OP_LIST_APPEND] = h_list_append
    handlers[isa.OP_LIST_REMOVE] = h_list_remove
    handlers[isa.OP_LIST_INDEX] = h_list_index
    handlers[isa.OP_LIST_SLICE] = h_list_slice
    handlers[isa.OP_REPLACE_MAP] = h_replace_map
    handlers[isa.OP_DELETE] = h_delete
    handlers[isa.OP_DELETE_EXCEPT] = h_delete_except
    handlers[isa.OP_CLEAR] = h_clear
    handlers[isa.OP_SLEEP] = h_sleep
    handlers[isa.OP_RANDOM_CHOICE] = h_random_choice
    handlers[isa.OP_FOR_HEAD] = h_for_head
    handlers[isa.OP_FOR_NEXT] = h_for_next
    handlers[isa.OP_PARK] = h_park
    handlers[isa.OP_NOP] = h_nop
    handlers[isa.OP_MATH_RPN] = make_h_math_rpn(False)
    handlers[isa.OP_MATH_RPN_LN] = make_h_math_rpn(True)
    handlers[isa.OP_GOTO_MAP_LIT] = h_goto_map_lit
    handlers[isa.OP_PRINT_LIT] = h_print_lit
    handlers[isa.OP_PAR_BEGIN] = h_par_begin
    handlers[isa.OP_THREAD_END] = h_thread_end

    if ops is not None:
        # specialize: opcodes this program can never execute fall back to
        # h_park (harmless — unreachable — but tiny to compile)
        keep = set(ops) | {isa.OP_HALT, isa.OP_PARK}
        handlers = [h if i in keep else h_park
                    for i, h in enumerate(handlers)]

    # thread-yield only exists in programs that can enter a parallel block
    # (eager mode is unspecialized and always carries it — cheap)
    has_threads = ops is None or isa.OP_PAR_BEGIN in ops

    def step(st: VMInstance, tables: Tables) -> VMInstance:
        _T["aux"] = tables.aux
        _T["strtab"] = tables.strtab
        _T["labels"] = tables.labels
        code = tables.code
        pc = jnp.clip(st.pc, 0, code.shape[0] - 1)
        instr = code[pc]
        op = jnp.clip(instr[0], 0, isa.N_OPS - 1)
        active = st.status == RUNNING
        # fresh branch wrappers per trace: lax.switch caches branch jaxprs by
        # function identity, and the stable handlers close over the
        # late-bound _T tables — reusing a cached jaxpr would smuggle the
        # previous trace's tracers in as constants
        branches = [(lambda st, a, b, c, h=h: h(st, a, b, c))
                    for h in handlers]
        new_st = jax.lax.switch(op, branches, st, instr[1], instr[2], instr[3])
        if has_threads:
            new_st = thread_yield(st, new_st)
        return jax.tree.map(lambda a, b: jnp.where(active, b, a), st, new_st)

    def run(st: VMInstance, tables: Tables, n_steps: int) -> VMInstance:
        def body(_, st):
            return step(st, tables)
        return jax.lax.fori_loop(0, n_steps, body, st)

    def run_batch(batch: VMInstance, tables: Tables, n_steps: int) -> VMInstance:
        """Batch-level step loop with uniform-dispatch fast path.

        Instances usually run in lockstep (same pc). When every live lane
        shares one pc, dispatch switches on a SCALAR opcode — XLA emits a
        real conditional that executes only the active handler at runtime,
        instead of the vmapped per-lane switch that computes every branch
        (classic SIMT convergence optimization). Divergent batches fall
        back to the per-lane path within the same compiled loop.
        """
        _T["aux"] = tables.aux
        _T["strtab"] = tables.strtab
        _T["labels"] = tables.labels
        code = tables.code

        def body(_, batch):
            pcs = batch.pc
            running = batch.status == RUNNING
            uniform = jnp.all(pcs == pcs[0]) & jnp.all(running)
            pc0 = jnp.clip(pcs[0], 0, code.shape[0] - 1)
            instr0 = code[pc0]
            op0 = jnp.clip(instr0[0], 0, isa.N_OPS - 1)

            def uniform_path(batch):
                branches = [
                    (lambda bt, a, b, c, h=h:
                     jax.vmap(h, in_axes=(0, None, None, None))(bt, a, b, c))
                    for h in handlers
                ]
                nb = jax.lax.switch(op0, branches, batch,
                                    instr0[1], instr0[2], instr0[3])
                if has_threads:
                    nb = jax.vmap(thread_yield)(batch, nb)
                return nb

            def mixed_path(batch):
                return jax.vmap(step, in_axes=(0, None))(batch, tables)

            return jax.lax.cond(uniform, uniform_path, mixed_path, batch)

        return jax.lax.fori_loop(0, n_steps, body, batch)

    def _bind(handler):
        """Jit one handler with tables as traced arguments — compiled once
        per cfg (lazily, on first use) and shared across programs."""
        def wrapped(st, tables, a, b, c):
            _T["aux"] = tables.aux
            _T["strtab"] = tables.strtab
            _T["labels"] = tables.labels
            new_st = handler(st, a, b, c)
            if has_threads:
                new_st = thread_yield(st, new_st)
            active = st.status == RUNNING
            return jax.tree.map(lambda x, y: jnp.where(active, y, x),
                                st, new_st)
        return jax.jit(wrapped)

    eager_handlers = [_bind(h) for h in handlers]

    def eager_step(st: VMInstance, tables: Tables) -> VMInstance:
        """Concrete-opcode Python dispatch (no lax.switch): only the live
        handler's (small) compilation is paid. Used for CPU batches/tests."""
        if int(st.status) != RUNNING:
            return st
        import numpy as _np
        code = _np.asarray(tables.code)
        pc = min(max(int(st.pc), 0), code.shape[0] - 1)
        op, a, b, c = (int(v) for v in code[pc])
        op = min(max(op, 0), isa.N_OPS - 1)
        return eager_handlers[op](st, tables, jnp.int32(a), jnp.int32(b),
                                  jnp.int32(c))

    return step, run, eager_step, run_batch
