"""Fixed-shape byte-string primitives for the device VM.

A device string is ``(buf, length)`` where ``buf`` is a fixed-size uint8
vector and bytes past ``length`` are zero (normalized — this makes equality
one vector compare). All helpers are single-instance jnp code, designed to be
``vmap``-ed over the instance axis; every loop bound is static.

These are the building blocks the interpolation kernel (ops/interp_kernel.py)
and every string opcode are written in. They replicate the byte-level
behavior of the reference's Python string ops (find/rfind/slice semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BRACE_OPEN = 123   # ord('{')
BRACE_CLOSE = 125  # ord('}')
BACKSLASH = 92     # ord('\\')


def positions(n: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)


def normalize(buf: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Zero bytes at and past `length`."""
    return jnp.where(positions(buf.shape[0]) < length, buf, 0).astype(jnp.uint8)


def from_table(table: jnp.ndarray, off, length, size: int):
    """Copy `length` bytes at `off` from a flat table into a size-`size` buf.

    The table is padded by `size` so any in-bounds offset slices cleanly.
    """
    table = jnp.pad(table, (0, size))
    off = jnp.clip(jnp.asarray(off, jnp.int32), 0, table.shape[0] - size)
    chunk = jax.lax.dynamic_slice(table, (off,), (size,))
    return normalize(chunk, length), jnp.asarray(length, jnp.int32)


def equal(a_buf, a_len, b_buf, b_len) -> jnp.ndarray:
    return jnp.logical_and(a_len == b_len, jnp.all(a_buf == b_buf))


def concat(a_buf, a_len, b_buf, b_len, out_size: int):
    """a + b into a buffer of out_size; returns (buf, len, overflow)."""
    n = out_size
    pos = positions(n)
    a_part = jnp.where(pos < a_len, _fit(a_buf, n), 0)
    # b shifted right by a_len
    b_shift = shift_right(_fit(b_buf, n), a_len)
    out = jnp.where((pos >= a_len) & (pos < a_len + b_len), b_shift, a_part)
    total = a_len + b_len
    overflow = total > n
    return out.astype(jnp.uint8), jnp.minimum(total, n), overflow


def _fit(buf, n: int):
    m = buf.shape[0]
    if m == n:
        return buf
    if m > n:
        return buf[:n]
    return jnp.pad(buf, (0, n - m))


def shift_right(buf, k):
    """Logical shift right by k positions (vacated bytes are 0).

    Implemented as a dynamic_slice over a zero-padded double buffer: a
    data-dependent gather (buf[pos-k]) serializes on the TPU scalar unit
    (~1 element/cycle), whereas dynamic_slice is a contiguous copy.
    """
    n = buf.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n)
    padded = jnp.concatenate([jnp.zeros((n,), buf.dtype), buf])
    return jax.lax.dynamic_slice(padded, (n - k,), (n,))


def shift_left(buf, k):
    """Logical shift left by k positions (vacated bytes are 0)."""
    n = buf.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), 0, n)
    padded = jnp.concatenate([buf, jnp.zeros((n,), buf.dtype)])
    return jax.lax.dynamic_slice(padded, (k,), (n,))


def substring(buf, start, length, out_size: int):
    """buf[start:start+length] into a fresh buffer."""
    shifted = shift_left(_fit(buf, max(buf.shape[0], out_size)), start)
    return normalize(_fit(shifted, out_size), length), jnp.asarray(length, jnp.int32)


def shift_any(buf, k):
    """Shift by k (positive → right); dynamic_slice based, no gathers."""
    n = buf.shape[0]
    k = jnp.clip(jnp.asarray(k, jnp.int32), -n, n)
    padded = jnp.concatenate([jnp.zeros((n,), buf.dtype), buf,
                              jnp.zeros((n,), buf.dtype)])
    return jax.lax.dynamic_slice(padded, (n - k,), (n,))


def splice(buf, length, start, end, rep_buf, rep_len, out_size: int):
    """buf[:start] + rep + buf[end:]  → (buf', len', overflow)."""
    n = out_size
    pos = positions(n)
    head = jnp.where(pos < start, _fit(buf, n), 0)
    mid = shift_right(_fit(rep_buf, n), start)
    mid = jnp.where((pos >= start) & (pos < start + rep_len), mid, 0)
    # tail: buf shifted so that byte `end` lands at `start + rep_len`
    tail_shift = start + rep_len - end
    tail = shift_any(_fit(buf, n), tail_shift)
    tail_src = pos - tail_shift
    tail_valid = (pos >= start + rep_len) & (tail_src < length) & (tail_src >= 0)
    tail = jnp.where(tail_valid, tail, 0)
    new_len = start + rep_len + (length - end)
    out = (head | mid | tail).astype(jnp.uint8)
    overflow = new_len > n
    return normalize(out, jnp.minimum(new_len, n)), jnp.minimum(new_len, n), overflow


def escape_hidden_mask(buf, length):
    """True at brace positions hidden by a preceding backslash.

    Equivalent to the reference's sentinel swap of '\\{' / '\\}' (left-to-right
    replace): a brace directly preceded by a backslash is protected. Because
    the swap is length-preserving and only braces are consulted downstream,
    the mask formulation is exact.
    """
    n = buf.shape[0]
    prev = jnp.concatenate([jnp.zeros((1,), jnp.uint8), buf[:-1]])
    is_brace = (buf == BRACE_OPEN) | (buf == BRACE_CLOSE)
    pos = positions(n)
    return is_brace & (prev == BACKSLASH) & (pos < length)


def find(buf, length, byte, start, hidden_mask=None):
    """Lowest index >= start of `byte` within [0, length), else -1."""
    n = buf.shape[0]
    pos = positions(n)
    hit = (buf == byte) & (pos >= start) & (pos < length)
    if hidden_mask is not None:
        hit &= ~hidden_mask
    any_hit = jnp.any(hit)
    idx = jnp.argmax(hit)  # first True
    return jnp.where(any_hit, idx, -1).astype(jnp.int32)


def rfind(buf, length, byte, hidden_mask=None):
    """Highest index of `byte` within [0, length), else -1."""
    n = buf.shape[0]
    pos = positions(n)
    hit = (buf == byte) & (pos < length)
    if hidden_mask is not None:
        hit &= ~hidden_mask
    any_hit = jnp.any(hit)
    idx = (n - 1) - jnp.argmax(hit[::-1])
    return jnp.where(any_hit, idx, -1).astype(jnp.int32)


def count(buf, length, byte, hidden_mask=None):
    pos = positions(buf.shape[0])
    hit = (buf == byte) & (pos < length)
    if hidden_mask is not None:
        hit &= ~hidden_mask
    return jnp.sum(hit.astype(jnp.int32))


def int_to_bytes(value, out_size: int):
    """Decimal representation of an int32 (matches Python str(int))."""
    neg = value < 0
    # two's-complement magnitude in uint32 (handles INT32_MIN without x64)
    mag = jnp.where(neg, (~value.astype(jnp.uint32)) + jnp.uint32(1),
                    value.astype(jnp.uint32))

    # write digits right-to-left into a scratch, then shift
    MAXD = 11
    def body(i, carry):
        digits, m = carry
        digits = digits.at[MAXD - 1 - i].set((m % 10).astype(jnp.uint8) + 48)
        return digits, m // 10
    digits, _ = jax.lax.fori_loop(0, MAXD, body, (jnp.zeros((MAXD,), jnp.uint8), mag))
    # significant digits: first non-'0' from the left, but at least one digit
    leading = jnp.argmax(digits != 48)
    is_zero = jnp.all(digits == 48)
    n_digits = jnp.where(is_zero, 1, MAXD - leading).astype(jnp.int32)
    start = MAXD - n_digits
    shifted = shift_left(digits, start)
    buf = jnp.zeros((out_size,), jnp.uint8)
    body_buf, body_len = normalize(_fit(shifted, out_size), n_digits), n_digits
    sign = jnp.where(neg, 1, 0).astype(jnp.int32)
    with_sign = shift_right(body_buf, sign)
    with_sign = jnp.where(positions(out_size) == 0,
                          jnp.where(neg, 45, with_sign[0]).astype(jnp.uint8),
                          with_sign)
    total = body_len + sign
    return normalize(with_sign.astype(jnp.uint8), total), total


def bytes_to_int(buf, length):
    """Parse an optionally-signed decimal int; returns (value, ok)."""
    n = buf.shape[0]
    pos = positions(n)
    has_sign = (length > 0) & ((buf[0] == 45) | (buf[0] == 43))
    neg = (buf[0] == 45) & has_sign
    start = jnp.where(has_sign, 1, 0)
    in_range = (pos >= start) & (pos < length)
    is_digit = (buf >= 48) & (buf <= 57)
    ok = (length > start) & jnp.all(~in_range | is_digit)

    def body(i, acc):
        use = (i >= start) & (i < length)
        return jnp.where(use, acc * 10 + (buf[i].astype(jnp.uint32) - 48), acc)
    value = jax.lax.fori_loop(0, n, body, jnp.uint32(0))
    signed = jnp.where(neg, (~value) + jnp.uint32(1), value).astype(jnp.int32)
    return signed, ok


def unescape_braces(buf, length):
    """Remove backslashes that precede braces (print-time unescaping).

    Mirrors str.replace('\\{','{').replace('\\}','}') left-to-right.
    """
    n = buf.shape[0]
    nxt = jnp.concatenate([buf[1:], jnp.zeros((1,), jnp.uint8)])
    pos = positions(n)
    # a backslash is dropped if followed by a brace AND it is not itself
    # "consumed" by a previous backslash-brace pair; replace() is sequential,
    # but '\\' followed by '{' — the first replace consumes the '\{' pair —
    # for byte pairs '\\{' the middle '\' is dropped. Sequential semantics:
    # scan left to right, dropping a '\' when it directly precedes a brace
    # and was not just consumed. Consumption only matters for runs of
    # backslashes: in '\\\\{' ("\\\{"), Python replace('\{','{') drops the
    # LAST backslash of the run. A backslash is dropped iff it is followed by
    # a brace (the next byte), because replace works on 2-byte windows and
    # overlapping windows cannot both match ('\' != '{').
    drop = (buf == BACKSLASH) & ((nxt == BRACE_OPEN) | (nxt == BRACE_CLOSE)) & (pos < length)
    keep = ~drop & (pos < length)
    # compact kept bytes via a gather: src(q) = index of the (q+1)-th kept
    # byte (scatter compaction would serialize on TPU)
    kept_cum = jnp.cumsum(keep.astype(jnp.int32))
    new_len = kept_cum[-1]
    src = jnp.searchsorted(kept_cum, pos + 1, side="left")
    out = buf[jnp.clip(src, 0, n - 1)]
    return normalize(out, new_len), new_len


def escape_braces(buf, length, out_size: int):
    """Insert a backslash before every brace (user_input storage)."""
    n = buf.shape[0]
    pos = positions(n)
    is_brace = ((buf == BRACE_OPEN) | (buf == BRACE_CLOSE)) & (pos < length)
    # output index of each input byte = pos + (#braces before it)
    braces_before = jnp.cumsum(is_brace.astype(jnp.int32)) - is_brace.astype(jnp.int32)
    # the byte of source p lands at f[p]; braces get a backslash at f[p]-1.
    # Gather formulation (scatters serialize on TPU): for each output q,
    # find the source byte whose final position is q, else check whether q
    # is the backslash directly before an escaped brace.
    f = pos + braces_before + is_brace.astype(jnp.int32)
    f = jnp.where(pos < length, f, 2 * n + 2)  # out-of-range sentinel
    q = positions(out_size)
    p_byte = jnp.searchsorted(f, q, side="left")
    is_byte = (p_byte < n) & (f[jnp.clip(p_byte, 0, n - 1)] == q)
    p_esc = jnp.searchsorted(f, q + 1, side="left")
    is_esc = (p_esc < n) & (f[jnp.clip(p_esc, 0, n - 1)] == q + 1) & \
        is_brace[jnp.clip(p_esc, 0, n - 1)]
    out = jnp.where(is_byte, buf[jnp.clip(p_byte, 0, n - 1)],
                    jnp.where(is_esc, BACKSLASH, 0)).astype(jnp.uint8)
    new_len = length + jnp.sum(is_brace.astype(jnp.int32))
    overflow = new_len > out_size
    return normalize(out, jnp.minimum(new_len, out_size)), \
        jnp.minimum(new_len, out_size), overflow
