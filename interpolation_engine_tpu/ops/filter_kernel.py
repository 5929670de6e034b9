"""Device (vectorized) chat stream filters.

The host filters (core/filters.py, the exact oracle; reference:
src/interpolation_engine/filter.py + rust-project/src/filter.rs) run a
per-chunk hold-back state machine so delimiters split across SSE chunks are
recognized. Their FINAL result is chunking-invariant: concatenating the
returned fragments equals filtering the whole text at once. This module
computes that final result as fixed-shape tensor ops — one jitted call per
delimiter set serves any batch via vmap, instead of serializing 100k
Python state machines through the ring (SURVEY §2.2 R8).

Two passes, mirroring chat/service.py's ``hide(extract(delta))`` order:

1. extract: alternating start_str/stop_str spans over the raw bytes →
   span table + an intermediate stream of the extracted bytes with
   enumeration markers ("1. ", "\\n\\n2. ", …) inserted at span starts;
2. hide: the InvertedFilter state machine over that intermediate stream →
   the visual output bytes.

Both state machines are byte-position ``lax.scan``s with a tiny carry
(shown flag + delimiter skip countdown); delimiter occurrence masks are
computed vectorized beforehand. Empty delimiters = passthrough, exactly
like the host classes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_SPANS = 16      # outputs per chat call (n_outputs is small in practice)
_MARK = 16          # max bytes of one enumeration marker ("\n\n12. ")


def _match_mask(buf, length, pattern: bytes):
    """mask[i] = pattern occurs at byte i (entirely within length)."""
    L = buf.shape[0]
    P = len(pattern)
    if P == 0 or P > L:
        return jnp.zeros((L,), jnp.bool_)
    m = jnp.ones((L,), jnp.bool_)
    for j, b in enumerate(pattern):
        shifted = jnp.concatenate(
            [buf[j:], jnp.zeros((j,), buf.dtype)]) if j else buf
        m = m & (shifted == b)
    pos = jnp.arange(L, dtype=jnp.int32)
    return m & (pos + P <= length)


def _extract_scan(start_mask, stop_mask, start_len: int, stop_len: int):
    """OutputFilter's alternating state machine over byte positions.

    kept[i] = byte i is inside a shown span and not delimiter bytes;
    span_id[i] = 0-based span index (valid where kept); n_spans = spans
    opened. A matched delimiter toggles the state and consumes its own
    bytes via the skip countdown (matches can't begin inside another
    match, like the host's sequential buffer consumption).
    """
    def step(carry, inp):
        shown, skip, span = carry
        is_start, is_stop = inp
        free = skip == 0
        hit_start = (~shown) & is_start & free
        hit_stop = shown & is_stop & free
        new_shown = jnp.where(hit_start, True,
                              jnp.where(hit_stop, False, shown))
        new_skip = jnp.where(hit_start, start_len,
                             jnp.where(hit_stop, stop_len, skip))
        new_span = span + jnp.where(hit_start, 1, 0)
        kept = new_shown & (new_skip == 0)
        consumed = new_skip > 0  # this byte is part of a matched delimiter
        return ((new_shown, jnp.maximum(new_skip - 1, 0), new_span),
                (kept, new_span - 1, consumed))

    (shown_end, _, n_spans), (kept, span_id, consumed) = jax.lax.scan(
        step, (jnp.bool_(False), jnp.int32(0), jnp.int32(0)),
        (start_mask, stop_mask))
    return kept, span_id, n_spans, shown_end, consumed


def _hide_scan(hs_mask, he_mask, hs_len: int, he_len: int):
    """InvertedFilter: visible outside hide_start..hide_stop spans."""
    def step(carry, inp):
        shown, skip = carry
        is_hs, is_he = inp
        free = skip == 0
        hit_hs = shown & is_hs & free
        hit_he = (~shown) & is_he & free
        new_shown = jnp.where(hit_hs, False,
                              jnp.where(hit_he, True, shown))
        new_skip = jnp.where(hit_hs, hs_len,
                             jnp.where(hit_he, he_len, skip))
        kept = new_shown & (new_skip == 0)
        consumed = new_skip > 0
        return (new_shown, jnp.maximum(new_skip - 1, 0)), (kept, consumed)

    (shown_end, _), (kept, consumed) = jax.lax.scan(
        step, (jnp.bool_(True), jnp.int32(0)), (hs_mask, he_mask))
    return kept, shown_end, consumed


def _holdback_mask(buf, length, consumed, pending: bytes, active):
    """Trailing bytes the host still holds in its buffer at stream end —
    the longest suffix (no byte of which belongs to a matched delimiter)
    that is a PROPER prefix of ``pending``. Those bytes never flush
    (core/filters.py _holdback_point); inactive when the filter isn't in
    its shown state at end (held bytes would be invisible anyway)."""
    L = buf.shape[0]
    P = len(pending)
    best = jnp.int32(0)
    for s in range(1, min(P, L + 1)):  # proper prefixes only
        ok = length >= s
        for j in range(s):
            idx = length - s + j
            cidx = jnp.clip(idx, 0, L - 1)
            ok = ok & (buf[cidx] == pending[j]) & ~consumed[cidx]
        best = jnp.where(ok, jnp.int32(s), best)
    pos = jnp.arange(L, dtype=jnp.int32)
    return active & (pos >= length - best) & (pos < length)


def _compact(buf, keep_mask, out_size: int):
    """Stable-gather kept bytes to the front; returns (out[out_size], n).
    Scatter uses a dump lane PAST the output so duplicate writes can't
    clobber real data even when n == out_size."""
    n = jnp.sum(keep_mask.astype(jnp.int32))
    dest = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
    dest = jnp.where(keep_mask, jnp.clip(dest, 0, out_size - 1), out_size)
    out = jnp.zeros((out_size + 1,), buf.dtype)
    out = out.at[dest].set(buf, mode="drop")[:out_size]
    pos = jnp.arange(out_size, dtype=jnp.int32)
    return jnp.where(pos < n, out, 0), jnp.minimum(n, out_size)


@functools.lru_cache(maxsize=None)
def _enum_markers():
    """marker bytes for span k (0-based): '1. ', '\\n\\n2. ', ... padded
    (core/filters.py:63 — no leading newlines on the first)."""
    out = np.zeros((MAX_SPANS, _MARK), np.uint8)
    lens = np.zeros((MAX_SPANS,), np.int32)
    for k in range(MAX_SPANS):
        s = ("" if k == 0 else "\n\n") + f"{k + 1}. "
        data = s.encode()
        out[k, :len(data)] = list(data)
        lens[k] = len(data)
    return out, lens  # numpy: safe to cache across jit traces


@functools.partial(jax.jit, static_argnames=(
    "start", "stop", "hide_start", "hide_stop", "enumerate_outputs",
    "out_size"))
def filter_chat_text(buf, length, *, start: bytes, stop: bytes,
                     hide_start: bytes, hide_stop: bytes,
                     enumerate_outputs: bool, out_size: int):
    """Whole-text filter. Returns a dict:

    * ``extracted``/``span_off``/``span_len``/``n_spans`` — the outputs
      table (span bytes index into ``extracted``), = OutputFilter.outputs;
    * ``visual``/``visual_len`` — the screen stream after enumeration
      markers and the hide filter, = concatenated host return fragments.

    Delimiters are static per chat task; buf/length are traced, so one
    compiled kernel serves a whole batch via vmap.
    """
    L = buf.shape[0]
    pos = jnp.arange(L, dtype=jnp.int32)
    in_range = pos < length
    passthrough = len(start) == 0 or len(stop) == 0

    if passthrough:
        # host passthrough: everything is one output, no enumeration.
        # An empty stream (zero 1-byte chunks in the chunk→0 limit) never
        # calls the host filter at all, so outputs stays [] — n_spans=0
        # (core/filters.py OutputFilter.outputs materializes on __call__).
        ext, ext_len = jnp.where(in_range, buf, 0), length
        span_off = jnp.zeros((MAX_SPANS,), jnp.int32)
        span_len = jnp.zeros((MAX_SPANS,), jnp.int32).at[0].set(ext_len)
        n_spans = jnp.where(length == 0, 0, 1).astype(jnp.int32)
        raw_n_spans = n_spans
        span_of_byte = jnp.where(pos < ext_len, 0, -1)
    else:
        start_m = _match_mask(buf, length, start) & in_range
        stop_m = _match_mask(buf, length, stop) & in_range
        kept, span_id, n_spans, shown_end, consumed = _extract_scan(
            start_m, stop_m, len(start), len(stop))
        kept = kept & in_range
        # end-of-stream hold-back: a trailing potential stop_str prefix
        # stays in the host buffer forever and never reaches the output
        kept = kept & ~_holdback_mask(buf, length, consumed, stop,
                                      shown_end)
        raw_n_spans = n_spans  # pre-clip count: callers MUST check it
        n_spans = jnp.minimum(n_spans, MAX_SPANS)
        ext, ext_len = _compact(buf, kept, L)
        sid, _ = _compact((span_id + 1).astype(jnp.int32), kept, L)
        span_of_byte = sid - 1  # -1 past ext_len
        k = jnp.arange(MAX_SPANS, dtype=jnp.int32)
        span_len = jnp.sum(
            (span_of_byte[None, :] == k[:, None]).astype(jnp.int32), axis=1)
        span_off = jnp.cumsum(span_len) - span_len

    # ---- intermediate stream: enumeration markers + span bytes ------------
    opos = jnp.arange(out_size, dtype=jnp.int32)
    if enumerate_outputs and not passthrough:
        markers_np, marker_lens_np = _enum_markers()
        markers = jnp.asarray(markers_np)
        marker_lens = jnp.asarray(marker_lens_np)

        def put_span(k, carry):
            stream, n = carry
            live = k < n_spans
            mlen = jnp.where(live, marker_lens[k], 0)
            wm = (opos >= n) & (opos < n + mlen)
            midx = jnp.clip(opos - n, 0, _MARK - 1)
            stream = jnp.where(wm, markers[k][midx], stream)
            n = n + mlen
            ln = jnp.where(live, span_len[k], 0)
            ws = (opos >= n) & (opos < n + ln)
            sidx = jnp.clip(opos - n + span_off[k], 0, L - 1)
            stream = jnp.where(ws, ext[sidx], stream)
            return stream, n + ln

        stream, stream_len = jax.lax.fori_loop(
            0, MAX_SPANS, put_span,
            (jnp.zeros((out_size,), buf.dtype), jnp.int32(0)))
    else:
        src_idx = jnp.clip(opos, 0, L - 1)
        stream = jnp.where(opos < ext_len, ext[src_idx], 0)
        stream_len = jnp.asarray(ext_len, jnp.int32)

    # ---- hide pass over the intermediate stream ---------------------------
    if len(hide_start) and len(hide_stop):
        in_r = opos < stream_len
        hs = _match_mask(stream, stream_len, hide_start) & in_r
        he = _match_mask(stream, stream_len, hide_stop) & in_r
        keep_h, shown_end_h, consumed_h = _hide_scan(
            hs, he, len(hide_start), len(hide_stop))
        keep_h = keep_h & ~_holdback_mask(stream, stream_len, consumed_h,
                                          hide_start, shown_end_h)
        vis, vis_len = _compact(stream, keep_h & in_r, out_size)
    else:
        vis, vis_len = stream, stream_len

    return {
        "visual": vis, "visual_len": vis_len,
        "extracted": ext,
        "span_off": span_off, "span_len": span_len, "n_spans": n_spans,
        "raw_n_spans": raw_n_spans,
    }


def _char_oracle(raw: str, start: str, stop: str, hide_start: str,
                 hide_stop: str, enumerate_outputs: bool):
    """Exact chunk→0 oracle: the host state machines fed one character at
    a time (the limit the device kernel implements). Used when the kernel's
    fixed span table can't hold the result."""
    from ..core.filters import InvertedFilter, OutputFilter
    extract = OutputFilter(start, stop, enumerate_outputs=enumerate_outputs)
    hide = InvertedFilter(hide_start, hide_stop)
    visual = ""
    for ch in raw:
        visual += hide(extract(ch))
    return list(extract.outputs), visual


def filter_chat_host(raw: str, start: str, stop: str, hide_start: str,
                     hide_stop: str, enumerate_outputs: bool):
    """Run the device kernel on one host string; returns (outputs,
    visual_output) in the host filters' shapes. Used by the chat service's
    batch fast path and the differential tests. Streams opening more than
    MAX_SPANS outputs fall back to the exact host oracle — truncating the
    span table would both drop outputs and starve the executor's
    ``len(outputs) < n_outputs`` retry loop forever."""
    data = raw.encode("utf-8")
    L = max(64, 1 << max(len(data), 1).bit_length())
    buf = np.zeros((L,), np.uint8)
    buf[:len(data)] = list(data)
    out = filter_chat_text(
        jnp.asarray(buf), jnp.int32(len(data)),
        start=start.encode(), stop=stop.encode(),
        hide_start=hide_start.encode(), hide_stop=hide_stop.encode(),
        enumerate_outputs=enumerate_outputs,
        out_size=2 * L + MAX_SPANS * _MARK)
    if int(out["raw_n_spans"]) > MAX_SPANS:
        return _char_oracle(raw, start, stop, hide_start, hide_stop,
                            enumerate_outputs)
    n = int(out["n_spans"])
    ext = np.asarray(out["extracted"])
    outputs = []
    for k in range(min(n, MAX_SPANS)):
        off, ln = int(out["span_off"][k]), int(out["span_len"][k])
        outputs.append(bytes(ext[off:off + ln]).decode("utf-8", "replace"))
    vis = bytes(np.asarray(out["visual"])[:int(out["visual_len"])]).decode(
        "utf-8", "replace")
    return outputs, vis
