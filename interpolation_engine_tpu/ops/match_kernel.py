"""Wildcard matching with captures — fixed-shape DP on bytes.

Implements the reference's wildcard semantics (core/wildcard.py oracle;
reference: interpolation_engine.py:553-567): ``*`` → greedy ``(.*)`` DOTALL
capture groups, pattern anchored both ends, all other bytes literal, and
Python's end-anchor quirk (``$`` also matches just before one trailing
newline).

Algorithm: split the pattern at '*' into K+1 literal segments; compute
occurrence masks occ_j[p] (literal j matches subject at p) as a sliding
window compare; right-to-left feasibility vectors T_j[i] = "'* L_j …' can
match s[i:cut]" via suffix-OR; captures walk left-to-right choosing for each
star the *largest* feasible literal position (regex greedy).

Bounds: at most ``max_stars`` stars and ``MAX_LIT`` bytes per literal
segment; larger patterns defer to host (ERR_HOST at the call site).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..vm import bytestr as bs

STAR = 42  # ord('*')
MAX_LIT = 32


class MatchResult(NamedTuple):
    ok: jnp.ndarray          # bool — pattern matches subject
    supported: jnp.ndarray   # bool — False → defer to host
    n_caps: jnp.ndarray      # int32 — number of '*' groups
    cap_off: jnp.ndarray     # int32[max_stars] — capture spans in subject
    cap_len: jnp.ndarray     # int32[max_stars]


def _segment_spans(pat, plen, max_stars: int):
    """Split pattern at '*'. Returns (n_stars, seg_off[K+1], seg_len[K+1], ok)."""
    n = pat.shape[0]
    pos = bs.positions(n)
    is_star = (pat == STAR) & (pos < plen)
    n_stars = jnp.sum(is_star.astype(jnp.int32))

    # star positions (first max_stars of them)
    MAXS = max_stars
    star_rank = jnp.cumsum(is_star.astype(jnp.int32)) - is_star.astype(jnp.int32)
    star_pos = jnp.full((MAXS + 1,), -1, jnp.int32)
    star_pos = star_pos.at[jnp.where(is_star, jnp.minimum(star_rank, MAXS),
                                     MAXS)].set(jnp.where(is_star, pos, -1))
    # seg j spans from (prev star + 1) to (star j) exclusive
    seg_off = jnp.zeros((MAXS + 1,), jnp.int32)
    seg_len = jnp.zeros((MAXS + 1,), jnp.int32)
    prev_end = jnp.int32(0)

    def body(j, carry):
        seg_off, seg_len, prev_end = carry
        sp = star_pos[j]
        is_real_star = j < jnp.minimum(n_stars, MAXS)
        end = jnp.where(is_real_star, sp, plen)
        seg_off = seg_off.at[j].set(prev_end)
        seg_len = seg_len.at[j].set(jnp.maximum(end - prev_end, 0))
        prev_end = jnp.where(is_real_star, sp + 1, prev_end)
        return seg_off, seg_len, prev_end

    seg_off, seg_len, prev_end = jax.lax.fori_loop(
        0, MAXS, body, (seg_off, seg_len, prev_end))
    # final segment (after last star)
    K = jnp.minimum(n_stars, MAXS)
    seg_off = seg_off.at[K].set(prev_end)
    seg_len = seg_len.at[K].set(jnp.maximum(plen - prev_end, 0))

    supported = (n_stars <= MAXS) & jnp.all(seg_len <= MAX_LIT)
    return n_stars, seg_off, seg_len, supported


def _occurrences(subj, slen_cap, pat, seg_off, seg_len):
    """occ[p] = literal segment matches subj at p (window compare).

    The window matrix subj[p+q] is built from MAX_LIT statically-shifted
    copies (static slices are free; a 2-D gather would serialize on TPU),
    and the literal is extracted with one dynamic_slice.
    """
    n = subj.shape[0]
    p_idx = bs.positions(n)[:, None]                      # [n,1]
    q_idx = bs.positions(MAX_LIT)[None, :]                # [1,MAX_LIT]
    padded = jnp.concatenate([subj, jnp.zeros((MAX_LIT,), subj.dtype)])
    window = jnp.stack([padded[q:q + n] for q in range(MAX_LIT)], axis=1)
    lit_off = jnp.clip(jnp.asarray(seg_off, jnp.int32), 0, pat.shape[0])
    pat_padded = jnp.concatenate([pat, jnp.zeros((MAX_LIT,), pat.dtype)])
    lit = jax.lax.dynamic_slice(pat_padded, (lit_off,), (MAX_LIT,))
    active = q_idx[0] < seg_len                           # [MAX_LIT]
    # also require window bytes to be in-range of subject
    in_range = (p_idx + q_idx) < slen_cap
    eq = (window == lit[None, :]) & in_range | ~active[None, :]
    return jnp.all(eq, axis=1)                            # [n]


def _match_at_cut(subj, cut, pat, n_stars, seg_off, seg_len, max_stars: int):
    """Anchored match of the segmented pattern against subj[0:cut]."""
    n = subj.shape[0]
    pos = bs.positions(n + 1)

    K = jnp.minimum(n_stars, max_stars)
    m0 = seg_len[0]

    occ = jnp.stack([
        _occurrences(subj, cut, pat, seg_off[j], seg_len[j])
        for j in range(max_stars + 1)
    ])  # [max_stars+1, n]
    occ = jnp.pad(occ, ((0, 0), (0, 1)))  # position n sentinel (False)
    # empty literal "occurs" at any p <= cut
    for_empty = (pos[None, :] <= cut)
    occ = jnp.where((seg_len == 0)[:, None], for_empty, occ)
    # non-empty literals must fit before cut
    fits = (pos[None, :] + seg_len[:, None]) <= cut
    occ = occ & fits

    # T_{j}: computed right-to-left; store h vectors for the capture walk
    H = jnp.zeros((max_stars, n + 1), jnp.bool_)
    T = jnp.zeros((n + 1,), jnp.bool_)

    def body(t, carry):
        H, T = carry
        j = K - t  # dynamic segment index (the literal AFTER star j)
        active = (t < K)
        m_j = seg_len[j]
        occ_j = occ[j]
        is_last = t == 0
        # h[p] = occ_j[p] & (last ? p+m_j==cut : T[p+m_j]); the shift is a
        # dynamic_slice (gathers serialize on TPU)
        T_shift = bs.shift_left(T.astype(jnp.uint8), m_j) > 0
        end_ok = (pos + m_j) == cut
        h = occ_j & jnp.where(is_last, end_ok, T_shift)
        # suffix OR
        T_new = jnp.flip(jax.lax.cummax(jnp.flip(h.astype(jnp.int32)))) > 0
        H = jnp.where(active, H.at[jnp.clip(j - 1, 0, max_stars - 1)].set(h), H)
        T = jnp.where(active, T_new, T)
        return H, T

    H, T = jax.lax.fori_loop(0, max_stars, body, (H, T))

    prefix_ok = occ[0][0]
    no_star_ok = prefix_ok & (m0 == cut)
    star_ok = prefix_ok & T[jnp.clip(m0, 0, n)]
    ok = jnp.where(K == 0, no_star_ok, star_ok)

    # greedy captures: for j = 1..K pick the largest feasible p
    cap_off = jnp.zeros((max_stars,), jnp.int32)
    cap_len = jnp.zeros((max_stars,), jnp.int32)

    def cap_body(t, carry):
        cap_off, cap_len, cursor = carry
        j = t + 1  # star index 1..max_stars
        active = j <= K
        h = H[t]  # h for star j (stored at j-1)
        feas = h & (pos >= cursor)
        any_f = jnp.any(feas)
        p = n - jnp.argmax(jnp.flip(feas.astype(jnp.int32)))  # largest index
        p = jnp.where(any_f, p, cursor)
        cap_off = cap_off.at[t].set(jnp.where(active, cursor, 0))
        cap_len = cap_len.at[t].set(jnp.where(active, p - cursor, 0))
        cursor = jnp.where(active, p + seg_len[j], cursor)
        return cap_off, cap_len, cursor

    cap_off, cap_len, _ = jax.lax.fori_loop(
        0, max_stars, cap_body, (cap_off, cap_len, jnp.asarray(m0, jnp.int32)))
    return ok, cap_off, cap_len


import functools


@functools.lru_cache(maxsize=None)
def _jitted_match(max_stars: int):
    def f(pat, plen, subj, slen):
        return _wildcard_match_impl(pat, plen, subj, slen, max_stars)
    return jax.jit(f, inline=False)


def wildcard_match(pat, plen, subj, slen, max_stars: int) -> MatchResult:
    return _jitted_match(max_stars)(
        pat, jnp.asarray(plen, jnp.int32), subj, jnp.asarray(slen, jnp.int32))


def _wildcard_match_impl(pat, plen, subj, slen, max_stars: int) -> MatchResult:
    """Full match incl. the trailing-newline '$' quirk and greedy captures."""
    n_stars, seg_off, seg_len, supported = _segment_spans(pat, plen, max_stars)

    ok_full, cap_off_f, cap_len_f = _match_at_cut(
        subj, jnp.asarray(slen, jnp.int32), pat, n_stars, seg_off, seg_len,
        max_stars)
    has_trailing_nl = (slen > 0) & (subj[jnp.clip(slen - 1, 0, subj.shape[0] - 1)]
                                    == 10)
    ok_trim, cap_off_t, cap_len_t = _match_at_cut(
        subj, jnp.asarray(slen - 1, jnp.int32), pat, n_stars, seg_off, seg_len,
        max_stars)
    use_trim = ~ok_full & has_trailing_nl & ok_trim

    ok = ok_full | use_trim
    cap_off = jnp.where(use_trim, cap_off_t, cap_off_f)
    cap_len = jnp.where(use_trim, cap_len_t, cap_len_f)
    return MatchResult(ok=ok, supported=supported,
                       n_caps=jnp.minimum(n_stars, max_stars).astype(jnp.int32),
                       cap_off=cap_off, cap_len=cap_len)
