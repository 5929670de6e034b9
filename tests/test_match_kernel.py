"""Device wildcard kernel vs. the host oracle (differential)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interpolation_engine_tpu.core.wildcard import (
    get_wildcard_matches,
    is_wildcard_match,
)
from interpolation_engine_tpu.ops import match_kernel as mk

N = 128
MAX_STARS = 4


def buf(s: str):
    data = s.encode("utf-8")
    b = np.zeros(N, np.uint8)
    b[:len(data)] = list(data)
    return jnp.asarray(b), jnp.int32(len(data))


@jax.jit
def run(pat, plen, subj, slen):
    return mk.wildcard_match(pat, plen, subj, slen, MAX_STARS)


def check(pattern: str, subject: str):
    p, pl = buf(pattern)
    s, sl = buf(subject)
    res = run(p, pl, s, sl)
    if not bool(res.supported):
        return None
    want = is_wildcard_match(pattern, subject)
    assert bool(res.ok) == want, (pattern, subject)
    if want and int(res.n_caps) > 0:
        want_caps = get_wildcard_matches(pattern, subject)
        got = []
        sub = np.asarray(s)
        for i in range(int(res.n_caps)):
            off, ln = int(res.cap_off[i]), int(res.cap_len[i])
            got.append(bytes(sub[off:off + ln]).decode("utf-8", "replace"))
        assert got == want_caps, (pattern, subject, got, want_caps)
    return bool(res.ok)


CASES = [
    ("*", "anything"),
    ("*", ""),
    ("abc", "abc"),
    ("abc", "abd"),
    ("abc", "abc\n"),          # trailing-newline quirk
    ("abc", "abc\n\n"),
    ("a*c", "abc"),
    ("a*c", "ac"),
    ("a*c", "abbbc"),
    ("a*c", "abd"),
    ("a*", "abc"),
    ("*c", "abc"),
    ("a*b*c", "aXbYc"),
    ("a*b*c", "abbc"),          # greedy: first * takes 'b', second ''
    ("*<a>*</a>*", "x<a>y</a>z"),
    ("*<a>*</a>*", "<a></a>"),
    ("*  *", "a  b"),
    ("*  *", "a b"),
    ("*\n", "line\n"),
    ("\n*", "\nrest"),
    (" *", " x"),
    ("* ", "x "),
    ("**", "ab"),               # consecutive stars: first greedy
    ("a**b", "aXYb"),
    ("", ""),
    ("", "x"),
    ("*|*", "false|(none)"),
    ("true|1", "false|1"),
    ("(*)", "(query)"),
    ("(*)", "no parens"),
    ("*.*", "a.b"),
    ("*.*", "ab"),
]


@pytest.mark.parametrize("pattern,subject", CASES)
def test_curated(pattern, subject):
    if check(pattern, subject) is None:
        pytest.skip("unsupported pattern (host fallback)")


def test_fuzz_matches_host():
    rng = random.Random(77)
    n_checked = 0
    for _ in range(600):
        pattern = "".join(rng.choices("ab*c|.( ", k=rng.randint(0, 10)))
        subject = "".join(rng.choices("abc|.( \n", k=rng.randint(0, 14)))
        if check(pattern, subject) is not None:
            n_checked += 1
    assert n_checked > 500


def test_capture_greediness_matches_regex():
    # first group maximal: 'a(.*)b(.*)' on 'aXbYbZ' → ('XbY','Z')
    assert check("a*b*", "aXbYbZ")
    assert check("*b*", "abab")
    assert check("*a*a*", "aaaa")
