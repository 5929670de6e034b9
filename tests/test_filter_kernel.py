"""Device filter kernel vs the host stream filters (the exact oracle).

The oracle is the host filters fed ONE BYTE AT A TIME: the reference state
machine computes next_str once per call, so a chunk that contains a toggle
plus trailing content scans that content against the PRE-toggle delimiter
(a preserved quirk — core/filters.py:52). At 1-byte granularity toggles
always land on their own call and the quirk vanishes; that fine-grained
limit is the semantics the whole-text kernel implements (real SSE deltas
are token-sized, so the limit is what streaming users observe)."""

import random

import pytest

from interpolation_engine_tpu.core.filters import InvertedFilter, OutputFilter
from interpolation_engine_tpu.ops.filter_kernel import filter_chat_host


def host_filter(raw: str, start: str, stop: str, hide_start: str,
                hide_stop: str, enumerate_outputs: bool, chunk: int):
    """chat/service.py's per-delta loop: visual = hide(extract(delta))."""
    extract = OutputFilter(start, stop, enumerate_outputs=enumerate_outputs)
    hide = InvertedFilter(hide_start, hide_stop)
    visual = ""
    # empty raw = zero content deltas = zero filter calls (the service's
    # per-delta loop never runs) — outputs stays []
    for i in range(0, len(raw), chunk):
        visual += hide(extract(raw[i:i + chunk]))
    return list(extract.outputs), visual


CASES = [
    # (raw, start, stop, hide_start, hide_stop, enumerate)
    ("<output>hello</output>", "<output>", "</output>", "", "", False),
    ("junk <output>a</output> mid <output>b</output> tail",
     "<output>", "</output>", "", "", False),
    ("<output>a</output><output>b</output><output>c</output>",
     "<output>", "</output>", "", "", True),
    ("no delimiters at all", "<o>", "</o>", "", "", False),
    ("<o>unterminated span", "<o>", "</o>", "", "", False),
    ("prefix <o>x</o>", "<o>", "</o>", "", "", False),
    ("", "<o>", "</o>", "", "", False),
    ("", "", "", "", "", False),          # empty passthrough → outputs []
    ("anything goes", "", "", "", "", False),                 # passthrough
    ("pass with <think>hidden</think> text", "", "", "<think>", "</think>",
     False),
    ("<o>keep <think>drop</think> keep</o>", "<o>", "</o>",
     "<think>", "</think>", False),
    ("<o>a</o>\n<o><think>x</think>b</o>", "<o>", "</o>",
     "<think>", "</think>", True),
    ("[[x]] [[y]]", "[[", "]]", "", "", True),
    ("||a||b||c||", "||", "||", "", "", False),               # start == stop
    ("<o></o>", "<o>", "</o>", "", "", False),                # empty span
    ("<think>lead</think><o>z</o>", "<o>", "</o>", "<think>", "</think>",
     False),
]


@pytest.mark.parametrize("raw,start,stop,hs,he,enum", CASES)
def test_curated_cases(raw, start, stop, hs, he, enum):
    want_outputs, want_visual = host_filter(raw, start, stop, hs, he,
                                            enum, chunk=1)
    got_outputs, got_visual = filter_chat_host(
        raw, start, stop, hs, he, enum)
    assert got_outputs == want_outputs, raw
    assert got_visual == want_visual, raw


def test_host_coarse_chunk_quirk_exists():
    """The reason chunk=1 is the oracle: a whole-string chunk makes the
    host scan post-toggle content against the pre-toggle delimiter and the
    stop delimiter leaks into the output (reference fidelity)."""
    outputs, _ = host_filter("<o>hi</o>", "<o>", "</o>", "", "", False,
                             chunk=9)
    assert outputs == ["hi</o>"]
    outputs1, _ = host_filter("<o>hi</o>", "<o>", "</o>", "", "", False,
                              chunk=1)
    assert outputs1 == ["hi"]


def test_span_overflow_falls_back_to_exact_oracle():
    """More than MAX_SPANS outputs: the fixed span table can't hold them,
    so filter_chat_host must return the EXACT host result (all spans), not
    a silently truncated table (ADVICE r2 medium)."""
    raw = "".join(f"<o>s{k}</o>," for k in range(20))
    want_outputs, want_visual = host_filter(
        raw, "<o>", "</o>", "", "", True, chunk=1)
    got_outputs, got_visual = filter_chat_host(
        raw, "<o>", "</o>", "", "", True)
    assert len(got_outputs) == 20
    assert got_outputs == want_outputs
    assert got_visual == want_visual


def test_fuzz_streams():
    rng = random.Random(991)
    delim_sets = [
        ("<o>", "</o>", "", ""),
        ("<o>", "</o>", "<h>", "</h>"),
        ("AB", "CD", "", ""),
        ("**", "**", "", ""),
        ("", "", "<h>", "</h>"),
    ]
    n = 0
    for _ in range(150):
        start, stop, hs, he = rng.choice(delim_sets)
        alphabet = "ab<o></h>AB CD*\n"
        raw = "".join(rng.choices(alphabet, k=rng.randint(0, 60)))
        # bias: inject whole delimiters so spans actually occur
        for _ in range(rng.randint(0, 4)):
            pos = rng.randint(0, len(raw))
            raw = raw[:pos] + rng.choice(
                [d for d in (start, stop, hs, he) if d] or [""]) + raw[pos:]
        enum = rng.random() < 0.4
        want_outputs, want_visual = host_filter(
            raw, start, stop, hs, he, enum, chunk=1)
        got_outputs, got_visual = filter_chat_host(
            raw, start, stop, hs, he, enum)
        assert got_outputs == want_outputs, (raw, start, stop, hs, he, enum)
        assert got_visual == want_visual, (raw, start, stop, hs, he, enum)
        n += 1
    assert n == 150
