import pytest

from interpolation_engine_tpu.core.filters import InvertedFilter, OutputFilter
from interpolation_engine_tpu.core.math_eval import eval_math, safe_eval
from interpolation_engine_tpu.core.wildcard import (
    get_wildcard_matches,
    is_wildcard_match,
)


# ---- safe_eval ---------------------------------------------------------------

def test_safe_eval_matches_python_semantics():
    cases = ["1+2", "2*3+4", "2+3*4", "10/4", "7%3", "-7%3", "2**3**2",
             "-2**2", "2**-1", "2*-3", "3--2", " 1 + 2 ", "1.5*2", "10%4%3",
             "100/10/5", "5-3-1"]
    for expr in cases:
        assert safe_eval(expr) == eval(expr.replace("**", "**")), expr


def test_safe_eval_rejects_illegal_chars():
    with pytest.raises(AssertionError):
        safe_eval("2^3")  # '^' is outside the charset (preserved quirk)
    with pytest.raises(AssertionError):
        safe_eval("a+1")


# ---- eval_math ----------------------------------------------------------------

def test_eval_math_basic():
    assert eval_math({}, "1+2") == 3
    assert eval_math({}, "max(1,2,3)") == 3
    assert eval_math({}, "min(4, 2, 9)") == 2
    assert eval_math({}, "round(7/2)") == 4  # banker's: 3.5 → 4
    assert eval_math({}, "round(5/2)") == 2  # banker's: 2.5 → 2
    assert eval_math({}, "sign(3-5)") == -1
    assert eval_math({}, "sign(0)") == 0


def test_eval_math_length_and_interpolation():
    inserts = {"history_list": ["a", "b", "c"], "min_history_turns": 4}
    assert eval_math(inserts, "length(history_list)") == 3
    assert eval_math(inserts, "length(history_list) - 2 * {min_history_turns}") == -5
    assert eval_math(inserts, "length(history_list) % 2") == 1


def test_eval_math_nested_parens():
    assert eval_math({}, "2 * (3 + (4 - 1))") == 12


def test_eval_math_requires_integer_result():
    with pytest.raises(AssertionError):
        eval_math({}, "1/3")
    assert eval_math({}, "4/2") == 2


def test_eval_math_simple_key_input():
    # extension over the reference (which crashes): simple-key math inputs
    assert eval_math({"n": 5}, "{n}") == 5


# ---- wildcards -----------------------------------------------------------------

def test_wildcard_match():
    assert is_wildcard_match("*", "anything\nwith newlines")
    assert is_wildcard_match("a*c", "abc")
    assert is_wildcard_match("a*c", "ac")
    assert not is_wildcard_match("a*c", "abd")
    assert is_wildcard_match("exact", "exact")
    assert not is_wildcard_match("exact", "exactx")
    # regex metacharacters in the pattern are literal
    assert is_wildcard_match("a.c", "a.c")
    assert not is_wildcard_match("a.c", "abc")


def test_wildcard_trailing_newline_quirk():
    # Python's '$' matches before a trailing newline — preserved behavior.
    assert is_wildcard_match("abc", "abc\n")


def test_wildcard_captures():
    assert get_wildcard_matches("*<a>*</a>*", "x<a>y</a>z") == ["x", "y", "z"]
    assert get_wildcard_matches("a*", "abc") == ["bc"]
    assert get_wildcard_matches("exact", "exact") == ["exact"]
    assert get_wildcard_matches("a*", "zzz") == []


# ---- filters --------------------------------------------------------------------

def _stream(filt, text, width=3):
    return "".join(filt(text[i:i + width]) for i in range(0, len(text), width))


def test_output_filter_extracts():
    f = OutputFilter("<output>", "</output>")
    shown = _stream(f, "junk<output>hello world</output>junk")
    assert shown == "hello world"
    assert f.outputs == ["hello world"]


def test_output_filter_enumerates():
    f = OutputFilter("<output>", "</output>", enumerate_outputs=True)
    shown = _stream(f, "<output>1</output>\n\n\t<output>and 2</output>")
    assert f.outputs == ["1", "and 2"]
    assert shown == "1. 1\n\n2. and 2"


def test_output_filter_passthrough():
    f = OutputFilter("", "")
    shown = _stream(f, "raw text here")
    assert shown == "raw text here"
    assert f.outputs == ["raw text here"]


def test_output_filter_delimiter_split_across_chunks():
    f = OutputFilter("<out>", "</out>")
    shown = "".join(f(c) for c in ["<o", "ut", ">a", "b<", "/o", "ut", ">"])
    assert shown == "ab"
    assert f.outputs == ["ab"]


def test_inverted_filter_hides():
    f = InvertedFilter("<think>", "</think>")
    shown = _stream(f, "a<think>secret</think>b")
    assert shown == "ab"


def test_inverted_filter_empty_is_passthrough():
    f = InvertedFilter("", "")
    assert _stream(f, "all shown") == "all shown"
