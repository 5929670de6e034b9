"""Differential tests: our core vs. the reference implementation.

Randomized and curated inputs are fed to both implementations; outputs
(including raised-vs-not) must agree exactly. This is the strongest evidence
of semantic parity for the interpolation ISA, math evaluator, stream filters
and validator.
"""

import random
import string

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.core import interp as my_interp
from interpolation_engine_tpu.core import math_eval as my_math
from interpolation_engine_tpu.core.filters import InvertedFilter, OutputFilter
from interpolation_engine_tpu.core.wildcard import (
    get_wildcard_matches,
    is_wildcard_match,
)
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import (
    ProgramValidationError,
    validate_program,
)

from ref_oracle import get_reference


def both_interpolate(inserts, content):
    ref = get_reference().engine

    def run(fn):
        try:
            return ("ok", fn())
        except Exception as e:
            return ("raise", type(e).__name__ == "InterpolationException")

    mine = run(lambda: my_interp.interpolate_inserts(dict(inserts), content))
    theirs = run(lambda: ref.interpolate_inserts(dict(inserts), content))
    return mine, theirs


CURATED_CASES = [
    ({}, "plain text"),
    ({"a": "A"}, "{a}"),
    ({"a": "A"}, "x{a}y"),
    ({"a": 7}, "{a}"),
    ({"a": 7}, "={a}="),
    ({"a": ["x", "y"]}, "{a}"),
    ({"a": ["x", "y"]}, "L={a}"),
    ({"a": {"k": "v"}}, "{a}"),
    ({"i": 2, "q2": "Q"}, "{q{i}}"),
    ({"i": 2, "q-2": "Q"}, "{q-{i}}"),
    ({"name": "t", "t": "V"}, "{{name}}"),
    ({"name": "t", "t/d": "V"}, "{{name}/d}"),
    ({"a": "A"}, r"\{a\}"),
    ({"a": "A"}, r"{a}\{a\}{a}"),
    ({"a": r"\{b\}", "b": "NO"}, "{a}"),
    ({"a": r"\{b\}", "b": "NO"}, "x{a}"),
    ({}, "{missing}"),
    ({}, "pre {missing} post"),
    ({"a": "A"}, "{}"),
    ({"a": "A"}, ""),
    ({"outer{inner}": "V", "inner": "X"}, "{outer\\{inner\\}}"),
    ({"a": "A", "b": "B"}, "{a}{b}"),
    ({"ab": "AB", "b": "b"}, "{a{b}}"),
    ({"ARG1": "x"}, "{ARG1}"),
    ({}, "{ARG1}"),
    ({"x": "{y}", "y": "deep"}, "{x}"),        # stored value contains braces
    ({"x": "{y}", "y": "deep"}, "a{x}b"),
]


@pytest.mark.parametrize("inserts,content", CURATED_CASES)
def test_interpolation_matches_reference(inserts, content):
    mine, theirs = both_interpolate(inserts, content)
    assert mine == theirs, f"inserts={inserts} content={content!r}"


def test_interpolation_fuzz_matches_reference():
    rng = random.Random(1234)
    alphabet = "ab{}\\xy "
    keys = ["a", "b", "ab", "x"]
    for _ in range(3000):
        inserts = {}
        for k in keys:
            r = rng.random()
            if r < 0.5:
                inserts[k] = "".join(rng.choices("AB{}\\c", k=rng.randint(0, 4)))
            elif r < 0.7:
                inserts[k] = rng.randint(-5, 99)
            elif r < 0.8:
                inserts[k] = ["p", "q"]
        content = "".join(rng.choices(alphabet, k=rng.randint(0, 14)))
        mine, theirs = both_interpolate(inserts, content)
        # AssertionError cases (unbalanced braces) count as generic raises on
        # both sides; normalize.
        assert mine == theirs, f"inserts={inserts} content={content!r}"


def both_math(inserts, expr):
    ref = get_reference().engine

    def run(fn):
        try:
            return ("ok", fn())
        except Exception:
            return ("raise",)

    mine = run(lambda: my_math.eval_math(dict(inserts), expr))
    theirs = run(lambda: ref.eval_math(dict(inserts), expr))
    return mine, theirs


MATH_CASES = [
    ({}, "1+2"),
    ({}, "7 % 3"),
    ({}, "-7 % 3"),
    ({}, "2 * (3 + 4)"),
    ({}, "10 / 2"),
    ({}, "1/3"),
    ({}, "max(1,2,3)"),
    ({}, "min( 5 , 2 )"),
    ({}, "round(7/2)"),
    ({}, "round(5/2)"),
    ({}, "sign(3-5)"),
    ({}, "sign(0)"),
    ({}, "max(1,2) * min(3,4)"),
    ({"l": ["a", "b", "c"]}, "length(l)"),
    ({"l": ["a", "b", "c"], "n": 4}, "length(l) - 2 * {n}"),
    ({"l": [3, 1, 2]}, "max(l)"),
    ({"l": [3, 1, 2]}, "min(l) + 1"),
    ({}, "2 - -3"),
    ({}, "2*-3"),
    ({}, "bogus(1)"),
    ({}, "1 + x"),
    ({}, "(1+2) "),
    ({"n": 5}, "sign({n})"),
    ({}, "100 - 3 - 4 - 5"),
    ({}, "2 * 3 % 4"),
    ({}, "6 / 4 * 2"),
]


@pytest.mark.parametrize("inserts,expr", MATH_CASES)
def test_math_matches_reference(inserts, expr):
    mine, theirs = both_math(inserts, expr)
    assert mine == theirs, f"expr={expr!r}"


def test_math_fuzz_matches_reference():
    rng = random.Random(99)
    for _ in range(1500):
        n_tok = rng.randint(1, 7)
        parts = []
        for _ in range(n_tok):
            parts.append(str(rng.randint(0, 30)))
            parts.append(rng.choice(["+", "-", "*", "/", "%", "-", "+"]))
        expr = " ".join(parts[:-1])
        if rng.random() < 0.4:
            expr = f"({expr}) + 1 "
        mine, theirs = both_math({}, expr)
        assert mine == theirs, f"expr={expr!r}"


def test_filters_match_reference():
    ref_filter = get_reference().filter
    rng = random.Random(7)
    samples = [
        "<output>hello</output>",
        "x<output>a</output>y<output>b</output>z",
        "<output>unterminated...",
        "no delimiters at all",
        "<out<output>tricky</output>",
        "<output></output>",
        "</output>stray close",
        "a<think>hide me</think>b<think>and me</think>c",
        "partial <outp",
    ]
    for sample in samples:
        for width in (1, 2, 3, 5, 50):
            for enum in (False, True):
                mine = OutputFilter("<output>", "</output>", enum)
                ref_update, ref_outputs = ref_filter.filter(
                    "<output>", "</output>", enumerate_outputs=enum)
                got_mine = got_ref = ""
                for i in range(0, len(sample), width):
                    chunk = sample[i:i + width]
                    got_mine += mine(chunk)
                    got_ref += ref_update(chunk)
                assert got_mine == got_ref, (sample, width, enum)
                assert mine.outputs == ref_outputs, (sample, width, enum)

            inv_mine = InvertedFilter("<think>", "</think>")
            inv_ref = ref_filter.inverted_filter("<think>", "</think>")
            got_mine = got_ref = ""
            for i in range(0, len(sample), width):
                chunk = sample[i:i + width]
                got_mine += inv_mine(chunk)
                got_ref += inv_ref(chunk)
            assert got_mine == got_ref, (sample, width)

    # fuzz with random delimiter-dense strings
    for _ in range(300):
        sample = "".join(rng.choices("<output></abc", k=rng.randint(0, 40)))
        width = rng.randint(1, 6)
        mine = OutputFilter("<o>", "</o>")
        ref_update, ref_outputs = ref_filter.filter("<o>", "</o>")
        got_mine = got_ref = ""
        for i in range(0, len(sample), width):
            chunk = sample[i:i + width]
            got_mine += mine(chunk)
            got_ref += ref_update(chunk)
        assert got_mine == got_ref
        assert mine.outputs == ref_outputs


def test_wildcards_match_reference():
    ref = get_reference().engine
    rng = random.Random(5)
    for _ in range(2000):
        pattern = "".join(rng.choices("ab*|.()[\\n ", k=rng.randint(0, 8)))
        s = "".join(rng.choices("ab*|.()[\\n \n", k=rng.randint(0, 10)))
        assert is_wildcard_match(pattern, s) == ref.is_wildcard_match(pattern, s)
        assert get_wildcard_matches(pattern, s) == ref.get_wildcard_matches(pattern, s)


def test_validator_matches_reference_on_random_programs():
    """Generate small random programs; both validators must agree."""
    ref = get_reference().engine
    rng = random.Random(42)

    def rand_key():
        return "".join(rng.choices(string.ascii_lowercase, k=3))

    def rand_text():
        parts = []
        for _ in range(rng.randint(0, 3)):
            if rng.random() < 0.5:
                parts.append(rng.choice(["hi ", "x", "\\n"]))
            else:
                parts.append("{" + rand_key() + "}")
        return "".join(parts)

    n_agree = 0
    for _ in range(400):
        tasks = []
        labels = []
        for _ in range(rng.randint(1, 5)):
            kind = rng.choice(
                ["print", "set", "label", "goto", "math", "delete"])
            if kind == "print":
                tasks.append({"cmd": "print", "text": rand_text()})
            elif kind == "set":
                tasks.append({"cmd": "set", "item": rand_text(),
                              "output_name": rand_key()})
            elif kind == "label":
                name = "@" + rand_key()
                tasks.append({"cmd": "label", "name": name})
                labels.append(name)
            elif kind == "goto":
                target = ("@" + rand_key()) if rng.random() < 0.4 else (
                    labels[-1] if labels else "CONTINUE")
                tasks.append({"cmd": "goto", "name": target})
            elif kind == "math":
                tasks.append({"cmd": "math", "input": "1+2",
                              "output_name": rand_key()})
            elif kind == "delete":
                tasks.append({"cmd": "delete", "wildcards": [rand_key() + "*"]})
        inserts = {rand_key(): "v" for _ in range(rng.randint(0, 3))}

        src = json5.dumps({
            "default_state": {"order_index": 1, "inserts": inserts},
            "order": tasks,
            "named_tasks": {},
            "save_states": {},
        }, indent=2)
        numbered = add_line_numbers(src)
        mine_prog = json5.loads(numbered)
        ref_prog = json5.loads(numbered)

        try:
            validate_program(mine_prog)
            mine = "accept"
        except Exception:
            mine = "reject"
        try:
            ref.validate_program(ref_prog)
            theirs = "accept"
        except Exception:
            theirs = "reject"
        assert mine == theirs, f"program: {src}"
        n_agree += 1
    assert n_agree == 400
