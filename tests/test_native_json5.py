"""Native C++ JSON5 parser: build + differential tests vs the Python parser."""

import math
import random

import pytest

from interpolation_engine_tpu.json5 import py_loads
from interpolation_engine_tpu.native.build import load_json5c

json5c = load_json5c()

pytestmark = pytest.mark.skipif(json5c is None,
                                reason="native toolchain unavailable")


DOCS = [
    "1", "-2.5", "true", "false", "null", '"hi"', "'hi'",
    "0x1F", ".5", "5.", "+3", "1e3", "Infinity", "-Infinity",
    "{a: 1, b: [1, 2, 3,], 'c': \"x\",}",
    "{default_state: {order_index: 1}}",
    "{$a_1: 2}",
    r'"a\nb\tc\\d\"e"', r'"\x41"', '"a\\\nb"', r"'it\'s'", r'"\q"',
    r'"😀"',
    "[]", "{}", "[[[1]]]",
    "{ // comment\n a: 1, /* block */ b: 2 }",
    '"é"',
    "{key: 'va{l}ue', other: '\\\\{escaped\\\\}'}",
]

BAD_DOCS = [
    "", "{a: }", "[1,", "1 2", "{a 1}", "'unterminated", "0x", "{:1}",
    "/* unterminated", '"bad \n newline"',
]


@pytest.mark.parametrize("doc", DOCS)
def test_native_matches_python(doc):
    a = py_loads(doc)
    b = json5c.loads(doc)
    if isinstance(a, float) and math.isnan(a):
        assert isinstance(b, float) and math.isnan(b)
    else:
        assert a == b and type(a) is type(b)


@pytest.mark.parametrize("doc", BAD_DOCS)
def test_native_rejects_like_python(doc):
    with pytest.raises(ValueError):
        py_loads(doc)
    with pytest.raises(ValueError):
        json5c.loads(doc)


def test_native_parses_reference_examples():
    from glob import glob
    from interpolation_engine_tpu.programs.loader import add_line_numbers
    for path in glob("/root/reference/examples/*.json5"):
        with open(path) as f:
            text = add_line_numbers(f.read())
        assert json5c.loads(text) == py_loads(text)


def test_native_fuzz_matches_python():
    rng = random.Random(2026)
    alphabet = "{}[]'\",:ab1 .\\n//*tru"
    agree = 0
    for _ in range(3000):
        doc = "".join(rng.choices(alphabet, k=rng.randint(0, 24)))
        try:
            a = ("ok", py_loads(doc))
        except Exception:
            a = ("err",)
        try:
            b = ("ok", json5c.loads(doc))
        except Exception:
            b = ("err",)
        if a[0] == "ok" and b[0] == "ok":
            av, bv = a[1], b[1]
            if isinstance(av, float) and math.isnan(av):
                assert isinstance(bv, float) and math.isnan(bv)
            else:
                assert av == bv, doc
        else:
            assert a[0] == b[0], (doc, a, b)
        agree += 1
    assert agree == 3000


def test_error_positions_match():
    doc = "{a: 1,\n b: }"
    try:
        py_loads(doc)
    except ValueError as e:
        py_msg = str(e)
    try:
        json5c.loads(doc)
    except ValueError as e:
        c_msg = str(e)
    assert "line 2" in py_msg and "line 2" in c_msg
