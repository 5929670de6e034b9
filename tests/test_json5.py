import math

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.json5 import Json5Error


def test_basic_values():
    assert json5.loads("1") == 1
    assert json5.loads("-2.5") == -2.5
    assert json5.loads("true") is True
    assert json5.loads("false") is False
    assert json5.loads("null") is None
    assert json5.loads('"hi"') == "hi"
    assert json5.loads("'hi'") == "hi"


def test_numbers_json5():
    assert json5.loads("0x1F") == 31
    assert json5.loads(".5") == 0.5
    assert json5.loads("5.") == 5.0
    assert json5.loads("+3") == 3
    assert json5.loads("1e3") == 1000.0
    assert json5.loads("Infinity") == math.inf
    assert json5.loads("-Infinity") == -math.inf
    assert math.isnan(json5.loads("NaN"))


def test_comments_and_trailing_commas():
    doc = """
    { // line comment
      a: 1, /* block
      comment */ b: [1, 2, 3,],
      'c': "x", // trailing
    }
    """
    assert json5.loads(doc) == {"a": 1, "b": [1, 2, 3], "c": "x"}


def test_unquoted_keys():
    assert json5.loads("{default_state: {order_index: 1}}") == {
        "default_state": {"order_index": 1}}
    assert json5.loads("{$a_1: 2}") == {"$a_1": 2}


def test_string_escapes():
    assert json5.loads(r'"a\nb\tc\\d\"e"') == 'a\nb\tc\\d"e'
    assert json5.loads(r'"é"') == "é"
    assert json5.loads(r'"\x41"') == "A"
    assert json5.loads('"a\\\nb"') == "ab"  # line continuation
    assert json5.loads(r"'it\'s'") == "it's"
    assert json5.loads(r'"\q"') == "q"  # any-other-char escape
    assert json5.loads(r'"😀"') == "😀"  # surrogate pair


def test_errors_have_positions():
    with pytest.raises(Json5Error) as ei:
        json5.loads("{a: 1,\n b: }")
    assert ei.value.line == 2


def test_reject_trailing_garbage():
    with pytest.raises(Json5Error):
        json5.loads("1 2")


def test_parse_all_reference_examples():
    from glob import glob
    from interpolation_engine_tpu.programs.loader import add_line_numbers
    for path in glob("/root/reference/examples/*.json5"):
        with open(path) as f:
            text = f.read()
        program = json5.loads(add_line_numbers(text))
        assert "order" in program
        for task in program["order"]:
            assert "cmd" in task and "line" in task


def test_dumps_roundtrip():
    value = {"a": [1, 2.5, "x\n", True, None], "b": {"c": {}}}
    assert json5.loads(json5.dumps(value)) == value
    assert json5.loads(json5.dumps(value, indent=4)) == value


def test_dumps_format():
    assert json5.dumps({"a": 1, "b": "x"}) == '{"a": 1, "b": "x"}'
    assert json5.dumps({}) == "{}"
    assert json5.dumps([]) == "[]"
    assert json5.dumps("é", ensure_ascii=True) == '"\\u00e9"'
    assert json5.dumps({"b": 1, "a": 2}, sort_keys=True) == '{"a": 2, "b": 1}'
    pretty = json5.dumps({"a": {"b": [1]}}, indent=4)
    assert pretty == '{\n    "a": {\n        "b": [\n            1\n        ]\n    }\n}'
