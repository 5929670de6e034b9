import pytest

from interpolation_engine_tpu.core.interp import (
    InterpolationException,
    get_simple_insertkey,
    interpolate_inserts,
    recursive_escape,
    recursive_interpolate,
    recursive_unescape,
)


def test_simple_insertkey_detection():
    assert get_simple_insertkey("{name}") == "name"
    assert get_simple_insertkey("{a}{b}") is None
    assert get_simple_insertkey("x{a}") is None
    assert get_simple_insertkey("{a}x") is None
    assert not get_simple_insertkey("{}")  # empty key is falsy
    assert not get_simple_insertkey("")
    assert get_simple_insertkey(3) is None
    assert get_simple_insertkey("{{name}/description}") == "{name}/description"
    assert get_simple_insertkey("{name}/{description}") is None


def test_plain_interpolation():
    inserts = {"name": "tom"}
    assert interpolate_inserts(inserts, "My name is {name}.") == "My name is tom."


def test_simple_key_preserves_type():
    inserts = {"n": 7, "l": ["a", "b"], "d": {"k": "v"}}
    assert interpolate_inserts(inserts, "{n}") == 7
    assert interpolate_inserts(inserts, "{l}") == ["a", "b"]
    assert interpolate_inserts(inserts, "{d}") == {"k": "v"}


def test_string_context_stringifies():
    inserts = {"n": 7, "l": ["a", "b"]}
    assert interpolate_inserts(inserts, "n={n}!") == "n=7!"
    # lists render via Python str() (reference: interpolation_engine.py:531)
    assert interpolate_inserts(inserts, "l={l}!") == "l=['a', 'b']!"


def test_nested_interpolation():
    inserts = {"i": 3, "question-3": "Why?"}
    assert interpolate_inserts(inserts, "{question-{i}}") == "Why?"


def test_key_of_key_indirection():
    inserts = {"name": "tom", "tom": "TOM!"}
    assert interpolate_inserts(inserts, "{{name}}") == "TOM!"


def test_key_of_key_with_suffix():
    inserts = {"name": "tom", "tom/description": "a cat"}
    assert interpolate_inserts(inserts, "{{name}/description}") == "a cat"


def test_escaped_braces_survive():
    inserts = {"a": "A"}
    assert interpolate_inserts(inserts, r"\{a\}") == r"\{a\}"
    assert interpolate_inserts(inserts, r"{a} \{a\}") == "A \\{a\\}"


def test_escapes_in_substituted_values_not_expanded():
    inserts = {"a": r"\{hidden\}", "hidden": "NO"}
    assert interpolate_inserts(inserts, "x{a}y") == r"x\{hidden\}y"


def test_missing_key_raises():
    with pytest.raises(InterpolationException):
        interpolate_inserts({}, "{missing}")
    with pytest.raises(InterpolationException):
        interpolate_inserts({}, "hello {missing}")


def test_special_time_keys():
    import re
    assert re.fullmatch(r"\d\d:\d\d", interpolate_inserts({}, "{HH:MM}"))
    assert re.fullmatch(r"\d\d:\d\d:\d\d", interpolate_inserts({}, "{HH:MM:SS}"))


def test_arg_keys():
    assert interpolate_inserts({"ARG1": "x"}, "{ARG1}") == "x"
    with pytest.raises(InterpolationException):
        interpolate_inserts({}, "{ARG2}")


def test_inserts_dir_fallback(tmp_path):
    from interpolation_engine_tpu.core.context import CTX
    (tmp_path / "greeting").write_text("hello {world}\n")
    (tmp_path / "data.json5").write_text("{a: '{x}', b: [1]}")
    CTX.inserts_dir = str(tmp_path)
    # raw file: stripped + escaped
    assert interpolate_inserts({}, "{greeting}") == r"hello \{world\}"
    # json5 file: parsed + recursively escaped
    assert interpolate_inserts({}, "{data}") == {"a": r"\{x\}", "b": [1]}


def test_recursive_escape_unescape():
    value = {"k{": ["a}", 1, {"b": "{c}"}]}
    escaped = recursive_escape(value)
    assert escaped == {"k\\{": ["a\\}", 1, {"b": "\\{c\\}"}]}
    assert recursive_unescape(escaped) == value


def test_recursive_interpolate_carveouts():
    inserts = {"x": "X"}
    goto_map_task = {"cmd": "goto_map", "text": "{x}", "target_maps": []}
    assert recursive_interpolate(inserts, goto_map_task) is goto_map_task

    serial = {"cmd": "serial", "tasks": [{"cmd": "print", "text": "{undefined}"}]}
    out = recursive_interpolate(inserts, serial)
    # subtask contents must NOT be interpolated yet
    assert out["tasks"][0]["text"] == "{undefined}"


def test_recursive_interpolate_task_list_placeholders():
    inserts = {"body": [{"cmd": "print", "text": "hi"}]}
    serial = {"cmd": "serial", "tasks": "{body}"}
    out = recursive_interpolate(inserts, serial)
    assert out["tasks"] == [{"cmd": "print", "text": "hi"}]

    serial2 = {"cmd": "serial", "tasks": ["{body}"]}
    # element-level placeholder resolves to the stored value
    out2 = recursive_interpolate(inserts, serial2)
    assert out2["tasks"][0] == [{"cmd": "print", "text": "hi"}]
