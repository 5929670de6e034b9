"""Auxiliary subsystems: event logger, analyzer, .prog parser, audio-web."""

import asyncio
import io as io_mod
import json

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.core.events import EventLogger, TASK_START
from interpolation_engine_tpu.programs.analyzer import analyze_program
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import validate_program
from interpolation_engine_tpu.tools.prog_parser import (
    ProgSyntaxError,
    load_prog_program,
    parse_prog,
    prog_to_tasks,
)


# ---- events ------------------------------------------------------------------

def test_event_logger_pretty_and_json():
    sink = io_mod.StringIO()
    jsink = io_mod.StringIO()
    logger = EventLogger(sink=sink, json_sink=jsink)
    logger.emit(TASK_START, label="print-3", line=3, text="hello")
    logger.emit("goto", label="goto-5", target="@loop")
    pretty = sink.getvalue()
    assert "task_start" in pretty and "print-3" in pretty and "(line 3)" in pretty
    records = [json.loads(l) for l in jsink.getvalue().splitlines()]
    assert records[0]["kind"] == "task_start"
    assert records[1]["label"] == "goto-5"
    assert logger.counters["task_start"] == 1


def test_event_logger_previews_long_values():
    sink = io_mod.StringIO()
    logger = EventLogger(sink=sink)
    logger.emit(TASK_START, label="x", text="y" * 500)
    line = sink.getvalue()
    assert "[...]" in line and len(line) < 200


# ---- analyzer ------------------------------------------------------------------

def make_program(order_src, inserts="{}"):
    text = f"""
    {{
        default_state: {{order_index: 1, inserts: {inserts}}},
        order: {order_src},
        named_tasks: {{}},
        save_states: {{}},
    }}
    """
    program = json5.loads(add_line_numbers(text))
    validate_program(program)
    return program


def test_analyzer_static_list_bounds():
    program = make_program(
        "[{cmd:'list_index', list:['a','b'], index:5, output_name:'x'}]")
    diags = analyze_program(program)
    assert any("out of bounds" in d.message for d in diags)


def test_analyzer_bounds_via_default_insert():
    program = make_program(
        "[{cmd:'list_index', list:'{l}', index:-7, output_name:'x'}]",
        inserts="{l: ['a','b','c']}")
    diags = analyze_program(program)
    assert any("out of bounds" in d.message for d in diags)


def test_analyzer_for_length_mismatch():
    program = make_program(
        "[{cmd:'for', name_list_map:{a: ['1','2'], b: ['x']}, tasks:["
        "{cmd:'print', text:'{a}{b}'}]}]")
    diags = analyze_program(program)
    assert any("differing lengths" in d.message for d in diags)


def test_analyzer_type_resolution():
    program = make_program(
        "[{cmd:'list_join', list:'{n}', before:'', between:'', after:'', "
        "output_name:'x'}]",
        inserts="{n: 5}")
    diags = analyze_program(program)
    assert any("must be an array" in d.message for d in diags)


def test_analyzer_clean_program_has_no_diags():
    program = make_program(
        "[{cmd:'list_index', list:['a','b'], index:2, output_name:'x'},"
        " {cmd:'print', text:'{x}'}]")
    assert analyze_program(program) == []


def make_program_unvalidated(order_src, inserts="{}"):
    """For analyzer checks on programs the hard validator already rejects
    (the Rust reference's analyzer sees them; our loader would not) —
    the analyzer must still diagnose them standalone."""
    text = f"""
    {{
        default_state: {{order_index: 1, inserts: {inserts}}},
        order: {order_src},
        named_tasks: {{}},
        save_states: {{}},
    }}
    """
    return json5.loads(add_line_numbers(text))


def test_analyzer_goto_unknown_label():
    program = make_program_unvalidated(
        "[{cmd:'goto', name:'@nowhere'}, {cmd:'label', name:'@here'}]")
    diags = analyze_program(program)
    assert any("goto target '@nowhere' not found" in d.message
               for d in diags)


def test_analyzer_labels_are_per_scope():
    # the label lives inside the serial; the outer goto can't see it
    program = make_program(
        "[{cmd:'serial', tasks:[{cmd:'label', name:'@in'}]},"
        " {cmd:'goto', name:'@in'}]")
    diags = analyze_program(program)
    assert any("goto target '@in' not found in order" in d.message
               for d in diags)


def test_analyzer_goto_map_literal_resolution():
    program = make_program_unvalidated(
        "[{cmd:'goto_map', text:'x', target_maps:[{'a':'@a'}]},"
        " {cmd:'label', name:'@a'}]")
    diags = analyze_program(program)
    assert any("no matches for literal text 'x'" in d.message for d in diags)
    # matching key but missing target label
    program2 = make_program_unvalidated(
        "[{cmd:'goto_map', text:'a', target_maps:[{'a':'@gone'}]}]")
    diags2 = analyze_program(program2)
    assert any("goto_map target '@gone' not found" in d.message
               for d in diags2)


def test_analyzer_field_type_checks():
    program = make_program_unvalidated(
        "[{cmd:'sleep', seconds:[1]},"
        " {cmd:'list_index', list:['a'], index:'{i}', output_name:'x'}]",
        inserts="{i: ['not','an','int']}")
    diags = analyze_program(program)
    assert any("'seconds' must be a number or string" in d.message
               for d in diags)
    assert any("'index' must be an int or string" in d.message
               for d in diags)


def test_analyzer_missing_fields_and_unknown_cmd():
    program = make_program_unvalidated("[{cmd:'print'}, {cmd:'frobnicate'}]")
    diags = analyze_program(program)
    assert any("Missing required field 'text'" in d.message for d in diags)
    assert any("Unknown cmd 'frobnicate'" in d.message for d in diags)


def test_analyzer_unbalanced_interpolation():
    program = make_program_unvalidated(
        "[{cmd:'print', text:'open {brace'},"
        " {cmd:'print', text:'empty {} key'}]")
    diags = analyze_program(program)
    assert any("uneven braces" in d.message for d in diags)
    assert any("empty interpolation key" in d.message for d in diags)


def test_analyzer_run_task_unknown():
    program = make_program_unvalidated("[{cmd:'run_task', task_name:'ghost'}]")
    diags = analyze_program(program)
    assert any("unknown task 'ghost'" in d.message for d in diags)


def test_analyzer_duplicate_label():
    program = make_program_unvalidated(
        "[{cmd:'label', name:'@x'}, {cmd:'label', name:'@x'}]")
    diags = analyze_program(program)
    assert any("not unique" in d.message for d in diags)


def test_analyzer_accepts_reference_examples():
    from interpolation_engine_tpu.programs.loader import load, invalidate_cache
    for name in ("hello_world", "math", "interactivity", "text_adventure"):
        invalidate_cache()
        program, _ = load(f"/root/reference/examples/{name}.json5")
        analyze_program(program)  # must not raise


# ---- .prog parser -----------------------------------------------------------------

def test_prog_tokenizer():
    entries = parse_prog("print 'hi {name}'\n# comment\nlabel @top\n")
    assert len(entries) == 2
    (l1, t1), (l2, t2) = entries
    assert l1 == 1 and t1[0].value == "print" and t1[1].value == "hi {name}"
    assert l2 == 3 and t2[1].value == "@top"


def test_prog_to_tasks_and_run(tmp_path, capsys):
    prog_text = (
        "set 'world' target\n"
        "print 'Hello, {target}!'\n"
    )
    path = tmp_path / "hello.prog"
    path.write_text(prog_text)

    from interpolation_engine_tpu.core.runtime import async_main
    from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
    state = asyncio.run(async_main(str(path), [], IOManager(ScriptedBackend())))
    assert state["output"] == "Hello, world!"
    assert capsys.readouterr().out == "Hello, world!\n"


def test_prog_object_arguments():
    tasks = prog_to_tasks("math {input:'1+2', output_name:'r'}\n")
    assert tasks[0] == {"cmd": "math", "line": 1, "input": "1+2",
                       "output_name": "r"}


def test_prog_group_arguments():
    tasks = prog_to_tasks("delete ['a*' 'b*']\n")
    assert tasks[0]["wildcards"] == ["a*", "b*"]


def test_prog_errors():
    with pytest.raises(ProgSyntaxError):
        parse_prog("print 'unterminated\n")
    with pytest.raises(ProgSyntaxError):
        parse_prog("print [a\n")


# ---- audio web ---------------------------------------------------------------------

def test_audio_web_streams_wav():
    from interpolation_engine_tpu.io.audio_web import AudioWebServer

    async def go():
        server = AudioWebServer()
        await server.start()
        reader, writer = await asyncio.open_connection("127.0.0.1", server.port)
        writer.write(b"GET /audio HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        # read headers
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b""):
                break
        # first chunk: WAV header
        size_line = await reader.readline()
        size = int(size_line.strip(), 16)
        header = await reader.readexactly(size)
        await reader.readexactly(2)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"

        server.broadcast(b"\x01\x02" * 100)
        size_line = await reader.readline()
        size = int(size_line.strip(), 16)
        payload = await reader.readexactly(size)
        # either our audio or a keepalive silence chunk arrives first
        if payload[:2] == b"\x00\x00":
            await reader.readexactly(2)
            size_line = await reader.readline()
            size = int(size_line.strip(), 16)
            payload = await reader.readexactly(size)
        assert payload[:4] == b"\x01\x02\x01\x02"
        await server.wait_for_idle()
        writer.close()
        await server.stop()

    asyncio.run(go())
