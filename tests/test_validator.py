"""Static validator behavior (accept/reject parity with the reference)."""

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.programs.loader import add_line_numbers
from interpolation_engine_tpu.programs.validator import (
    ProgramValidationError,
    validate_program,
)


def make_program(order_src: str, inserts="{}", named_tasks="{}"):
    text = f"""
    {{
        default_state: {{order_index: 1, inserts: {inserts}}},
        order: {order_src},
        named_tasks: {named_tasks},
        save_states: {{}},
    }}
    """
    return json5.loads(add_line_numbers(text))


def test_accepts_all_reference_examples():
    from glob import glob
    for path in glob("/root/reference/examples/*.json5"):
        with open(path) as f:
            program = json5.loads(add_line_numbers(f.read()))
        if "named_tasks" not in program and isinstance(program.get("tasks"), dict):
            program["named_tasks"] = program.pop("tasks")
        validate_program(program)


def test_rejects_never_defined_key():
    program = make_program("[{cmd:'print', text:'{ghost}'}]")
    with pytest.raises(ProgramValidationError, match="never be defined"):
        validate_program(program)


def test_accepts_key_defined_by_later_output_name():
    program = make_program(
        "[{cmd:'print', text:'{x}'}, {cmd:'set', item:'1', output_name:'x'}]")
    validate_program(program)


def test_own_output_name_does_not_justify_simple_self_use():
    # a simple-key self-use is rejected (differentially verified against the
    # reference validator)
    program = make_program(
        "[{cmd:'set', item:'{log}', output_name:'log'}]")
    with pytest.raises(ProgramValidationError, match="never be defined"):
        validate_program(program)


def test_non_simple_self_use_is_accepted():
    # '{log}x' is not a *simple* insert key, so the reference's liveness
    # analysis lets the task's own output_name justify it (verified
    # differentially against the reference validator).
    program = make_program(
        "[{cmd:'set', item:'{log}x', output_name:'log'}]")
    validate_program(program)


def test_interpolated_output_names_widen_to_wildcards():
    # NOTE: keys must stick to identifier characters — the reference's
    # liveness check double-escapes regex metacharacters, so 'q-{i}' vs
    # '{q-2}' is REJECTED by the reference (verified differentially); with
    # 'q_' both accept.
    program = make_program(
        "[{cmd:'set', item:'1', output_name:'q_{i}'},"
        " {cmd:'print', text:'{q_2}'},"
        " {cmd:'set', item:'2', output_name:'i'}]")
    validate_program(program)


def test_dash_keys_rejected_by_liveness_quirk():
    program = make_program(
        "[{cmd:'set', item:'1', output_name:'q-{i}'},"
        " {cmd:'print', text:'{q-2}'},"
        " {cmd:'set', item:'2', output_name:'i'}]")
    with pytest.raises(ProgramValidationError, match="never be defined"):
        validate_program(program)


def test_rejects_unknown_command():
    program = make_program("[{cmd:'frobnicate', x: 1}]")
    with pytest.raises(ProgramValidationError, match="unexpected task"):
        validate_program(program)


def test_rejects_missing_required_field():
    program = make_program("[{cmd:'print'}]")
    with pytest.raises(ProgramValidationError):
        validate_program(program)


def test_rejects_duplicate_labels():
    program = make_program(
        "[{cmd:'label', name:'@x'}, {cmd:'label', name:'@x'}]")
    with pytest.raises(ProgramValidationError, match="not unique"):
        validate_program(program)


def test_rejects_goto_to_unknown_label():
    program = make_program("[{cmd:'goto', name:'@nowhere'}]")
    with pytest.raises(ProgramValidationError, match="not defined"):
        validate_program(program)


def test_goto_continue_is_reserved():
    program = make_program("[{cmd:'goto', name:'CONTINUE'}]")
    validate_program(program)


def test_rejects_unbalanced_braces():
    program = make_program("[{cmd:'print', text:'oops {x'}]")
    with pytest.raises(ProgramValidationError):
        validate_program(program)


def test_rejects_goto_map_without_possible_match():
    program = make_program(
        "[{cmd:'goto_map', text:'nomatch', target_maps:[{'a':'CONTINUE'}]}]")
    with pytest.raises(ProgramValidationError, match="goto_map will fail"):
        validate_program(program)


def test_rejects_chat_with_illegal_args():
    program = make_program(
        "[{cmd:'chat', messages:[], output_name:'o', model:'m', bogus:1}]")
    with pytest.raises(ProgramValidationError, match="illegal arguments"):
        validate_program(program)


def test_chat_requires_model_without_completion_args():
    program = make_program("[{cmd:'chat', messages:[], output_name:'o'}]")
    with pytest.raises(ProgramValidationError, match="missing required"):
        validate_program(program)


def test_rejects_delete_of_never_defined():
    program = make_program("[{cmd:'delete', wildcards:['ghost*']}]")
    with pytest.raises(ProgramValidationError, match="never be defined"):
        validate_program(program)


def test_numbered_keys_allowed_in_replace_map():
    program = make_program(
        "[{cmd:'replace_map', item:'x', output_name:'o', "
        "wildcard_maps:[{'*':'{1}'}]}]")
    validate_program(program)


def test_arg_keys_always_possible():
    program = make_program("[{cmd:'print', text:'{ARG1}'}]")
    validate_program(program)


def test_arg0_rejected():
    program = make_program("[{cmd:'print', text:'{ARG0}'}]")
    with pytest.raises(ProgramValidationError, match="greater than 0"):
        validate_program(program)


def test_warns_on_goto_directly_in_parallel():
    program = make_program(
        "[{cmd:'label', name:'@a'},"
        " {cmd:'parallel_wait', tasks:[{cmd:'goto', name:'@a'}]}]")
    warnings = validate_program(program)
    assert any("parallel" in w.message for w in warnings)


def test_goto_in_serial_in_parallel_is_clean():
    program = make_program(
        "[{cmd:'parallel_wait', tasks:[{cmd:'serial', tasks:["
        "{cmd:'goto', name:'@a'}, {cmd:'label', name:'@a'}]}]}]")
    warnings = validate_program(program)
    assert warnings == []


def test_traceback_labels_attached():
    program = make_program(
        "[{cmd:'serial', tasks:[{cmd:'print', text:'x'}]}]")
    validate_program(program)
    serial = program["order"][0]
    assert serial["traceback_label"].startswith("serial-")
    sub = serial["tasks"][0]
    assert "/" in sub["traceback_label"]


def test_str_item_containing_cmd_rejected():
    # preserved quirk: the reference probes `'cmd' in item` on any truthy
    # item, so a *string* containing the substring 'cmd' enters the dict
    # branch and TypeErrors reading item['cmd'] — the program never loads
    # (verified against the executed reference).
    program = make_program("[{cmd:'set', item:'run the cmd', output_name:'x'}]")
    with pytest.raises(ProgramValidationError):
        validate_program(program)


def test_list_item_containing_cmd_element_rejected():
    program = make_program("[{cmd:'set', item:['a', 'cmd'], output_name:'x'}]")
    with pytest.raises(ProgramValidationError):
        validate_program(program)


def test_benign_str_and_list_items_accepted():
    validate_program(
        make_program("[{cmd:'set', item:'command post', output_name:'x'}]"))
    validate_program(
        make_program("[{cmd:'set', item:['a', 'commando'], output_name:'x'}]"))
