"""Device-path save/load: reference-format state export, splice, resume."""

import asyncio

import pytest

from interpolation_engine_tpu import json5
from interpolation_engine_tpu.compiler import compile_program
from interpolation_engine_tpu.io.manager import IOManager, ScriptedBackend
from interpolation_engine_tpu.programs.loader import invalidate_cache, load
from interpolation_engine_tpu.vm.config import DONE, PARKED
from interpolation_engine_tpu.vm.driver import DeviceRunner, _scatter, _stack

from test_device_vm import CFG, compile_src

SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'set', item:'v1', output_name:'a'},
        {cmd:'print', text:'[{a}]'},
        {cmd:'user_input', prompt:'pause ', output_name:'b'},
        {cmd:'print', text:'[{b}]'},
    ],
    named_tasks: {},
    save_states: {
    },
}
"""


def test_export_and_resume_roundtrip(tmp_path, capsys):
    compiled = compile_src(SRC)
    io = IOManager(ScriptedBackend([]))  # no responses: parks at user_input
    runner = DeviceRunner(compiled, CFG, io_factory=lambda i: io)
    batch = runner.make_instances(1)
    # step until parked at the user_input
    batch = runner._jitted(batch, 16)
    assert int(batch.status[0]) == PARKED

    state = runner.export_state(batch, 0)
    assert state["order_index"] == 3  # parked at the user_input task
    assert state["inserts"] == {"a": "v1"}
    assert state["output"] == "[v1]"

    # splice into the program file and reload through the standard loader
    prog_path = tmp_path / "prog.json5"
    prog_path.write_text(SRC)
    runner.compiled.program["save_states"] = {}
    runner.save_to_program(batch, 0, "1", "midway", str(prog_path))
    invalidate_cache()
    program2, _ = load(str(prog_path))
    loaded = program2["save_states"]["1"]
    assert loaded["label"] == "midway"
    assert loaded["order_index"] == 3
    assert loaded["inserts"] == {"a": "v1"}

    # resume on a fresh runner with an answer available
    compiled2 = compile_program(program2)
    io2 = IOManager(ScriptedBackend(["answer"]))
    runner2 = DeviceRunner(compiled2, CFG, io_factory=lambda i: io2)
    inst = runner2.load_state({k: v for k, v in loaded.items()
                               if k != "label"})
    final = runner2.run(_stack([inst]), inner_steps=16)
    r = runner2.results(final)[0]
    assert r.status == DONE
    assert r.output == "[v1][answer]"
    capsys.readouterr()


def test_load_state_rejects_nested_cursors():
    compiled = compile_src(SRC)
    runner = DeviceRunner(compiled, CFG)
    with pytest.raises(ValueError, match="nested block cursors"):
        runner.load_state({"order_index": 1, "inserts": {},
                           "order_index/serial-1/print-2": 2})


def test_load_state_from_reference_example_save(capsys):
    """interactivity.json5 ships a save slot; load it on the device engine."""
    invalidate_cache()
    program, _ = load("/root/reference/examples/interactivity.json5")
    compiled = compile_program(program)
    io = IOManager(ScriptedBackend(["Noon"]))
    runner = DeviceRunner(compiled, CFG, io_factory=lambda i: io)
    save = dict(program["save_states"]["2"])
    save.pop("label")
    inst = runner.load_state(save)
    final = runner.run(_stack([inst]), inner_steps=16)
    r = runner.results(final)[0]
    assert r.status == DONE
    # saved state had name=tom at order_index 2 (the user_choice task)
    assert r.output == "Well, tom, I hope you have a great day."
    capsys.readouterr()
