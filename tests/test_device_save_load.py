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


def test_load_state_rejects_unresolvable_cursors():
    """Cursors that don't belong to any resumable block (e.g. sub-state
    beneath a parallel, which only the host can carry) are rejected."""
    compiled = compile_src(SRC)
    runner = DeviceRunner(compiled, CFG)
    with pytest.raises(ValueError, match="host-op task"):
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


NESTED_SRC = """
{
    default_state: {order_index: 1, inserts: {}},
    order: [
        {cmd:'print', text:'start;'},
        {cmd:'for', name_list_map: {item: ['a', 'b', 'c']}, tasks: [
            {cmd:'print', text:'<{item}'},
            {cmd:'serial', tasks: [
                {cmd:'user_input', prompt:'? ', output_name:'ans'},
                {cmd:'print', text:'={ans}'},
            ]},
            {cmd:'print', text:'>'},
        ]},
        {cmd:'print', text:';end'},
    ],
    named_tasks: {}, save_states: {},
}
"""


def _host_resume(tmp_path, state, responses):
    """Resume a reference-format state on the HOST engine via a pre-seeded
    save slot + menu Load (the reference's own resume path)."""
    import sys
    sys.path.insert(0, str(tmp_path)) if False else None
    from test_menu import MenuScriptedBackend  # noqa: E402
    from interpolation_engine_tpu.core.runtime import ProgramRun
    from interpolation_engine_tpu import json5 as json5_mod

    program = json5.loads(
        __import__("interpolation_engine_tpu.programs.loader",
                   fromlist=["add_line_numbers"]).add_line_numbers(
                       NESTED_SRC))
    path = tmp_path / "resume_host.json5"
    text = NESTED_SRC.replace(
        "save_states: {}",
        "save_states: {'1': " + json5_mod.dumps(
            {**state, "label": "mid"}) + "}")
    path.write_text(text)
    holder: dict = {}
    backend = MenuScriptedBackend(
        ["2", "1"], menu_at_input=1, run_holder=holder)
    io = IOManager(backend)
    run = ProgramRun(str(path), [], io)
    holder["run"] = run

    async def drive():
        # after loading, the re-shown menu blocks on the empty script; feed
        # the program answers and close the menu so execution resumes from
        # the loaded state
        task = asyncio.create_task(run.run())
        while not backend.exchanges or len(backend.exchanges) < 2:
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.1)
        backend.responses.extend(responses)
        run.toggle_menu()
        return await task

    state_out = asyncio.run(drive())
    return state_out, backend


def test_mid_block_save_resumes_on_device(tmp_path, capsys):
    """Run on device until parked inside for>serial, export (with nested
    cursors), then resume the export on a fresh device runner."""
    compiled = compile_src(NESTED_SRC)
    runner = DeviceRunner(compiled, CFG,
                          io_factory=lambda i: IOManager(ScriptedBackend([])))
    batch = runner.make_instances(1)
    for _ in range(4):  # step without servicing the ring: park and stop
        batch = runner._jitted(batch, 8)
    assert int(batch.status[0]) == PARKED

    state = runner.export_state(batch, 0)
    # nested cursors reconstructed from (pc, counters)
    cursor_keys = {k: v for k, v in state.items()
                   if k.startswith("order_index/")}
    assert any(k.endswith("/counter") and v == 1
               for k, v in cursor_keys.items()), state
    assert state["output"] == "start;<a"

    resumed = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(
            ScriptedBackend(["one", "two", "three"])))
    inst = resumed.load_state(state)
    final = resumed.run(_stack([inst]), inner_steps=8, max_rounds=200)
    r = resumed.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == "start;<a=one><b=two><c=three>;end"


def test_mid_block_device_save_resumes_on_host(tmp_path, capsys):
    """Device export of a mid-for/serial park loads through the host menu
    and finishes with identical output — full cross-engine round trip."""
    compiled = compile_src(NESTED_SRC)
    runner = DeviceRunner(compiled, CFG,
                          io_factory=lambda i: IOManager(ScriptedBackend([])))
    batch = runner.make_instances(1)
    for _ in range(4):
        batch = runner._jitted(batch, 8)
    state = runner.export_state(batch, 0)

    state_out, backend = _host_resume(
        tmp_path, state, ["one", "two", "three"])
    capsys.readouterr()
    assert state_out["output"] == "start;<a=one><b=two><c=three>;end"


def test_host_mid_block_save_resumes_on_device(tmp_path, capsys):
    """The reference direction: a host-engine save taken inside the
    for>serial block (menu Save at the second iteration's user_input)
    resumes on the device engine, differential-equal."""
    from test_menu import MenuScriptedBackend
    from interpolation_engine_tpu.core.runtime import ProgramRun

    path = tmp_path / "mid_host.json5"
    path.write_text(NESTED_SRC)
    holder: dict = {}
    backend = MenuScriptedBackend(
        ["one",          # first iteration's answer
         "1", "1", "mid",  # menu: Save State -> slot 1 -> label
         "4"],           # menu: Quit
        menu_at_input=2, run_holder=holder)
    io = IOManager(backend)
    run = ProgramRun(str(path), [], io)
    holder["run"] = run
    asyncio.run(run.run())
    invalidate_cache()
    program2, _ = load(str(path))
    saved = dict(program2["save_states"]["1"])
    saved.pop("label")
    assert any(k.startswith("order_index/") for k in saved), saved
    capsys.readouterr()

    compiled = compile_program(program2)
    runner = DeviceRunner(
        compiled, CFG,
        io_factory=lambda i: IOManager(ScriptedBackend(["two", "three"])))
    inst = runner.load_state(saved)
    final = runner.run(_stack([inst]), inner_steps=8, max_rounds=200)
    r = runner.results(final)[0]
    capsys.readouterr()
    assert r.status == DONE
    assert r.output == "start;<a=one><b=two><c=three>;end"
